package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CommitArbiter, HardLinkArbiter, LockFileArbiter, SnapIO, Snapshots}

/** A mock store with the S3A-class rename contract VIOLATION: renaming a
  * FILE onto an existing destination silently REPLACES it (object-store
  * "rename" is copy-then-delete). Directory renames stay sane (Spark's
  * parquet committer needs them) — the hazard under test is the
  * manifest-file race. Registered per test via `fs.mockrep.impl`.
  */
class MockReplaceRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockrep"
  override def getUri: java.net.URI = java.net.URI.create("mockrep:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    val s = pathToFile(src)
    val d = pathToFile(dst)
    if (s.isFile && (!d.exists() || d.isFile)) {
      java.nio.file.Files.move(s.toPath, d.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      true
    } else super.rename(src, dst)
  }
}

/** Concurrent-writer torture for the snapshot commit protocol. The
  * protocol's claims — losers of the manifest race rebase (appends) or
  * abort (replaces) via the arbiter's atomic create-if-absent — are
  * exactly the kind that review alone should not certify (the
  * ModelStore publish race was found by review, not test); this suite
  * drives real contention through them, against BOTH shipped arbiters
  * ([[graft.ops.HardLinkArbiter]] `link(2)`;
  * [[graft.ops.LockFileArbiter]] put-if-absent only — the object-store
  * contract):
  *
  *  - N appender threads commit concurrently: every commit must land,
  *    versions must come out linear (parent = v−1, no gaps, no
  *    duplicates), and no committed row may be lost;
  *  - a replacer thread rewrites the table mid-storm with the standard
  *    retry-on-conflict loop: every loss must surface as the documented
  *    conflict exception (never a silent drop), and the final state must
  *    hold every appended row — a pure rewrite that loses a concurrent
  *    append would be the lost-update anomaly the `basedOn` pin exists
  *    to prevent;
  *  - a row-level DELETE/UPDATE whose positions were computed from a
  *    version a REPLACE then superseded must conflict, never silently
  *    no-op (Iceberg's `validateDataFilesExist`);
  *  - a reader pinned to a RETAINED version survives vacuum; one pinned
  *    to a dropped version fails loudly — the retention contract.
  */
class SnapshotConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-snapshot-concurrency-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshTable(): String = Snapshots.init(
    java.nio.file.Files.createTempDirectory("graft_snapc").toString)

  private def ids(root: String): Seq[Long] =
    Snapshots.read(spark, root).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

  for ((arbName, arb) <- Seq("hard-link" -> HardLinkArbiter,
                             "lock-file" -> LockFileArbiter,
                             "hadoop-fs" -> graft.ops.HadoopFsArbiter)) {
    test(s"[$arbName] N concurrent appenders: every commit lands, the version chain is linear, no row is lost") {
      Snapshots.withArbiter(arb)(appenderStorm())
    }
    test(s"[$arbName] a replacer amid an append storm: losses surface as conflicts (never silent), the rebased retry loses no append") {
      Snapshots.withArbiter(arb)(replacerStorm())
    }
  }

  private def appenderStorm(): Unit = {
    val root = freshTable()
    val threads = 6
    val perThread = 4
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val committed = new ConcurrentLinkedQueue[(Long, Long)]() // (id, version)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until perThread).foreach { i =>
            val id = t * 1000L + i
            val v = Snapshots.commit(root,
              spark.range(id, id + 1).toDF().coalesce(1), s"append-$id")
            committed.add(id -> v): Unit
          } catch { case e: Throwable => failures.add(e): Unit }
        }
      }): Unit
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "appenders hung")
    assert(failures.isEmpty, s"no append may fail: ${failures.peek()}")
    import scala.jdk.CollectionConverters._
    val commits = committed.asScala.toSeq
    val n = threads * perThread
    assert(commits.size === n)
    // every commit won a UNIQUE version and the chain has no gaps
    assert(commits.map(_._2).sorted === (1L to n.toLong))
    assert(Snapshots.versions(root) === (1L to n.toLong))
    // the chain is LINEAR: every manifest's parent is version − 1
    (1L to n.toLong).foreach { v =>
      assert(Snapshots.snapshot(root, v).parent === v - 1,
        s"v$v must chain from v${v - 1}")
    }
    // no committed row was lost, and each version adds exactly its own
    assert(ids(root) === commits.map(_._1).sorted)
    assert(Snapshots.countRows(root) === Some(n.toLong))
    commits.foreach { case (id, v) =>
      val added = Snapshots.snapshot(root, v).files.filter(_.seq == v)
      assert(added.map(_.rows).sum === 1L, s"v$v must add exactly id $id")
    }
  }

  private def replacerStorm(): Unit = {
    val root = freshTable()
    Snapshots.commit(root, spark.range(10000, 10004).toDF(), "base"): Unit
    val threads = 4
    val perThread = 3
    val pool = Executors.newFixedThreadPool(threads + 1)
    val start = new CountDownLatch(1)
    val appended = new ConcurrentLinkedQueue[Long]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    var conflicts = 0
    var replaceVersion = 0L
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until perThread).foreach { i =>
            val id = t * 1000L + i
            Snapshots.commit(root,
              spark.range(id, id + 1).toDF().coalesce(1), s"append-$id"): Unit
            appended.add(id): Unit
          } catch { case e: Throwable => failures.add(e): Unit }
        }
      }): Unit
    }
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        // the standard lakehouse OPTIMIZE loop: read latest, rewrite,
        // commit pinned to what was read; on conflict, recompute
        var done = false
        while (!done) {
          val base = Snapshots.latestVersion(root).get
          val state = Snapshots.read(spark, root, Some(base))
          try {
            replaceVersion = Snapshots.commit(root, state.coalesce(1),
              s"rewrite-of-v$base", replace = true, basedOn = Some(base))
            done = true
          } catch {
            case _: java.util.ConcurrentModificationException =>
              conflicts += 1 // documented, loud — recompute and retry
          }
        }
      }
    }): Unit
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS), "writers hung")
    assert(failures.isEmpty, s"no writer may fail: ${failures.peek()}")
    assert(replaceVersion > 0L, "the retry loop must eventually win")
    import scala.jdk.CollectionConverters._
    // a PURE rewrite replace is content-preserving, and appends after it
    // rebase on top — so the final table holds the base and EVERY
    // appended row: any miss is the lost-update anomaly
    val expect = (Seq(10000L, 10001L, 10002L, 10003L) ++
      appended.asScala.toSeq).sorted
    assert(ids(root) === expect)
    // the chain stayed linear through the storm
    val vs = Snapshots.versions(root)
    assert(vs === (1L to vs.size.toLong))
    vs.foreach { v =>
      assert(Snapshots.snapshot(root, v).parent === v - 1)
    }
    // the replace landed exactly once and says so in history
    val notes = Snapshots.history(spark, root)
      .select("note").collect().map(_.getString(0))
    assert(notes.count(_.startsWith("rewrite-of-v")) === 1)
  }

  test("arbiterFor contract table: replace-on-rename and unknown schemes refuse loudly; only rename-atomic schemes reach the rename arbiter") {
    // known replace-on-rename object stores: silently defaulting these
    // to the rename arbiter would make the commit race last-writer-wins
    for (root <- Seq("s3a://bucket/table", "gs://bucket/table",
        "abfss://c@acct.dfs.core.windows.net/t", "wasb://c@acct/t")) {
      val e = intercept[IllegalStateException](Snapshots.arbiterFor(root))
      assert(e.getMessage.contains("registerArbiter"), root)
      assert(e.getMessage.contains("silently REPLACES"), root)
    }
    // an UNKNOWN scheme refuses too (its rename contract is unproven)
    val u = intercept[IllegalStateException](
      Snapshots.arbiterFor("weirdfs://host/t"))
    assert(u.getMessage.contains("allowlist"))
    // the allowlist routes: HDFS family + file:// → rename arbiter,
    // scheme-less local → link(2)
    assert(Snapshots.arbiterFor("hdfs://nn:8020/t") eq graft.ops.HadoopFsArbiter)
    assert(Snapshots.arbiterFor("file:///tmp/t") eq graft.ops.HadoopFsArbiter)
    assert(Snapshots.arbiterFor("/tmp/t") eq HardLinkArbiter)
    // a registration overrides the refusal — and unregistering restores it
    val marker = new CommitArbiter {
      override def putIfAbsent(t: String, c: Array[Byte]): Boolean = false
    }
    Snapshots.registerArbiter("s3a", marker)
    try assert(Snapshots.arbiterFor("s3a://bucket/table") eq marker)
    finally Snapshots.unregisterArbiter("s3a")
    intercept[IllegalStateException](
      Snapshots.arbiterFor("s3a://bucket/table")): Unit
  }

  test("a store whose rename silently replaces: the hazard is real, the default is a LOUD refusal (never a lost commit), and a registered conditional-PUT arbiter carries the full appender torture") {
    val impl = classOf[MockReplaceRenameFs].getName
    spark.sparkContext.hadoopConfiguration.set("fs.mockrep.impl", impl)
    SnapIO.conf.set("fs.mockrep.impl", impl)
    val dir = java.nio.file.Files.createTempDirectory("graft_mockrep")
    // 1. the hazard is REAL on this store: renaming onto an existing
    //    file returns true and replaces it — exactly what the
    //    rename-based arbiter's loser-loses-loudly guarantee cannot
    //    survive (both racers would "win" the same version)
    val hp = new org.apache.hadoop.fs.Path(s"mockrep://$dir/probe_dst")
    val fs = hp.getFileSystem(SnapIO.conf)
    java.nio.file.Files.write(dir.resolve("probe_dst"),
      "committed".getBytes("UTF-8")): Unit
    java.nio.file.Files.write(dir.resolve("probe_src"),
      "usurper".getBytes("UTF-8")): Unit
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"mockrep://$dir/probe_src"),
      hp), "the mock store's rename must 'succeed' onto an existing file")
    assert(new String(java.nio.file.Files.readAllBytes(
      dir.resolve("probe_dst")), "UTF-8") === "usurper",
      "…by silently replacing it — the S3A-class contract violation")
    // 2. the engine REFUSES the scheme instead of losing commits to it
    val root = s"mockrep://$dir/table"
    Snapshots.init(root): Unit
    val e = intercept[IllegalStateException] {
      Snapshots.commit(root, spark.range(0, 1).toDF().coalesce(1), "doomed")
    }
    assert(e.getMessage.contains("no safe commit arbiter"))
    assert(Snapshots.latestVersion(root).isEmpty, "the refusal must " +
      "leave no published version behind")
    // 3. registering the store's conditional-PUT arbiter (here: the mock
    //    store is local disk, so link(2) IS its conditional PUT) makes
    //    the same root safe — the N-appender torture holds its
    //    invariants end-to-end over the URI root
    val condPut = new CommitArbiter {
      override def putIfAbsent(target: String, content: Array[Byte]): Boolean =
        HardLinkArbiter.putIfAbsent(target.stripPrefix("mockrep://"), content)
    }
    Snapshots.registerArbiter("mockrep", condPut)
    try {
      val threads = 4
      val perThread = 3
      val pool = Executors.newFixedThreadPool(threads)
      val start = new CountDownLatch(1)
      val committed = new ConcurrentLinkedQueue[(Long, Long)]()
      val failures = new ConcurrentLinkedQueue[Throwable]()
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            try (0 until perThread).foreach { i =>
              val id = t * 1000L + i
              val v = Snapshots.commit(root,
                spark.range(id, id + 1).toDF().coalesce(1), s"append-$id")
              committed.add(id -> v): Unit
            } catch { case e: Throwable => failures.add(e): Unit }
          }
        }): Unit
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS), "appenders hung")
      assert(failures.isEmpty, s"no append may fail: ${failures.peek()}")
      import scala.jdk.CollectionConverters._
      val commits = committed.asScala.toSeq
      val n = threads * perThread
      assert(commits.size === n)
      assert(commits.map(_._2).sorted === (1L to n.toLong))
      (1L to n.toLong).foreach { v =>
        assert(Snapshots.snapshot(root, v).parent === v - 1)
      }
      assert(Snapshots.read(spark, root).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq === commits.map(_._1).sorted)
    } finally Snapshots.unregisterArbiter("mockrep")
  }

  test("a position-delete commit racing a REPLACE conflicts loudly — never a silent no-op DELETE or duplicated UPDATE") {
    import org.apache.spark.sql.functions.col
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 100).toDF().repartition(4),
      "base"): Unit
    // a DELETE WHERE derives its (file, pos) tombstones from v1…
    val positions = Snapshots.positionsWhere(spark, root,
      col("id") % 10 === 0, Some(1L))
    // …but an OPTIMIZE lands first, rewriting every file v1 listed
    Snapshots.commit(root, Snapshots.read(spark, root, Some(1L)).coalesce(1),
      "compact", replace = true, basedOn = Some(1L)): Unit
    // the tombstones reference files the new head no longer lists: a
    // rebase would make the DELETE silently no-op (and an UPDATE
    // additionally duplicate its matched rows) — it must conflict
    val e = intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitPositionDeletes(root, positions, "stale-delete",
        basedOn = Some(1L))
    }
    assert(e.getMessage.contains("no longer listed"))
    // the table is untouched by the refused commit
    assert(Snapshots.countRows(root) === Some(100L))
    // the standard recovery — recompute against the new latest — works
    Snapshots.deleteWhere(spark, root, col("id") % 10 === 0): Unit
    assert(Snapshots.readMerged(spark, root, "id").count() === 90L)
  }

  test("appends RACING a row-level delete: the tombstone commit rebases over appends (their files persist) and loses nothing") {
    import org.apache.spark.sql.functions.col
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 50).toDF().coalesce(1), "base"): Unit
    val positions = Snapshots.positionsWhere(spark, root,
      col("id") < 10, Some(1L))
    // appends land between derivation and publish — file-preserving, so
    // the tombstone commit must REBASE (not conflict) and apply exactly
    Snapshots.commit(root, spark.range(100, 110).toDF().coalesce(1),
      "mid-append"): Unit
    Snapshots.commitPositionDeletes(root, positions, "delete",
      basedOn = Some(1L)): Unit
    assert(Snapshots.readMerged(spark, root, "id").count() === 50L,
      "50 base + 10 appended − 10 deleted")
  }

  test("vacuum vs a pinned reader: a RETAINED version's scan completes; a dropped version fails loudly (the retention contract)") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 100).toDF().repartition(4),
      "base"): Unit                                              // v1
    Snapshots.commit(root, Snapshots.read(spark, root).coalesce(1),
      "compact", replace = true, basedOn = Some(1L)): Unit       // v2
    // reader pins v1 BEFORE any vacuum (plans against v1's file list)
    val pinned = Snapshots.read(spark, root, Some(1L))
    // retention covers v1 → the pinned scan completes mid-churn
    assert(Snapshots.vacuum(root, keepVersions = 2, minAgeMillis = 0) === 0)
    assert(pinned.count() === 100L)
    // retention drops v1 → its files (superseded by the replace) die,
    // and the pinned reader fails LOUDLY, never returns partial rows
    assert(Snapshots.vacuum(root, keepVersions = 1, minAgeMillis = 0) > 0)
    intercept[Exception] { pinned.count(): Unit }
    // a fresh read of the dropped version is refused at the manifest
    intercept[Exception] { Snapshots.read(spark, root, Some(1L)).count(): Unit }
    // the retained head is intact
    assert(Snapshots.read(spark, root).count() === 100L)
  }
}
