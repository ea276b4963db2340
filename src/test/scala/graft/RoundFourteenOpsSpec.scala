package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{HadoopFsArbiter, LockFileArbiter, SnapIO, Snapshots}

/** Round-14 additions: the Hadoop-FileSystem port of the snapshot
  * format (URI roots end-to-end, the stage+rename arbiter), the
  * injectable-clock lock arbiter (deterministic stale-lock breakout,
  * loud loss on the break race), the write-skew conflict for concurrent
  * row-level DML, O(delta) streaming micro-batch planning, string
  * bounds in manifest-embedded stats, the v2 TableCatalog's native time
  * travel, and the session-zone timestampAsOf fix.
  */
class RoundFourteenOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-round-fourteen-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshDir(prefix: String = "graft_r14"): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  // ---- Hadoop FileSystem roots ------------------------------------------

  test("a file:// URI root runs the whole table lifecycle through the FileSystem branch: commit, read, time travel, replace conflict, checkpoint, vacuum") {
    val ss = spark; import ss.implicits._
    val local = freshDir()
    val root = "file://" + local
    Snapshots.init(root)
    // metadata physically landed where the URI points
    assert(new java.io.File(local, "_graft_snaps").isDirectory)
    Snapshots.commit(root,
      (0L until 100L).map(k => (k, k * 2.0)).toDF("k", "x"), "base"): Unit
    Snapshots.commit(root,
      (100L until 120L).map(k => (k, k * 2.0)).toDF("k", "x"), "delta"): Unit
    assert(Snapshots.versions(root) === Seq(1L, 2L))
    assert(Snapshots.read(spark, root).count() === 120L)
    assert(Snapshots.read(spark, root, Some(1L)).count() === 100L)
    assert(Snapshots.countRows(root) === Some(120L))
    // the manifest files were published by the FS arbiter (no hard links
    // on this route) and are complete
    assert(Snapshots.commitNote(root, 2L) === "delta")
    // a stale replace conflicts exactly like the local route
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.commit(root, Snapshots.read(spark, root).coalesce(1),
        "stale", replace = true, basedOn = Some(1L))
    }
    // checkpoint + a post-checkpoint append chain correctly
    Snapshots.checkpoint(root): Unit
    Snapshots.commit(root,
      Seq((999L, 0.0)).toDF("k", "x"), "post-ckpt"): Unit
    assert(Snapshots.read(spark, root).count() === 121L)
    // row-level DML over the URI root
    Snapshots.deleteWhere(spark, root, col("k") < 10L): Unit
    assert(Snapshots.readMerged(spark, root, "k").count() === 111L)
    Snapshots.compactMerged(spark, root, "k"): Unit
    assert(Snapshots.read(spark, root).count() === 111L)
    // vacuum reclaims superseded history through the FS branch too
    assert(Snapshots.vacuum(root, keepVersions = 1, minAgeMillis = 0) > 0)
    assert(Snapshots.read(spark, root).count() === 111L)
    // the front door reads the URI root (FileIndex paths stay qualified)
    assert(spark.read.format("graft-snap").load(root).count() === 111L)
  }

  test("HadoopFsArbiter: N concurrent appenders on a URI root — linear chain, no lost commit (the stage+rename protocol)") {
    val ss = spark; import ss.implicits._
    val root = "file://" + freshDir()
    Snapshots.init(root)
    val threads = 4
    val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val start = new java.util.concurrent.CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until perThread).foreach { i =>
            val id = t * 1000L + i
            Snapshots.commit(root,
              Seq((id, id * 1.0)).toDF("k", "x").coalesce(1),
              s"append-$id"): Unit
          } catch { case e: Throwable => failures.add(e): Unit }
        }
      }): Unit
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"no append may fail: ${failures.peek()}")
    val n = threads * perThread
    assert(Snapshots.versions(root) === (1L to n.toLong))
    (1L to n.toLong).foreach { v =>
      assert(Snapshots.snapshot(root, v).parent === v - 1)
    }
    assert(Snapshots.read(spark, root).count() === n.toLong)
  }

  // ---- LockFileArbiter: injectable clock --------------------------------

  test("LockFileArbiter stale-lock breakout is deterministic under an injected clock, and a wrongly-broken holder's publish cannot be silently replaced") {
    val dir = java.nio.file.Paths.get(freshDir())
    val target = dir.resolve("v00000001.txt")
    val lock = dir.resolve(s".stage_${target.getFileName}.lock.tmp")

    // 1) a genuinely crashed holder: the lock is older than the horizon
    //    per the injected clock — the waiter breaks it and publishes
    java.nio.file.Files.createFile(lock)
    val future = System.currentTimeMillis() + 10_000L
    val breaker = new LockFileArbiter(staleLockMillis = 5000L,
      now = () => future)
    assert(breaker.putIfAbsent(target.toString, "mine".getBytes("UTF-8")))
    assert(new String(java.nio.file.Files.readAllBytes(target),
      "UTF-8") === "mine")
    assert(!java.nio.file.Files.exists(lock), "the breakout frees the lock")

    // 2) the break-vs-alive-holder race, driven deterministically: the
    //    clock callback doubles as the "holder finishes first" event —
    //    the wrongly-broken holder publishes BETWEEN the waiter's age
    //    check and its acquisition. The waiter must lose LOUDLY (false)
    //    and the holder's manifest must survive byte-for-byte; the old
    //    ATOMIC_MOVE publish silently replaced it (a lost commit).
    val target2 = dir.resolve("v00000002.txt")
    val lock2 = dir.resolve(s".stage_${target2.getFileName}.lock.tmp")
    java.nio.file.Files.createFile(lock2)
    val holderBytes = "the-alive-holders-manifest".getBytes("UTF-8")
    val racer = new LockFileArbiter(staleLockMillis = 5000L,
      now = () => {
        // the alive holder wins the real race right as the waiter
        // decides the lock is stale
        if (!java.nio.file.Files.exists(target2))
          java.nio.file.Files.write(target2, holderBytes): Unit
        System.currentTimeMillis() + 10_000L
      })
    assert(!racer.putIfAbsent(target2.toString, "waiter".getBytes("UTF-8")),
      "the broken-out waiter must lose loudly")
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(target2), holderBytes),
      "the alive holder's committed manifest must never be replaced")
  }

  // ---- write-skew: concurrent row-level DML -----------------------------

  test("a position-delete commit rebasing over a window that added tombstones conflicts loudly (two overlapping row-level DMLs are write-skew, not compose)") {
    val ss = spark; import ss.implicits._
    val root = Snapshots.init(freshDir())
    Snapshots.commit(root,
      (0L until 100L).map(k => (k, k * 1.0)).toDF("k", "x").coalesce(1),
      "base"): Unit
    // DML A derives positions from v1 and lands at v2
    Snapshots.deleteWhere(spark, root, col("k") % 10 === 0): Unit
    // DML B also derived from v1 (its scan ran before A published); its
    // positions overlap A's matched rows — composing both would
    // double-apply against a single shared tombstone set
    val positionsB = Snapshots.positionsWhere(spark, root,
      col("k") % 5 === 0, Some(1L))
    val e = intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitPositionDeletes(root, positionsB, "dml-b",
        basedOn = Some(1L))
    }
    assert(e.getMessage.contains("write-skew"), e.getMessage)
    // the standard recovery — recompute against the new latest — works
    Snapshots.deleteWhere(spark, root, col("k") % 5 === 0): Unit
    assert(Snapshots.readMerged(spark, root, "k").count() === 80L,
      "100 − (k%10==0: 10) − (k%5==0 not already dead: 10)")
  }

  // ---- O(delta) streaming planning --------------------------------------

  test("windowAppends plans a micro-batch from O(window) segment reads, never the table's O(files) entry text") {
    val ss = spark; import ss.implicits._
    val root = Snapshots.init(freshDir())
    (0 until 10).foreach { i =>
      Snapshots.commit(root,
        Seq((i.toLong, s"r$i")).toDF("k", "v").coalesce(1), s"c$i"): Unit
    }
    val before = Snapshots.segmentReads.get()
    val window = Snapshots.windowAppends(root, 8L, 10L)
    val readsUsed = Snapshots.segmentReads.get() - before
    assert(window.map(_.seq).sorted === Seq(9L, 10L))
    assert(readsUsed <= 2L,
      s"a 2-version window must parse at most its own 2 segments " +
        s"(read $readsUsed) — O(delta), not O(files)")
    // a checkpoint commit mid-window is entry-preserving: the fallback
    // recognizes it and the stream continues (no loud break)
    Snapshots.checkpoint(root): Unit                          // v11
    Snapshots.commit(root,
      Seq((99L, "z")).toDF("k", "v").coalesce(1), "post"): Unit // v12
    val across = Snapshots.windowAppends(root, 10L, 12L)
    assert(across.map(_.seq) === Seq(12L),
      "the checkpoint adds no files; the post-checkpoint append streams")
    // a replace with from > 0 still breaks loudly
    Snapshots.commit(root, Snapshots.read(spark, root).coalesce(1),
      "rewrite", replace = true): Unit                        // v13
    val e = intercept[Exception] { Snapshots.windowAppends(root, 12L, 13L) }
    assert(msgs(e).exists(_.contains("replace commit")), s"got: ${msgs(e)}")
  }

  // ---- string bounds in manifest stats -----------------------------------

  test("statsCols on a string column embeds UTF-8 bounds (base64url manifest field), round-trips hostile text, and prunes front-door string predicates — plan-asserted") {
    val ss = spark; import ss.implicits._
    val root = freshDir()
    // four commits = four files with disjoint string ranges
    Seq("alpha", "bravo", "chico", "delta").zipWithIndex.foreach {
      case (base, i) =>
        (0 until 50).map(j => (s"$base$j", i * 50L + j)).toDF("s", "k")
          .coalesce(1).write.format("graft-snap")
          .mode(org.apache.spark.sql.SaveMode.Append)
          .option("statsCols", "s,k").save(root)
    }
    val snap = Snapshots.snapshot(root, Snapshots.latestVersion(root).get)
    assert(snap.files.forall(_.strStats.contains("s")),
      "every entry carries string bounds for s")
    assert(snap.files.forall(_.stats.contains("k")),
      "numeric bounds ride the same statsCols list, typed by the footer")
    def rowsAndFiles(df: org.apache.spark.sql.DataFrame)
        : (Long, Long) = {
      val n = df.collect().length.toLong
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.get
      (n, scan.metrics("numFiles").value)
    }
    // equality prunes to the single covering file
    val (n1, f1) = rowsAndFiles(spark.read.format("graft-snap").load(root)
      .where(col("s") === "bravo7"))
    assert(n1 === 1L && f1 === 1L)
    // range prunes to the two covering files
    val (n2, f2) = rowsAndFiles(spark.read.format("graft-snap").load(root)
      .where(col("s") >= "bravo" && col("s") < "chid"))
    assert(n2 === 100L && f2 === 2L)
    // IN-list hull prunes
    val (n3, f3) = rowsAndFiles(spark.read.format("graft-snap").load(root)
      .where(col("s").isin("alpha1", "alpha2")))
    assert(n3 === 2L && f3 === 1L)
    // a miss prunes EVERYTHING without being wrong
    val (n4, _) = rowsAndFiles(spark.read.format("graft-snap").load(root)
      .where(col("s") === "zzz"))
    assert(n4 === 0L)
    // the Scala surface prunes strings from manifest text too
    // (readPrunedManifest → zoneMapManifest's z= bounds)
    val pruned = Snapshots.readPrunedManifest(spark, root,
      Seq(("s", "bravo", "bravo~")))
    assert(pruned.inputFiles.length === 1)
    assert(pruned.count() === 50L)

    // hostile text round-trips: structural characters (| ; : =), unicode
    // and spaces can never split a manifest entry line (base64url field)
    val root2 = freshDir()
    Seq("a|b;c:d=e f", "zürich中文").toDF("s")
      .coalesce(1).write.format("graft-snap").option("statsCols", "s")
      .save(root2)
    val e2 = Snapshots.snapshot(root2, 1L).files.head
    assert(e2.strStats("s") === ("a|b;c:d=e f", "zürich中文"))
    // non-ASCII bounds are conservatively UNPRUNABLE (UTF-16 vs UTF-8
    // merge-order caveat): a predicate that would exclude the file under
    // a naive compare still scans it — never a wrong skip
    assert(spark.read.format("graft-snap").load(root2)
      .where(col("s") > "a").count() === 2L)

    // all-empty-string values: min = max = "" encodes as EMPTY base64
    // fields (`col::`) — the parse must keep trailing empty fields or a
    // legal commit bricks every later read of the table
    val root3 = freshDir()
    Seq("", "").toDF("s").coalesce(1)
      .write.format("graft-snap").option("statsCols", "s").save(root3)
    val e3 = Snapshots.snapshot(root3, 1L).files.head
    assert(e3.strStats("s") === ("", ""))
    assert(spark.read.format("graft-snap").load(root3).count() === 2L)
  }

  test("the streaming sink's high-water recovery honors LEGACY poly-hash batch markers — upgrade-boundary exactly-once") {
    val ss = spark; import ss.implicits._
    val src = Snapshots.init(freshDir())
    Snapshots.commit(src, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "base"): Unit
    val dst = Snapshots.init(freshDir())
    // a pre-upgrade run of pipeline "pipe-r14" committed batch 7 under
    // the OLD 64-bit poly tag format
    val legacyTag = java.lang.Long.toHexString(
      "pipe-r14".foldLeft(1125899906842597L)((h, c) => 31 * h + c))
    Snapshots.commit(dst, Seq((0L, "marker")).toDF("k", "v"),
      s"stream-batch-$legacyTag-7"): Unit
    // the upgraded sink (SHA-256 tags) restarts the same pipeline; the
    // engine replays from batch 0 — every batchId ≤ the LEGACY
    // high-water must be recognized as already landed and skipped
    val ckpt = freshDir("graft_r14ck")
    val q = spark.readStream.format("graft-snap").load(src)
      .writeStream.format("graft-snap")
      .option("path", dst).option("txnAppId", "pipe-r14")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(Snapshots.read(spark, dst).count() === 1L,
      "batch 0 ≤ legacy high-water 7: skipped — only the marker row stays")
  }

  // ---- v2 TableCatalog ----------------------------------------------------

  test("GraftSnapCatalog: SHOW TABLES, native VERSION AS OF / TIMESTAMP AS OF, stats pruning through the v2 scan, INSERT INTO/OVERWRITE commits, metadata tables, DDL refused loudly") {
    val ss = spark; import ss.implicits._
    val base = freshDir()
    val root = SnapIO.join(base, "t1")
    (0L until 8L).foreach { i =>
      (i * 100L until (i + 1) * 100L).map(k => (k, k * 1.0)).toDF("k", "x")
        .coalesce(1).write.format("graft-snap")
        .mode(org.apache.spark.sql.SaveMode.Append)
        .option("statsCols", "k").save(root)
    }
    spark.conf.set("spark.sql.catalog.g14", "graft.sources.GraftSnapCatalog")
    spark.conf.set("spark.sql.catalog.g14.root", base)
    assert(spark.sql("SHOW TABLES IN g14").collect()
      .map(_.getString(1)).toSeq === Seq("t1"))
    assert(spark.sql("SELECT count(*) FROM g14.t1").head().getLong(0) === 800L)
    assert(spark.sql("SELECT count(*) FROM g14.t1 VERSION AS OF 3")
      .head().getLong(0) === 300L)
    // TIMESTAMP AS OF resolves through versionAsOf (epoch from v2's ts,
    // rendered in the session zone by Spark's own literal handling)
    val ts2 = Snapshots.snapshot(root, 2L).ts
    val lit2 = java.time.Instant.ofEpochMilli(ts2).atZone(
      java.time.ZoneId.of("UTC")).toLocalDateTime.toString.replace('T', ' ')
    assert(spark.sql(
      s"SELECT count(*) FROM g14.t1 TIMESTAMP AS OF '$lit2'")
      .head().getLong(0) === 200L)
    // manifest-stats pruning rides the v2 scan: the index keeps exactly
    // the files whose bounds intersect the predicate
    val idx = new graft.sources.GraftSnapPartitioningIndex(spark, root,
      Snapshots.snapshot(root, 8L))
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
    val kAttr = AttributeReference("k",
      org.apache.spark.sql.types.LongType)()
    val kept = idx.listFiles(Nil, Seq(EqualTo(kAttr, Literal(250L))))
      .head.files
    assert(kept.length === 1, "one covering file for k = 250")
    // and the SQL answer under the same predicate is right
    assert(spark.sql("SELECT count(*) FROM g14.t1 WHERE k BETWEEN 250 AND 320")
      .head().getLong(0) === 71L)
    // DDL refuses loudly (a table is born from its first commit)
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE g14.t2 (a INT) USING parquet")
    }
    assert(msgs(e).exists(m => m.contains("first commit") ||
      m.contains("does not support")), s"got: ${msgs(e)}")

    // INSERT INTO publishes an append commit through the protocol
    spark.sql("INSERT INTO g14.t1 VALUES (9000, 1.5), (9001, 2.5)")
    assert(Snapshots.latestVersion(root).get === 9L)
    assert(Snapshots.commitNote(root, 9L) === "sql-insert")
    assert(spark.sql("SELECT count(*) FROM g14.t1").head().getLong(0) === 802L)
    // INSERT OVERWRITE is a replace pinned to the current latest
    spark.sql("INSERT OVERWRITE g14.t1 SELECT k, x FROM g14.t1 WHERE k < 100")
    assert(spark.sql("SELECT count(*) FROM g14.t1").head().getLong(0) === 100L)
    assert(Snapshots.commitNote(root, 10L) === "sql-insert-overwrite")
    // history stayed intact: the pre-overwrite state still reads
    assert(spark.sql("SELECT count(*) FROM g14.t1 VERSION AS OF 9")
      .head().getLong(0) === 802L)
    // a time-travel-pinned table refuses writes — history is immutable
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO g14.t1 VERSION AS OF 3 VALUES (1, 1.0)")
    }
    assert(msgs(e2).nonEmpty) // parse- or analysis-level refusal is fine
    // metadata tables: $history and $files as queryable SQL relations
    val hist = spark.sql(
      "SELECT version, note FROM g14.`t1$history` ORDER BY version")
      .collect()
    assert(hist.length === Snapshots.versions(root).size)
    assert(hist.last.getString(1) === "sql-insert-overwrite")
    val headFiles = Snapshots.snapshot(root,
      Snapshots.latestVersion(root).get).files.size.toLong
    assert(spark.sql(
      "SELECT count(*) FROM g14.`t1$files` WHERE kind = 'data'")
      .head().getLong(0) === headFiles)
    assert(spark.sql(
      "SELECT sum(n_rows) FROM g14.`t1$files` WHERE kind = 'data'")
      .head().getLong(0) === 100L)
    // SQL-written commits INHERIT the head's stats column set: the
    // overwrite at v10 must still carry k bounds, or one INSERT
    // OVERWRITE would strip manifest pruning table-wide
    // (a zero-row part file has no row groups, so no bounds — that is
    // the "unprunable, never wrong" default, not a stats loss)
    assert(Snapshots.snapshot(root, 10L).files
      .filter(_.rows > 0).forall(_.stats.contains("k")))
    assert(Snapshots.snapshot(root, 9L).files
      .filter(f => f.seq == 9L && f.rows > 0)
      .forall(_.stats.contains("k")))
    // metadata tables compose with time travel
    assert(spark.sql(
      "SELECT count(*) FROM g14.`t1$history` VERSION AS OF 5")
      .head().getLong(0) === 5L)
    assert(spark.sql(
      "SELECT sum(n_rows) FROM g14.`t1$files` VERSION AS OF 3 " +
        "WHERE kind = 'data'").head().getLong(0) === 300L)
    // a REAL committed table whose name contains the suffix wins over
    // the metadata route — no listed table is ever shadowed
    val shadow = SnapIO.join(base, "t9$history")
    Seq((1L, 1.0)).toDF("k", "x").write.format("graft-snap").save(shadow)
    assert(spark.sql("SELECT count(*) FROM g14.`t9$history`")
      .head().getLong(0) === 1L)
    // an UNKNOWN $suffix is NOT a meta ident: all THREE loadTable
    // overloads must throw NoSuchTableException for `t1$foo` — the
    // timestamp overload used to strip the suffix and silently serve
    // the BASE table's data
    for (q <- Seq("SELECT count(*) FROM g14.`t1$foo`",
        "SELECT count(*) FROM g14.`t1$foo` VERSION AS OF 2",
        s"SELECT count(*) FROM g14.`t1$$foo` TIMESTAMP AS OF '$lit2'")) {
      val nf = intercept[Exception] { spark.sql(q).collect() }
      assert(msgs(nf).exists(m => m.contains("t1$foo") ||
        m.toLowerCase.contains("table or view not found") ||
        m.contains("TABLE_OR_VIEW_NOT_FOUND")), s"$q → ${msgs(nf)}")
    }
  }

  test("maintenance procedures: CALL graft.optimize/checkpoint/restore/vacuum run from pure SQL and report outcomes") {
    val ss = spark; import ss.implicits._
    val base = freshDir()
    val root = SnapIO.join(base, "m1")
    (0L until 6L).foreach { i =>
      (i * 100L until (i + 1) * 100L).map(k => (k, k * 1.0)).toDF("k", "x")
        .coalesce(1).write.format("graft-snap")
        .mode(org.apache.spark.sql.SaveMode.Append)
        .option("statsCols", "k").save(root)
    }
    spark.conf.set("spark.sql.catalog.g14p", "graft.sources.GraftSnapCatalog")
    spark.conf.set("spark.sql.catalog.g14p.root", base)
    // OPTIMIZE: 6 fragments → ~1 file, stats inherited, audited replace
    val opt = spark.sql(
      "CALL g14p.optimize(`table` => 'm1', order_by => 'k', target_mb => 64)")
      .head()
    assert(opt.getLong(0) === 7L)
    assert(opt.getLong(1) === 1L, "600 tiny rows collapse into one file")
    assert(Snapshots.snapshot(root, 7L).files
      .filter(_.rows > 0).forall(_.stats.contains("k")),
      "optimize inherits the head's stats columns")
    assert(spark.sql("SELECT count(*) FROM g14p.m1").head().getLong(0) === 600L)
    // CHECKPOINT: metadata-only commit, content preserved
    assert(spark.sql("CALL g14p.checkpoint('m1')").head().getLong(0) === 8L)
    assert(spark.sql("SELECT count(*) FROM g14p.m1").head().getLong(0) === 600L)
    // RESTORE: pin an old state as the new head without rewriting
    assert(spark.sql("CALL g14p.restore('m1', 3)").head().getLong(0) === 9L)
    assert(spark.sql("SELECT count(*) FROM g14p.m1").head().getLong(0) === 300L)
    // VACUUM: retire history (explicit zero age guard for the test)
    val deleted = spark.sql(
      "CALL g14p.vacuum(`table` => 'm1', keep_versions => 1, " +
        "min_age_sec => 0)").head().getLong(0)
    assert(deleted > 0L)
    assert(spark.sql("SELECT count(*) FROM g14p.m1").head().getLong(0) === 300L)
    // unknown procedure refuses loudly
    val e = intercept[Exception] { spark.sql("CALL g14p.frobnicate('m1')") }
    assert(msgs(e).exists(m => m.contains("unknown procedure") ||
      m.toLowerCase.contains("not found")), s"got: ${msgs(e)}")
  }

  // ---- session-zone timestampAsOf ----------------------------------------

  test("timestampAsOf local-datetime strings resolve in the SESSION time zone, not hardcoded UTC") {
    val ss = spark; import ss.implicits._
    val root = freshDir()
    Seq((1L, "a")).toDF("k", "v").write.format("graft-snap").save(root)
    Seq((2L, "b")).toDF("k", "v").write.format("graft-snap")
      .mode(org.apache.spark.sql.SaveMode.Append).save(root)
    val ts1 = Snapshots.snapshot(root, 1L).ts
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      // v1's commit instant rendered as a Tokyo wall-clock string must
      // resolve back to v1 — under the old hardcoded-UTC parse the same
      // string meant an instant 9 hours LATER (the v2 side of history)
      val tokyo = java.time.Instant.ofEpochMilli(ts1)
        .atZone(java.time.ZoneId.of("Asia/Tokyo")).toLocalDateTime
      val s = tokyo.toString.replace('T', ' ')
      assert(spark.read.format("graft-snap").option("timestampAsOf", s)
        .load(root).count() === 1L,
        "the Tokyo wall-clock of v1's commit must pin v1")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  // ---- CDC streaming front door ------------------------------------------

  test("the CDC stream resumes exactly-once across restarts and equals the batch change feed") {
    val ss = spark; import ss.implicits._
    val root = Snapshots.init(freshDir())
    Snapshots.commit(root,
      (0L until 40L).map(k => (k, k * 1.0)).toDF("k", "x"), "base"): Unit
    val work = freshDir("graft_r14cdc")
    def drain(): Unit = graft.streaming.StreamOps.drainToParquet(spark,
      spark.readStream.format("graft-snap")
        .option("readChangeFeed", "true").option("keyCol", "k")
        .load(root),
      s"$work/sink", s"$work/ckpt")
    drain() // consumes (0, 1]: the base inserts
    def sunk() = spark.read.parquet(s"$work/sink")
    assert(sunk().count() === 40L)
    assert(sunk().where(col("_change_type") === "insert").count() === 40L)
    // two row-level mutations land while the consumer is down; a NEW
    // query on the same checkpoint resumes (2, 3] only — exactly-once
    Snapshots.updateWhere(spark, root, col("k") % 10 === 0,
      Map("x" -> (col("x") + 100.0))): Unit
    Snapshots.deleteWhere(spark, root, col("k") % 20 === 0): Unit
    drain()
    val feed = sunk()
    // batch truth over the same full window
    val truth = Snapshots.changeFeed(spark, root, 0L, 3L, "k")
    assert(feed.count() === truth.count())
    assert(feed.groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      truth.groupBy(col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    drain() // nothing new
    assert(sunk().count() === truth.count())
  }

  test("batch change-feed front door: the relation equals changeFeed, prunes columns, counts via the empty projection, and write paths ignore CDC options") {
    val ss = spark; import ss.implicits._
    val root = Snapshots.init(freshDir())
    Snapshots.commit(root,
      (0L until 30L).map(k => (k, s"v$k")).toDF("k", "v"), "base"): Unit
    Snapshots.deleteWhere(spark, root, col("k") % 3 === 0): Unit
    val rel = spark.read.format("graft-snap")
      .option("readChangeFeed", "true").option("keyCol", "k").load(root)
    val truth = Snapshots.changeFeed(spark, root, 0L, 2L, "k")
    // count(*) drives the EMPTY projection through PrunedScan
    assert(rel.count() === truth.count())
    // a narrow select prunes to the requested columns and matches
    assert(rel.select(col("_change_type")).where(col("_change_type") === "delete")
      .count() === 10L)
    assert(rel.groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      truth.groupBy(col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    // CDC + point-in-time options refuse loudly
    val e = intercept[Exception] {
      spark.read.format("graft-snap").option("readChangeFeed", "true")
        .option("keyCol", "k").option("versionAsOf", "1").load(root)
    }
    assert(msgs(e).exists(_.contains("VERSION WINDOW")), s"got: ${msgs(e)}")
    // a WRITE carrying stray CDC options still commits and returns the
    // table relation (the options are read-shaping, not write-shaping)
    val root2 = freshDir()
    Seq((1L, "a")).toDF("k", "v").write.format("graft-snap")
      .option("readChangeFeed", "true").save(root2)
    assert(Snapshots.read(spark, root2).count() === 1L)
  }
}
