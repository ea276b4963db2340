package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Snapshots

/** Concurrent-writer torture for the snapshot commit protocol. The
  * protocol's claims — losers of the manifest race rebase (appends) or
  * abort (replaces) via the atomic hard-link's EEXIST — are exactly the
  * kind that review alone should not certify (the ModelStore publish
  * race was found by review, not test); this suite drives real
  * contention through them:
  *
  *  - N appender threads commit concurrently: every commit must land,
  *    versions must come out linear (parent = v−1, no gaps, no
  *    duplicates), and no committed row may be lost;
  *  - a replacer thread rewrites the table mid-storm with the standard
  *    retry-on-conflict loop: every loss must surface as the documented
  *    conflict exception (never a silent drop), and the final state must
  *    hold every appended row — a pure rewrite that loses a concurrent
  *    append would be the lost-update anomaly the `basedOn` pin exists
  *    to prevent.
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

  test("N concurrent appenders: every commit lands, the version chain is linear, no row is lost") {
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

  test("a replacer amid an append storm: losses surface as conflicts (never silent), the rebased retry loses no append") {
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
}
