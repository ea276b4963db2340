package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Snapshots

/** The `graft-snap` SQL/DataFrame front door
  * ([[graft.sources.SnapshotDataSource]]): reads plan against a pinned
  * manifest, writes publish commits, time travel rides options, and the
  * scan's pushed filters prune files from MANIFEST-EMBEDDED stats with
  * zero footer I/O — all asserted on the physical plan, not just row
  * values.
  */
class SnapshotSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-snap-sql-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_snapsql").toString

  test("df.write.format(graft-snap) publishes commits; read/versionAsOf/timestampAsOf/SQL view all resolve") {
    val ss = spark; import ss.implicits._
    val root = freshDir()
    // ErrorIfExists (the writer default) commits v1 on an empty table
    (0L until 100L).map(k => (k, k * 2.0)).toDF("k", "x")
      .write.format("graft-snap").option("note", "base").save(root)
    val ts1 = Snapshots.snapshot(root, 1L).ts
    // Append commits v2
    (100L until 120L).map(k => (k, k * 2.0)).toDF("k", "x")
      .write.format("graft-snap").mode(SaveMode.Append).save(root)
    assert(Snapshots.versions(root) === Seq(1L, 2L))
    assert(spark.read.format("graft-snap").load(root).count() === 120L)
    // time travel: by version and by timestamp (v1's own commit ts)
    assert(spark.read.format("graft-snap").option("versionAsOf", "1")
      .load(root).count() === 100L)
    assert(spark.read.format("graft-snap")
      .option("timestampAsOf", ts1.toString).load(root).count() === 100L)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snap").option("versionAsOf", "1")
        .option("timestampAsOf", "0").load(root)
    }
    // ErrorIfExists on a non-empty table is loud
    intercept[IllegalStateException] {
      (0L until 1L).map(k => (k, 0.0)).toDF("k", "x")
        .write.format("graft-snap").save(root)
    }
    // Ignore is a no-op on a non-empty table
    (0L until 1L).map(k => (k, 0.0)).toDF("k", "x")
      .write.format("graft-snap").mode(SaveMode.Ignore).save(root)
    assert(Snapshots.versions(root) === Seq(1L, 2L))
    // Overwrite is a REPLACE commit (pinned, audited)
    (0L until 10L).map(k => (k, 1.0)).toDF("k", "x")
      .write.format("graft-snap").mode(SaveMode.Overwrite).save(root)
    assert(spark.read.format("graft-snap").load(root).count() === 10L)
    assert(spark.read.format("graft-snap").option("versionAsOf", "2")
      .load(root).count() === 120L, "pinned pre-overwrite reads survive")
    // plain SQL over the format, time travel included
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW snap_v1 USING `graft-snap` " +
      s"OPTIONS (path '$root', versionAsOf '1')")
    assert(spark.sql("SELECT count(*) FROM snap_v1").head().getLong(0) === 100L)
  }

  test("pushed filters prune files from manifest-embedded stats — zero footer I/O, plan-asserted") {
    val ss = spark; import ss.implicits._
    val root = freshDir()
    (0L until 8L).foreach { i => // 8 commits = 8 files with tight k ranges
      (i * 100L until (i + 1) * 100L).map(k => (k, k * 1.0)).toDF("k", "x")
        .coalesce(1).write.format("graft-snap").mode(SaveMode.Append)
        .option("statsCols", "k").save(root)
    }
    // ONE action per frame: every Dataset action resets plan metrics and
    // the lazy file listing doesn't re-post them — collect rows and the
    // scanned-file metric from the same execution
    def rowsAndFiles(df: org.apache.spark.sql.DataFrame)
        : (Array[org.apache.spark.sql.Row], Long) = {
      val rows = df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
      (rows, scan.metrics("numFiles").value)
    }
    val (allRows, allFiles) =
      rowsAndFiles(spark.read.format("graft-snap").load(root))
    assert(allRows.length === 800 && allFiles === 8L)
    val (prunedRows, prunedFiles) = rowsAndFiles(
      spark.read.format("graft-snap").load(root)
        .where(col("k") >= 250L && col("k") <= 320L))
    assert(prunedRows.map(_.getLong(0)).sorted.toSeq === (250L to 320L))
    assert(prunedFiles === 2L,
      "only the two files whose [min,max] intersects [250,320] may scan")
    // a column without embedded bounds prunes nothing (conservative)
    val (unRows, unFiles) = rowsAndFiles(
      spark.read.format("graft-snap").load(root).where(col("x") <= 1.0))
    assert(unRows.length === 2 && unFiles === 8L) // x = 0.0, 1.0
    // IN-list point lookups prune via the values' [min, max] hull
    val (inRows, inFiles) = rowsAndFiles(
      spark.read.format("graft-snap").load(root)
        .where(col("k").isin(110L, 130L, 190L)))
    assert(inRows.map(_.getLong(0)).sorted.toSeq === Seq(110L, 130L, 190L))
    assert(inFiles === 1L, "all three keys live in the [100,200) file")
    // planning needed ZERO file stats: sizes came from manifest entries
    assert(Snapshots.snapshot(root,
      Snapshots.latestVersion(root).get).files.forall(_.bytes > 0))
  }

  test("readStream.format(graft-snap): offsets are versions, a restart resumes exactly-once, a replace breaks loudly") {
    val ss = spark; import ss.implicits._
    val root = freshDir()
    Snapshots.init(root)
    Snapshots.commit(root, Seq((1L, "a")).toDF("k", "v"), "c1"): Unit
    val work = java.nio.file.Files.createTempDirectory("graft_snapstrm").toString
    def drain(): Unit = graft.streaming.StreamOps.drainToParquet(spark,
      spark.readStream.format("graft-snap").load(root),
      s"$work/sink", s"$work/ckpt")
    drain() // consumes v1, then the query object dies
    def sunk() = spark.read.parquet(s"$work/sink")
      .as[(Long, String)].collect().toSeq.sorted
    assert(sunk() === Seq((1L, "a")))
    // two commits land while the consumer is down; a NEW query on the
    // SAME checkpoint resumes from the offset log — versions 2..3 only
    Snapshots.commit(root, Seq((2L, "b")).toDF("k", "v"), "c2"): Unit
    Snapshots.commit(root, Seq((3L, "c")).toDF("k", "v"), "c3"): Unit
    drain()
    assert(sunk() === Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "exactly-once across the restart: no re-emission, no loss")
    drain() // nothing new: zero rows append
    assert(sunk() === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // a REPLACE resets history: the stream must break loudly, never
    // silently re-emit or skip
    Snapshots.commit(root,
      Snapshots.read(spark, root).coalesce(1), "rewrite",
      replace = true): Unit
    Snapshots.commit(root, Seq((9L, "z")).toDF("k", "v"), "c4"): Unit
    val e = intercept[Exception] { drain() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("replace commit")), s"got: ${msgs(e)}")
  }

  test("streaming contracts: mid-stream tombstones and schema changes break loudly, bad startingVersion refused") {
    val ss = spark; import ss.implicits._
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val root = freshDir()
    Snapshots.init(root)
    Snapshots.commit(root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "base"): Unit
    val work = java.nio.file.Files.createTempDirectory("graft_snapstrm2").toString
    def drain(): Unit = graft.streaming.StreamOps.drainToParquet(spark,
      spark.readStream.format("graft-snap").load(root),
      s"$work/sink", s"$work/ckpt")
    drain()
    // a row-level DELETE lands mid-stream: the tombstone-only commit
    // would stream ZERO rows and the delete would be silently lost — it
    // must break the stream instead
    Snapshots.deleteWhere(spark, root, col("k") === 1L): Unit
    val e1 = intercept[Exception] { drain() }
    assert(msgs(e1).exists(_.contains("tombstone")), s"got: ${msgs(e1)}")
    // compact away, stream a fresh consumer, then evolve additively —
    // reading new files through the pinned schema would silently CLIP
    // the new column, so that breaks loudly too
    Snapshots.compactMerged(spark, root, "k"): Unit
    val work2 = java.nio.file.Files.createTempDirectory("graft_snapstrm3").toString
    def drain2(): Unit = graft.streaming.StreamOps.drainToParquet(spark,
      spark.readStream.format("graft-snap").load(root),
      s"$work2/sink", s"$work2/ckpt")
    drain2()
    Snapshots.commit(root, Seq((5L, "e", 7.5)).toDF("k", "v", "w"),
      "widen"): Unit
    val e2 = intercept[Exception] { drain2() }
    assert(msgs(e2).exists(_.contains("changes the schema")), s"got: ${msgs(e2)}")
    // a startingVersion outside the committed range is a typo, not an
    // empty table — refused at stream construction
    val e3 = intercept[Exception] {
      spark.readStream.format("graft-snap").option("startingVersion", "99")
        .load(root).writeStream
        .format("parquet").option("path", s"$work2/sink2")
        .option("checkpointLocation", s"$work2/ckpt2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(msgs(e3).exists(_.contains("outside")), s"got: ${msgs(e3)}")
  }

  test("writeStream.format(graft-snap): one commit per micro-batch, exactly-once, pipelines don't collide") {
    val ss = spark; import ss.implicits._
    val src = freshDir()
    Snapshots.init(src)
    Snapshots.commit(src, Seq((1L, "a")).toDF("k", "v"), "c1"): Unit
    val dst = freshDir()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sinkck").toString
    // the full front-door pipe: snapshot table → readStream → writeStream
    // → snapshot table, offsets and commits both manifest-driven
    def pipe(cp: String = ckpt): Unit =
      spark.readStream.format("graft-snap").load(src)
        .writeStream.format("graft-snap")
        .option("path", dst).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    pipe()
    def dstRows() = Snapshots.read(spark, dst)
      .as[(Long, String)].collect().toSeq.sorted
    assert(dstRows() === Seq((1L, "a")))
    // two more source commits; the SAME checkpoint resumes incrementally
    Snapshots.commit(src, Seq((2L, "b")).toDF("k", "v"), "c2"): Unit
    Snapshots.commit(src, Seq((3L, "c")).toDF("k", "v"), "c3"): Unit
    pipe()
    assert(dstRows() === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // every dst commit is one tagged micro-batch; re-running adds nothing
    val notes = Snapshots.history(spark, dst)
      .select("note").collect().map(_.getString(0)).toSeq
    assert(notes.forall(_.startsWith("stream-batch-")), notes.toString)
    pipe()
    assert(Snapshots.versions(dst).size === notes.size, "idempotent re-run")
    // a REPLAYED epoch (same pipeline identity, fresh offset log — the
    // post-crash shape) is recognized by the table's own notes: batchIds
    // at or below the recovered high-water skip, nothing duplicates
    val replayCkpt = java.nio.file.Files
      .createTempDirectory("graft_sinkck2").toString
    pipe(cp = replayCkpt + "|force-tag") // DIFFERENT pipeline identity...
    val e = dstRows()
    assert(e.count(_ == ((1L, "a"))) >= 1)
    // ...a different pipeline legitimately lands its own copy (tags
    // scope the idempotence); the SAME tag replaying skips:
    val before = Snapshots.versions(dst).size
    spark.readStream.format("graft-snap").load(src)
      .writeStream.format("graft-snap")
      .option("path", dst)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sinkck3").toString)
      .option("txnAppId", ckpt) // claims the FIRST pipeline's identity
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    assert(Snapshots.versions(dst).size === before,
      "same txnAppId + already-committed batchIds → all skipped")
    // aggregating output modes are refused at construction
    intercept[Exception] {
      spark.readStream.format("graft-snap").load(src)
        .groupBy(col("v")).count()
        .writeStream.format("graft-snap")
        .outputMode("complete")
        .option("path", dst)
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft_sinkck4").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
  }

  test("front-door contracts: live tombstones and live schema rules refuse loudly; mergeSchema reads additive evolution") {
    val ss = spark; import ss.implicits._
    val root = freshDir()
    Snapshots.init(root)
    Snapshots.commit(root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "base"): Unit
    Snapshots.deleteWhere(spark, root, col("k") === 1L): Unit
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-snap").load(root)
    }
    assert(e.getMessage.contains("readMerged"))
    Snapshots.compactMerged(spark, root, "k"): Unit
    assert(spark.read.format("graft-snap").load(root).count() === 1L)
    Snapshots.renameColumn(root, "v", "val"): Unit
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snap").load(root)
    }
    Snapshots.optimizeFiles(spark, root, Seq("k"), 1L << 20): Unit
    assert(spark.read.format("graft-snap").load(root).columns.toSeq ===
      Seq("k", "val"))
    // additive evolution: new column appended post-hoc reads via
    // mergeSchema exactly like plain parquet
    Seq((9L, "z", 7.5)).toDF("k", "val", "w")
      .write.format("graft-snap").mode(SaveMode.Append).save(root)
    val evolved = spark.read.format("graft-snap")
      .option("mergeSchema", "true").load(root)
    assert(evolved.columns.toSeq === Seq("k", "val", "w"))
    assert(evolved.where(col("w").isNull).count() === 1L)
  }
}
