package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SnapIO, Snapshots}

/** Round-15 additions: O(delta) planning for the CDC stream source
  * (cached-state advance — the append source's planning contract
  * extended to the tombstone-bearing CDC diet), SQL row-level DML and
  * CTAS through the v2 catalog, and URI-root composition for the
  * catalog and streaming front doors.
  */
class RoundFifteenOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-round-fifteen-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshDir(prefix: String = "graft_r15"): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  // ---- O(delta) CDC stream planning --------------------------------------

  /** The shared CDC fixture: v1 base, v2 append, v3 UPDATE WHERE
    * (position tombstones + rewrites), v4 DELETE WHERE, v5 append.
    */
  private def cdcTable(): String = {
    val ss = spark; import ss.implicits._
    val root = Snapshots.init(freshDir())
    Snapshots.commit(root,
      (0L until 40L).map(k => (k, k * 1.0)).toDF("k", "x").coalesce(1),
      "base"): Unit
    Snapshots.commit(root,
      (40L until 60L).map(k => (k, k * 1.0)).toDF("k", "x").coalesce(1),
      "append"): Unit
    Snapshots.updateWhere(spark, root, col("k") % 10 === 0,
      Map("x" -> (col("x") + 1000.0))): Unit
    Snapshots.deleteWhere(spark, root, col("k") % 7 === 0): Unit
    Snapshots.commit(root,
      (60L until 70L).map(k => (k, k * 1.0)).toDF("k", "x").coalesce(1),
      "tail"): Unit
    root
  }

  test("advanceSnapshot advances a cached manifest state in O(window) segment reads — tombstone commits join the delta; non-append-shaped steps fall back to None") {
    val root = cdcTable()
    val base = Snapshots.snapshot(root, 2L)
    Snapshots.clearSegmentCacheForTests()
    val r0 = Snapshots.segmentReads.get()
    val advanced = Snapshots.advanceSnapshot(root, base, 5L).get
    val used = Snapshots.segmentReads.get() - r0
    assert(used <= 3L,
      s"a 3-version window must parse at most its own 3 segments " +
        s"(read $used) — O(delta), not O(files)")
    // the advanced state IS the full materialization, field for field
    val full = Snapshots.snapshot(root, 5L)
    assert(advanced.version === full.version)
    assert(advanced.parent === full.parent)
    assert(advanced.ts === full.ts)
    assert(advanced.rules === full.rules)
    assert(advanced.files.sortBy(_.path) === full.files.sortBy(_.path))
    assert(advanced.deletes.sortBy(_.path) === full.deletes.sortBy(_.path))
    assert(advanced.posDeletes.sortBy(_.path) ===
      full.posDeletes.sortBy(_.path))
    // a checkpoint collapses the segment-ref chain — not append-shaped:
    // the walk refuses (None) and the caller re-materializes
    Snapshots.compactMerged(spark, root, "k"): Unit // v6: replace
    assert(Snapshots.advanceSnapshot(root, full, 6L).isEmpty,
      "a replace window must fall back to full materialization")
    Snapshots.checkpoint(root): Unit                // v7: refs collapse
    assert(Snapshots.advanceSnapshot(root,
      Snapshots.snapshot(root, 6L), 7L).isEmpty,
      "a checkpoint window must fall back to full materialization")
  }

  test("the CDC stream source plans sequential micro-batches from the cached state — O(window) segment reads per batch, correct change rows") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = cdcTable()
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = spark.readStream.format("graft-snap")
      .option("readChangeFeed", "true").option("keyCol", "k")
      .load(root).schema
    val src = new graft.sources.GraftSnapCdcStreamSource(spark, root,
      schema, 0L, "k")
    def drain(from: Option[Long], to: Long) = {
      val f = src.getBatch(from.map(LongOffset(_)), LongOffset(to))
      org.apache.spark.sql.GraftSqlShims.asBatchFrame(cs, f)
        .groupBy(col("_commit_version"), col("_change_type"))
        .count().collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    }
    // batch 1 (0, 2]: stream start — ONE full materialization allowed
    assert(drain(None, 2L) === Seq((1L, "insert", 40L), (2L, "insert", 20L)))
    // sequential batches: the cached state advances by each window's own
    // segments — never a re-materialization of the table
    Snapshots.clearSegmentCacheForTests()
    val r0 = Snapshots.segmentReads.get()
    // (2, 3]: the UPDATE feeds delete(old) + insert(new) for k%10==0
    assert(drain(Some(2L), 3L) ===
      Seq((3L, "delete", 6L), (3L, "insert", 6L)))
    // (3, 4]: the DELETE feeds the matched rows' recovered payloads
    // (k%7==0 minus the position already re-written at v3 — positions
    // are against raw files, so 60/70-range k%7 rows: 0,7,...,63 minus
    // none; the v3-rewritten k%10 rows live in NEW files and match too)
    val d4 = drain(Some(3L), 4L)
    assert(d4.map(_._2).distinct === Seq("delete"))
    assert(d4.map(_._3).sum > 0L)
    // (4, 5]: a plain append feeds inserts
    assert(drain(Some(4L), 5L) === Seq((5L, "insert", 10L)))
    val used = Snapshots.segmentReads.get() - r0
    assert(used <= 3L,
      s"three 1-version windows must parse at most their own 3 segments " +
        s"(read $used) — the CDC source's planning is O(delta), not O(files)")
  }

  // ---- SQL row-level DML through the catalog -----------------------------

  test("SQL row-level DML: DELETE FROM deletes, CALL update_where updates, and SELECT serves the merge-on-read state with no compaction") {
    val ss = spark; import ss.implicits._
    val base = freshDir()
    val root = SnapIO.join(base, "t")
    (0L until 100L).map(k => (k, k * 1.0)).toDF("k", "x")
      .coalesce(1).write.format("graft-snap").save(root)
    spark.conf.set("spark.sql.catalog.g15", "graft.sources.GraftSnapCatalog")
    spark.conf.set("spark.sql.catalog.g15.root", base)
    // UPDATE via the procedure (arbitrary SQL assignments + predicate)
    assert(spark.sql(
      "CALL g15.update_where('t', 'x = x + 1000', 'k % 10 = 0')")
      .head().getLong(0) === 2L)
    // DELETE via native SQL (v1-filter predicate)
    spark.sql("DELETE FROM g15.t WHERE k >= 90").collect(): Unit
    // the very next SELECT serves the merged state — no compaction step
    val row = spark.sql(
      "SELECT count(*) AS n, CAST(sum(x) AS DOUBLE) AS s FROM g15.t").head()
    assert(row.getLong(0) === 90L)
    val expect = (0L until 90L).map(k =>
      if (k % 10 == 0) k * 1.0 + 1000 else k * 1.0).sum
    assert(math.abs(row.getDouble(1) - expect) < 1e-6)
    // predicates compose above the merged scan
    assert(spark.sql("SELECT count(*) FROM g15.t WHERE x >= 1000")
      .head().getLong(0) === 9L, "k=0..80 step 10 updated, k=90 deleted")
    // a PINNED (pre-DML) version still reads the old state, fast path
    assert(spark.sql("SELECT count(*) FROM g15.t VERSION AS OF 1")
      .head().getLong(0) === 100L)
    // history audits the two DML commits by note
    val notes = Snapshots.history(spark, root)
      .select("note").collect().map(_.getString(0)).toSeq
    assert(notes.contains("call-update-where"))
    assert(notes.contains("sql-delete-where"))
    // $files exposes the tombstone churn (file count is partition-
    // dependent; both DML commits must be represented)
    assert(spark.sql(
      "SELECT count(DISTINCT seq) FROM g15.`t$files` " +
        "WHERE kind = 'posdelete'").head().getLong(0) === 2L)
  }

  test("SQL DELETE refuses on a time-travel-pinned table and on untranslatable predicates; equality-tombstone tables SELECT through the inferred key") {
    val ss = spark; import ss.implicits._
    val base = freshDir()
    val root = SnapIO.join(base, "e")
    spark.conf.set("spark.sql.catalog.g15b", "graft.sources.GraftSnapCatalog")
    spark.conf.set("spark.sql.catalog.g15b.root", base)
    (0L until 50L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft-snap").save(root)
    // an equality-delete (commitChanges) state: upsert 5 keys, delete 3
    Snapshots.commitChanges(root,
      upserts = (0L until 5L).map(k => (k, s"new$k")).toDF("k", "v"),
      deleteKeys = Seq(47L, 48L, 49L).toDF("k"),
      keyCol = "k", note = "chg"): Unit
    // SELECT serves the merged state — the key column is inferred from
    // the tombstone files' own footers, no option needed
    assert(spark.sql("SELECT count(*) FROM g15b.e").head().getLong(0) === 47L)
    assert(spark.sql("SELECT v FROM g15b.e WHERE k = 3").head().getString(0)
      === "new3")
    // DELETE on a mod predicate is outside the v1 filter algebra: the
    // native path refuses loudly; the procedure takes it
    val e = intercept[Exception] {
      spark.sql("DELETE FROM g15b.e WHERE k % 7 = 0").collect()
    }
    assert(msgs(e).nonEmpty)
    assert(spark.sql("CALL g15b.delete_where('e', 'k % 7 = 0')")
      .head().getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM g15b.e").head().getLong(0) === 40L,
      "47 − k%7==0 survivors (0,7,...,42)")
  }

  test("a concurrent row-level DML derived from a pre-SQL-DELETE version conflicts loudly (write-skew guard holds through the SQL path)") {
    val ss = spark; import ss.implicits._
    val base = freshDir()
    val root = SnapIO.join(base, "w")
    (0L until 100L).map(k => (k, k * 1.0)).toDF("k", "x")
      .coalesce(1).write.format("graft-snap").save(root)
    spark.conf.set("spark.sql.catalog.g15c", "graft.sources.GraftSnapCatalog")
    spark.conf.set("spark.sql.catalog.g15c.root", base)
    // DML B derives its positions from v1 BEFORE the SQL DELETE lands
    val positionsB = Snapshots.positionsWhere(spark, root,
      col("k") % 5 === 0, Some(1L))
    spark.sql("DELETE FROM g15c.w WHERE k < 20").collect(): Unit // v2
    // B's rebase window now contains tombstones touching its files —
    // composing would double-apply: must conflict, never silently merge
    val e = intercept[java.util.ConcurrentModificationException] {
      Snapshots.commitPositionDeletes(root, positionsB, "dml-b",
        basedOn = Some(1L))
    }
    assert(e.getMessage.contains("write-skew"), e.getMessage)
    // recovery: recompute against the new latest through the SQL surface
    assert(spark.sql("CALL g15c.delete_where('w', 'k % 5 = 0')")
      .head().getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM g15c.w").head().getLong(0) === 64L,
      "100 − (k<20: 20) − (k%5==0 ∧ k>=20: 16)")
  }

  // ---- atomic CTAS -------------------------------------------------------

  test("CREATE TABLE AS SELECT: atomic first-commit semantics — table listed and readable, stats embedded via TBLPROPERTIES, existing names refuse") {
    val base = freshDir()
    spark.conf.set("spark.sql.catalog.g15d", "graft.sources.GraftSnapCatalog")
    spark.conf.set("spark.sql.catalog.g15d.root", base)
    spark.sql(
      """CREATE TABLE g15d.c TBLPROPERTIES('statsCols' = 'id')
        |AS SELECT id, id * 2.0 AS x FROM range(0, 100)""".stripMargin)
      .collect(): Unit
    assert(spark.sql("SHOW TABLES IN g15d").collect()
      .map(_.getString(1)).toSeq === Seq("c"))
    assert(spark.sql("SELECT count(*), CAST(sum(x) AS DOUBLE) FROM g15d.c")
      .head().toSeq === Seq(100L, (0 until 100).map(_ * 2.0).sum))
    val root = SnapIO.join(base, "c")
    assert(Snapshots.versions(root) === Seq(1L), "CTAS is ONE commit")
    assert(Snapshots.commitNote(root, 1L) === "ctas")
    assert(Snapshots.snapshot(root, 1L).files.filter(_.rows > 0)
      .forall(_.stats.contains("id")),
      "TBLPROPERTIES('statsCols') embeds manifest bounds in the first commit")
    // the born table takes every downstream verb: INSERT, time travel
    spark.sql("INSERT INTO g15d.c VALUES (999, 0.0)").collect(): Unit
    assert(spark.sql("SELECT count(*) FROM g15d.c").head().getLong(0) === 101L)
    assert(spark.sql("SELECT count(*) FROM g15d.c VERSION AS OF 1")
      .head().getLong(0) === 100L)
    // CTAS onto an existing name refuses loudly
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE g15d.c AS SELECT 1 AS k").collect()
    }
    assert(msgs(e).exists(m => m.contains("already exists") ||
      m.contains("TABLE_OR_VIEW_ALREADY_EXISTS")), s"got: ${msgs(e)}")
  }

  test("a FAILED CTAS leaves no table root behind; a lost create race never deletes the winner's table") {
    val ss = spark; import ss.implicits._
    val base = freshDir()
    spark.conf.set("spark.sql.catalog.g15e", "graft.sources.GraftSnapCatalog")
    spark.conf.set("spark.sql.catalog.g15e.root", base)
    // 1. the SELECT throws mid-write → abort: no table, no root debris
    intercept[Exception] {
      spark.sql("CREATE TABLE g15e.f AS " +
        "SELECT raise_error('boom') AS x FROM range(1)").collect()
    }
    assert(spark.sql("SHOW TABLES IN g15e").collect().isEmpty)
    assert(!SnapIO.exists(SnapIO.join(base, "f")),
      "a failed CTAS must leave no table root behind")
    // 2. two concurrent CTAS of one name: the loser's commit conflicts
    //    loudly and its ABORT must not delete the winner's table
    val root = SnapIO.join(base, "r")
    val a = new graft.sources.GraftSnapStagedTable("g15e.r", root,
      new org.apache.spark.sql.types.StructType(), Seq.empty)
    val b = new graft.sources.GraftSnapStagedTable("g15e.r", root,
      new org.apache.spark.sql.types.StructType(), Seq.empty)
    def write(t: graft.sources.GraftSnapStagedTable,
              df: org.apache.spark.sql.DataFrame): Unit =
      t.newWriteBuilder(null).build()
        .asInstanceOf[org.apache.spark.sql.connector.write.V1Write]
        .toInsertableRelation.insert(df, overwrite = false)
    write(a, Seq((1L, "winner")).toDF("k", "v").coalesce(1))
    write(b, Seq((2L, "loser")).toDF("k", "v").coalesce(1))
    a.commitStagedChanges()
    intercept[java.util.ConcurrentModificationException] {
      b.commitStagedChanges()
    }
    b.abortStagedChanges() // what Spark's exec does on failure
    assert(spark.sql("SELECT v FROM g15e.r").head().getString(0) === "winner",
      "the loser's abort must only reclaim its own staged files")
    assert(Snapshots.versions(root) === Seq(1L))
    // 3. abort BEFORE the winner publishes: rmdir semantics must leave
    //    the concurrent attempt's staged (still-unpublished) files alone
    val root2 = SnapIO.join(base, "r2")
    val a2 = new graft.sources.GraftSnapStagedTable("g15e.r2", root2,
      new org.apache.spark.sql.types.StructType(), Seq.empty)
    val b2 = new graft.sources.GraftSnapStagedTable("g15e.r2", root2,
      new org.apache.spark.sql.types.StructType(), Seq.empty)
    write(a2, Seq((1L, "winner")).toDF("k", "v").coalesce(1))
    write(b2, Seq((2L, "loser")).toDF("k", "v").coalesce(1))
    b2.abortStagedChanges() // loser gives up FIRST — no manifest anywhere
    a2.commitStagedChanges() // the future winner's files must be intact
    assert(spark.sql("SELECT v FROM g15e.r2").head().getString(0) === "winner",
      "an abort before the winner publishes must not raze the root")
  }

  // ---- option-route merge-on-read reads ----------------------------------

  test("option(\"readMerged\") serves a tombstone-bearing version's merged state through the option front door; equality tombstones demand keyCol; writers never inherit the option") {
    val ss = spark; import ss.implicits._
    val root = Snapshots.init(freshDir())
    Snapshots.commit(root,
      (0L until 60L).map(k => (k, k * 1.0)).toDF("k", "x").coalesce(1),
      "base"): Unit
    Snapshots.updateWhere(spark, root, col("k") < 5,
      Map("x" -> (col("x") + 100.0))): Unit
    Snapshots.deleteWhere(spark, root, col("k") >= 50): Unit
    // the PLAIN option-route read refuses this state loudly…
    val e = intercept[Exception] {
      spark.read.format("graft-snap").load(root).count()
    }
    assert(msgs(e).exists(_.contains("readMerged")), s"got: ${msgs(e)}")
    // …and the readMerged option serves it (position-only: no keyCol)
    val merged = spark.read.format("graft-snap")
      .option("readMerged", "true").load(root)
    assert(merged.count() === 50L)
    assert(merged.where(col("k") < 5).agg(sum(col("x"))).head().getDouble(0)
      === (0 until 5).map(_ * 1.0 + 100).sum)
    // column pruning composes (PrunedScan)
    assert(merged.select("k").distinct().count() === 50L)
    // version pinning composes
    assert(spark.read.format("graft-snap").option("readMerged", "true")
      .option("versionAsOf", "2").load(root).count() === 60L)
    // EQUALITY tombstones demand keyCol — loudly, never a wrong default
    Snapshots.commitChanges(root,
      upserts = spark.emptyDataset[(Long, Double)].toDF("k", "x"),
      deleteKeys = Seq(1L).toDF("k"), keyCol = "k", note = "eq"): Unit
    val e2 = intercept[Exception] {
      spark.read.format("graft-snap").option("readMerged", "true")
        .load(root).count()
    }
    assert(msgs(e2).exists(_.contains("keyCol")), s"got: ${msgs(e2)}")
    assert(spark.read.format("graft-snap").option("readMerged", "true")
      .option("keyCol", "k").load(root).count() === 49L)
  }

  // ---- URI-root composition ----------------------------------------------

  test("URI-root composition: the v2 catalog (CTAS, INSERT, DML, time travel) and the streaming front door (source, sink, CDC) all run on a file:// root") {
    val ss = spark; import ss.implicits._
    val local = freshDir()
    val base = "file://" + local
    spark.conf.set("spark.sql.catalog.g15f", "graft.sources.GraftSnapCatalog")
    spark.conf.set("spark.sql.catalog.g15f.root", base)
    // the CATALOG over a URI root: CTAS → read → INSERT → row-level DML
    // → merged read → time travel, every byte through SnapIO's
    // FileSystem branch and the FS arbiter
    spark.sql("CREATE TABLE g15f.t AS " +
      "SELECT id AS k, id * 1.0 AS x FROM range(0, 50)").collect(): Unit
    assert(new java.io.File(local, "t/_graft_snaps").isDirectory,
      "metadata physically landed where the URI points")
    assert(spark.sql("SELECT count(*) FROM g15f.t").head().getLong(0) === 50L)
    assert(spark.sql("SHOW TABLES IN g15f").collect()
      .map(_.getString(1)).toSeq === Seq("t"))
    spark.sql("INSERT INTO g15f.t VALUES (100, 0.0)").collect(): Unit  // v2
    spark.sql("CALL g15f.update_where('t', 'x = x + 10', 'k < 5')")
      .collect(): Unit                                                 // v3
    spark.sql("DELETE FROM g15f.t WHERE k >= 40 AND k < 100")
      .collect(): Unit                                                 // v4
    assert(spark.sql("SELECT count(*) FROM g15f.t").head().getLong(0) === 41L,
      "50 + 1 inserted − 10 deleted")
    assert(spark.sql(
      "SELECT CAST(sum(x) AS DOUBLE) FROM g15f.t WHERE k < 5")
      .head().getDouble(0) === (0 until 5).map(_ * 1.0 + 10).sum)
    assert(spark.sql("SELECT count(*) FROM g15f.t VERSION AS OF 1")
      .head().getLong(0) === 50L)
    // the STREAMING front door on URI roots: append source over
    // file://A drains through the graft-snap streaming sink into
    // file://B — offsets, micro-batch planning, exactly-once markers
    // and the sink's commits all through the FileSystem branch
    val srcRoot = s"$base/s1"
    (0L until 30L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(1)
      .write.format("graft-snap").save(srcRoot)
    (30L until 45L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(1)
      .write.format("graft-snap")
      .mode(org.apache.spark.sql.SaveMode.Append).save(srcRoot)
    val dstRoot = s"$base/s2"
    streaming.StreamOps.drainToSnap(spark,
      spark.readStream.format("graft-snap").load(srcRoot),
      dstRoot, s"${freshDir()}/ckpt")
    assert(Snapshots.read(spark, dstRoot).count() === 45L)
    assert(spark.sql("SELECT count(*) FROM g15f.s2").head().getLong(0) === 45L,
      "the sink's commits list under the same catalog root")
    // the CDC STREAM over the URI root's DML'd table: the update feeds
    // delete(old)+insert(new), the delete feeds recovered payloads
    val cdcSink = freshDir()
    streaming.StreamOps.drainToParquet(spark,
      spark.readStream.format("graft-snap")
        .option("readChangeFeed", "true").option("keyCol", "k")
        .option("startingVersion", "2").load(SnapIO.join(base, "t")),
      s"$cdcSink/sink", s"$cdcSink/ckpt")
    val feed = spark.read.parquet(s"$cdcSink/sink")
      .groupBy(col("_commit_version"), col("_change_type")).count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(feed === Seq((3L, "delete", 5L), (3L, "insert", 5L),
      (4L, "delete", 10L)))
  }

  test("the CDC stream source stays correct when a batch is NOT sequential (restart replay): the fallback re-materializes and the feed matches the batch changeFeed") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = cdcTable()
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = spark.readStream.format("graft-snap")
      .option("readChangeFeed", "true").option("keyCol", "k")
      .load(root).schema
    val src = new graft.sources.GraftSnapCdcStreamSource(spark, root,
      schema, 0L, "k")
    // advance the cache to v5, then replay an OLD window (post-crash
    // shape): the cache cannot serve (2, 4] — the source must fall back,
    // not feed garbage
    src.getBatch(None, LongOffset(5L)): Unit
    val replay = org.apache.spark.sql.GraftSqlShims.asBatchFrame(cs,
      src.getBatch(Some(LongOffset(2L)), LongOffset(4L)))
      .groupBy(col("_change_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val oracle = Snapshots.changeFeed(spark, root, 2L, 4L, "k")
      .groupBy(col("_change_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(replay === oracle)
  }
}
