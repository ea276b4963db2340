package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Snapshots

/** The snapshot-isolated table format: immutable data files + atomic
  * manifest creation as the commit arbiter (optimistic concurrency),
  * time-travel reads, replace-commit conflict detection, and vacuum
  * retiring exactly the files only dropped versions reference.
  */
class SnapshotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-snapshot-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshTable(): String = Snapshots.init(
    java.nio.file.Files.createTempDirectory("graft_snap").toString)

  private def ids(root: String, v: Option[Long] = None): Seq[Long] =
    Snapshots.read(spark, root, v).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("append commits accumulate; time travel returns each version's exact state") {
    val root = freshTable()
    val v1 = Snapshots.commit(root, spark.range(0, 5).toDF(), "base")
    val v2 = Snapshots.commit(root, spark.range(5, 8).toDF(), "more")
    assert((v1, v2) === (1L, 2L))
    assert(Snapshots.versions(root) === Seq(1L, 2L))
    assert(ids(root, Some(1L)) === (0L until 5L))
    assert(ids(root, Some(2L)) === (0L until 8L))
    assert(ids(root) === (0L until 8L)) // latest by default
    // a pinned reader is untouched by later commits — v1 re-read after v2
    assert(ids(root, Some(1L)) === (0L until 5L))
  }

  test("replace commit supersedes; old version stays readable until vacuumed") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 10).toDF(), "base"): Unit
    val v2 = Snapshots.commit(root,
      spark.range(0, 10).toDF().where(col("id") % 2 === 0), "compact",
      replace = true)
    assert(v2 === 2L)
    assert(ids(root, Some(2L)) === Seq(0L, 2L, 4L, 6L, 8L))
    assert(ids(root, Some(1L)) === (0L until 10L)) // isolation
    // manifest row counts came from footers, not a re-scan
    assert(Snapshots.snapshot(root, 2L).files.map(_.rows).sum === 5L)
  }

  test("commit races: append rebases past a winner; replace aborts with a conflict") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 3).toDF(), "base"): Unit
    // simulate a concurrent winner grabbing v2 between this committer's
    // read of latest (done inside commit) and its manifest rename: occupy
    // the v2 slot directly
    val winner = java.nio.file.Paths.get(root, "_graft_snaps", "v00000002.txt")
    java.nio.file.Files.write(winner,
      "version=2\nparent=1\nnote=winner\n".getBytes("UTF-8"))
    val v = Snapshots.commit(root, spark.range(3, 6).toDF(), "append")
    assert(v === 3L, "append must rebase to the next free version")
    // the rebased append's parent is the winner: it inherits the
    // winner's file list (here: none — the fake winner dropped v1's
    // files, and the rebase honors that) plus its own new files
    assert(Snapshots.snapshot(root, 3L).parent === 2L)
    assert(ids(root, Some(3L)) === (3L until 6L))

    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_graft_snaps", "v00000004.txt"),
      "version=4\nparent=3\nnote=winner2\nfile=data/none.parquet|0\n"
        .getBytes("UTF-8"))
    // the replace writer computed its rewrite FROM v3; the interleaved
    // v4 must surface as a conflict, never be silently dropped
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.commit(root, spark.range(9, 10).toDF(), "rewrite",
        replace = true, basedOn = Some(3L))
    }
  }

  test("vacuum deletes exactly the files only dropped versions reference, plus crash debris") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 4).toDF(), "base"): Unit
    Snapshots.commit(root, spark.range(4, 6).toDF(), "append"): Unit
    Snapshots.commit(root, spark.range(100, 103).toDF(), "rewrite",
      replace = true): Unit
    // crash debris: a data dir whose commit never published
    val debris = new java.io.File(root, "data/orphan")
    debris.mkdirs()
    java.nio.file.Files.write(debris.toPath.resolve("junk.parquet"),
      Array[Byte](1, 2, 3))

    // visible data files only: _SUCCESS/.crc sidecars are infrastructure
    def dataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val cs = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        cs.filter(c => c.isFile && !c.getName.startsWith("_") &&
          !c.getName.startsWith(".")) ++
          cs.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(root, "data")).map(_.getPath).toSet
    }
    val before = dataFiles()
    val live = Snapshots.snapshot(root, 3L).files
      .map(f => s"$root/${f.path}").toSet
    assert(live.subsetOf(before))

    val deleted = Snapshots.vacuum(root, keepVersions = 1, minAgeMillis = 0)
    assert(deleted === (before.size - live.size))
    assert(dataFiles() === live)
    // dead commit dirs went entirely — sidecars included
    val subdirs = Option(new java.io.File(root, "data").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty).filter(_.isDirectory)
    assert(subdirs.size === 1, "only the surviving commit dir remains")
    assert(Snapshots.versions(root) === Seq(3L))
    assert(ids(root) === (100L until 103L)) // the survivor still reads
  }

  test("vacuum's min-age guard spares young unreferenced files (a concurrent in-flight commit)") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 3).toDF(), "base"): Unit
    // a concurrent committer mid-writeData: files on disk, manifest not
    // yet published — indistinguishable from debris except by AGE
    val inflight = new java.io.File(root, "data/inflight")
    inflight.mkdirs()
    java.nio.file.Files.write(inflight.toPath.resolve("part-x.parquet"),
      Array[Byte](1, 2, 3))
    // default (1 h) min age: the young file survives
    assert(Snapshots.vacuum(root, keepVersions = 1) === 0)
    assert(new java.io.File(inflight, "part-x.parquet").isFile)
    // once ripe, the next vacuum reclaims it
    assert(Snapshots.vacuum(root, keepVersions = 1, minAgeMillis = 0) === 1)
    assert(!inflight.exists())
  }

  test("restore makes an old version the new head without rewriting data; restored files survive a tight vacuum") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 6).toDF(), "good"): Unit
    Snapshots.commit(root, spark.range(100, 102).toDF(), "bad-rewrite",
      replace = true): Unit
    val v3 = Snapshots.restore(root, 1L)
    assert(v3 === 3L)
    assert(ids(root) === (0L until 6L)) // v1's exact state is the head
    assert(ids(root, Some(2L)) === (100L until 102L)) // history intact
    // the restore listed v1's entries VERBATIM (seq 1, not 3)
    assert(Snapshots.snapshot(root, 3L).files.forall(_.seq === 1L))
    // a keepVersions=1 vacuum keeps the restored files (referenced by
    // the head) and reaps the bad rewrite's
    assert(Snapshots.vacuum(root, 1, minAgeMillis = 0) > 0)
    assert(ids(root) === (0L until 6L))
    assert(Snapshots.countRows(root) === Some(6L))
  }

  test("countRows: metadata-only count per version; None under live tombstones; exact again after compaction") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 100).toDF(), "base"): Unit
    Snapshots.commit(root, spark.range(100, 130).toDF(), "append"): Unit
    assert(Snapshots.countRows(root, Some(1L)) === Some(100L))
    assert(Snapshots.countRows(root) === Some(130L))
    Snapshots.commitChanges(root,
      upserts = Seq((5L, 0L)).toDF("id", "x").select(col("id")),
      deleteKeys = Seq(Tuple1(7L)).toDF("id"), "id", "chg"): Unit
    assert(Snapshots.countRows(root) === None,
      "tombstoned manifest sums are an upper bound, never a count")
    Snapshots.compactMerged(spark, root, "id"): Unit
    assert(Snapshots.countRows(root) ===
      Some(Snapshots.read(spark, root).count()))
  }

  // ---- merge-on-read (equality-delete tombstones) ---------------------------

  test("commitChanges + readMerged: upserts shadow older rows, deletes drop, own-commit rows survive, latest wins across commits") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "base"): Unit
    // change 1: upsert k=2, delete k=3
    Snapshots.commitChanges(root,
      upserts = Seq((2L, "B")).toDF("k", "v"),
      deleteKeys = Seq(Tuple1(3L)).toDF("k"), "k", "chg1"): Unit
    val after1 = Snapshots.readMerged(spark, root, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(after1 === Seq((1L, "a"), (2L, "B")))
    // change 2: upsert k=2 again and re-insert k=3 — latest wins; the
    // re-insert's row (seq 3) survives chg1's tombstone (seq 2)
    Snapshots.commitChanges(root,
      upserts = Seq((2L, "BB"), (3L, "CC")).toDF("k", "v"),
      deleteKeys = spark.emptyDataset[Long].toDF("k"), "k", "chg2"): Unit
    val after2 = Snapshots.readMerged(spark, root, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(after2 === Seq((1L, "a"), (2L, "BB"), (3L, "CC")))
    // time travel still works on the merged view
    val at2 = Snapshots.readMerged(spark, root, "k", Some(2L))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(at2 === after1)
    // write cost was O(batch): no base data file was rewritten
    assert(Snapshots.snapshot(root, 3L).files.count(_.seq == 1L) ===
      Snapshots.snapshot(root, 1L).files.size)
  }

  test("compactMerged materializes tombstones away; pinned older versions keep the merged view") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"), "base"): Unit
    Snapshots.commitChanges(root,
      upserts = Seq((1L, 11.0)).toDF("k", "x"),
      deleteKeys = Seq(Tuple1(2L)).toDF("k"), "k", "chg"): Unit
    val merged = Snapshots.readMerged(spark, root, "k")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    val v = Snapshots.compactMerged(spark, root, "k")
    assert(v === 3L)
    assert(Snapshots.snapshot(root, 3L).deletes.isEmpty,
      "compaction must retire every tombstone")
    // plain read now equals the merged view (no tombstones to apply)
    assert(Snapshots.read(spark, root).orderBy("k")
      .as[(Long, Double)].collect().toSeq === merged)
    assert(merged === Seq((1L, 11.0)))
    // a reader pinned before compaction still merges correctly
    assert(Snapshots.readMerged(spark, root, "k", Some(2L))
      .orderBy("k").as[(Long, Double)].collect().toSeq === merged)
  }

  test("clustered compactMerged restores the zone map's bite after MOR churn") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 4000)
      .select(col("id"), (col("id") % 7).as("p"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      "base"): Unit
    // MOR churn: two change batches spanning the WHOLE id domain — each
    // appended file's [min,max] covers everything, so pruning stops biting
    (0 until 2).foreach { r =>
      Snapshots.commitChanges(root,
        upserts = spark.range(0, 4000).where(pmod(col("id"), lit(13)) === r)
          .select(col("id"), lit(100L + r).as("p")).coalesce(1),
        deleteKeys = spark.emptyDataset[Long].toDF("id"), "id", s"chg$r"): Unit
    }
    val churned = Snapshots.zoneMap(spark, root, Seq("id"))
    val wideFiles = churned.where(col("min_id") < 500 && col("max_id") > 3500)
      .count()
    assert(wideFiles >= 2, "churn should have produced domain-spanning files")
    // compact WITH clustering: tombstones retired AND zones tight again
    Snapshots.compactMerged(spark, root, "id",
      clusterBy = Seq("id"), nFiles = 4): Unit
    val stats = Snapshots.zoneMap(spark, root, Seq("id"))
    assert(stats.count() === 4)
    val survivors = graft.ops.Layout.zonePrune(stats, Seq(("id", 0L, 900L)))
    assert(survivors.size === 1, s"expected 1 surviving file, got $survivors")
    // and the compacted state is still the merged truth
    val got = Snapshots.read(spark, root)
      .where(pmod(col("id"), lit(13)) === 0).select("p")
      .distinct().as[Long].collect().toSeq
    assert(got === Seq(100L))
  }

  test("changesBetween returns exactly the appended rows; replace in the window is rejected") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 4).toDF(), "base"): Unit
    Snapshots.commit(root, spark.range(4, 7).toDF(), "a1"): Unit
    Snapshots.commit(root, spark.range(7, 9).toDF(), "a2"): Unit
    val inc = Snapshots.changesBetween(spark, root, 1L, 3L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc === (4L until 9L))
    val all = Snapshots.changesBetween(spark, root, 0L, 3L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(all === (0L until 9L))
    Snapshots.commit(root, spark.range(100, 101).toDF(), "rewrite",
      replace = true): Unit
    intercept[IllegalArgumentException] {
      Snapshots.changesBetween(spark, root, 2L, 4L)
    }
    // windows entirely after the replace are append-shaped again
    Snapshots.commit(root, spark.range(101, 103).toDF(), "a3"): Unit
    assert(Snapshots.changesBetween(spark, root, 4L, 5L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      (101L until 103L))
  }

  // ---- schema evolution + zone-map scan planning ---------------------------

  test("additive schema evolution: a new column appends; old rows read NULL; pinned old versions keep the old schema") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "base"): Unit
    Snapshots.commit(root,
      Seq((3L, "c", 0.5)).toDF("k", "v", "score"), "widened"): Unit
    val evolved = Snapshots.read(spark, root, evolved = true)
    assert(evolved.columns.toSet === Set("k", "v", "score"))
    val got = evolved.orderBy("k")
      .select(col("k"), col("v"), col("score"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.5))))
    // a reader pinned BEFORE the evolution sees the old schema
    assert(Snapshots.read(spark, root, Some(1L), evolved = true)
      .columns.toSet === Set("k", "v"))
  }

  test("readPruned: manifest ∩ zone map — only intersecting files of the pinned version are scanned") {
    val root = freshTable()
    // two append commits, each range-clustered: commit files carry tight
    // id zones, so an id window prunes across BOTH commits' file sets
    Snapshots.commit(root, spark.range(0, 4000)
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .toDF(), "a1"): Unit
    Snapshots.commit(root, spark.range(4000, 8000)
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .toDF(), "a2"): Unit
    val stats = Snapshots.zoneMap(spark, root, Seq("id"))
    assert(stats.count() === 8)
    val survivors = graft.ops.Layout.zonePrune(stats, Seq(("id", 3500L, 4500L)))
    assert(survivors.size < 8 && survivors.nonEmpty,
      s"expected a strict prune, got ${survivors.size} of 8")
    val pruned = Snapshots.readPruned(spark, root, Seq(("id", 3500L, 4500L)))
      .where(col("id") >= 3500 && col("id") <= 4500)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned === (3500L to 4500L))
    // stats follow the MANIFEST: a version pinned before a2 has only
    // a1's files in its zone map
    assert(Snapshots.zoneMap(spark, root, Seq("id"), Some(1L)).count() === 4)
    // a window no zone intersects is PROVABLY empty: an empty typed
    // frame, not an exception
    val none = Snapshots.readPruned(spark, root, Seq(("id", 100000L, 200000L)))
    assert(none.count() === 0 && none.columns.contains("id"))
  }

  test("vacuum keeping every version deletes only debris; re-run is a no-op") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 4).toDF(), "base"): Unit
    Snapshots.commit(root, spark.range(4, 8).toDF(), "append"): Unit
    assert(Snapshots.vacuum(root, keepVersions = 10, minAgeMillis = 0) === 0)
    assert(Snapshots.vacuum(root, keepVersions = 10, minAgeMillis = 0) === 0)
    assert(ids(root) === (0L until 8L))
    assert(ids(root, Some(1L)) === (0L until 4L))
  }

  // ---- timestamp time travel -------------------------------------------------

  test("AS OF timestamp resolves to the latest commit at-or-before; between-commit timestamps pick the earlier version") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 5).toDF(), "base"): Unit
    Thread.sleep(20) // separate the two commit clocks
    Snapshots.commit(root, spark.range(5, 9).toDF(), "delta"): Unit
    val ts1 = Snapshots.snapshot(root, 1L).ts
    val ts2 = Snapshots.snapshot(root, 2L).ts
    assert(ts1 > 0L && ts2 > ts1, "commits must carry monotone wall-clocks")
    assert(Snapshots.versionAsOf(root, ts1) === 1L) // exact boundary: inclusive
    assert(Snapshots.versionAsOf(root, (ts1 + ts2) / 2) === 1L) // between → earlier
    assert(Snapshots.versionAsOf(root, ts2) === 2L)
    assert(Snapshots.versionAsOf(root, ts2 + 3600000L) === 2L) // future → latest
    intercept[IllegalArgumentException] {
      Snapshots.versionAsOf(root, ts1 - 1) // predates the table
    }
    assert(Snapshots.readAsOf(spark, root, (ts1 + ts2) / 2)
      .count() === 5L)
    // history surfaces the commit clocks
    val hist = Snapshots.history(spark, root)
      .select("version", "commit_ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist === Map(1L -> ts1, 2L -> ts2))
  }

  // ---- O(delta) manifests ----------------------------------------------------

  test("an append writes O(delta) entry text: prior commits' segments are chained by reference, never rewritten") {
    val root = freshTable()
    Snapshots.commit(root,
      spark.range(0, 1024).toDF().repartition(16), "wide-base"): Unit
    val segsDir = new java.io.File(root, "_graft_snaps")
    def segs() = segsDir.listFiles().filter(_.getName.startsWith("seg_"))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = segs()
    assert(before.size === 1, "one commit, one segment")
    Snapshots.commit(root, spark.range(1024, 1025).toDF().coalesce(1),
      "tiny-append"): Unit
    val after = segs()
    assert(after.size === 2, "the append adds exactly its own segment")
    before.foreach { case (name, mtime) =>
      assert(after(name) === mtime, s"segment $name must never be rewritten")
    }
    // the version manifest is a header + segment refs — no entry lines
    val m2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_graft_snaps", "v00000002.txt")), "UTF-8")
    assert(!m2.contains("file="), "entries live in segments, not manifests")
    assert(m2.linesIterator.count(_.startsWith("segment=")) === 2)
    assert(m2.length < 400, s"manifest must stay tiny, got ${m2.length} bytes")
    // and the read still composes both commits
    assert(Snapshots.countRows(root) === Some(1025L))
    assert(ids(root).size === 1025)
  }

  test("legacy inline manifests read as-is, and the next commit adopts them into a segment") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 6).toDF(), "base"): Unit
    // rewrite v1 to the pre-segmentation INLINE form (what an older
    // engine wrote): header + file= lines, no ts, no segments
    val snap1 = Snapshots.snapshot(root, 1L)
    val inline = (Seq("version=1", "parent=0", "note=base") ++
      snap1.files.map(f => s"file=${f.path}|${f.rows}|${f.seq}"))
      .mkString("", "\n", "\n")
    val m1 = java.nio.file.Paths.get(root, "_graft_snaps", "v00000001.txt")
    java.nio.file.Files.delete(m1)
    java.nio.file.Files.write(m1, inline.getBytes("UTF-8"))
    // hand-rewriting a published manifest is a legacy SIMULATION only —
    // real manifests are immutable (what the doc cache banks on)
    Snapshots.invalidateManifestCache(root, 1L)
    // drop the now-orphaned segment to prove nothing references it
    new java.io.File(root, "_graft_snaps").listFiles()
      .filter(_.getName.startsWith("seg_")).foreach(f => f.delete(): Unit)
    assert(ids(root, Some(1L)) === (0L until 6L)) // legacy form reads
    assert(Snapshots.snapshot(root, 1L).ts === 0L) // no ts header → epoch
    assert(Snapshots.snapshot(root, 1L).files.forall(_.bytes === -1L),
      "pre-size entries parse with bytes = -1 (callers fall back to a stat)")
    val v2 = Snapshots.commit(root, spark.range(6, 8).toDF(), "append")
    assert(v2 === 2L)
    assert(ids(root) === (0L until 8L), "append chains past the legacy base")
    // v2's manifest references an ADOPTION segment carrying v1's entries
    // verbatim (seq still 1)
    assert(Snapshots.snapshot(root, 2L).files.count(_.seq == 1L) ===
      snap1.files.size)
  }

  // ---- position deletes (merge-on-read, Iceberg-v2 dual) ---------------------

  test("position deletes suppress exact rows; stack with equality deletes; compaction retires both") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root,
      (0L until 20L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartition(2), "base"): Unit
    // row-level DELETE WHERE on a NON-key predicate, no copy-on-write:
    // tombstone the positions of v-suffix 3/13 rows
    val pos = Snapshots.positionsWhere(spark, root,
      col("v").isin("v3", "v13"))
    assert(pos.count() === 2)
    val v2 = Snapshots.commitPositionDeletes(root, pos, "del-where")
    assert(v2 === 2L)
    assert(Snapshots.countRows(root) === None, "live tombstones → no exact count")
    val after = Snapshots.readMerged(spark, root, "k")
      .select("k").as[Long].collect().sorted.toSeq
    assert(after === (0L until 20L).filterNot(k => k == 3L || k == 13L))
    // plain read refuses the tombstoned version rather than lying
    intercept[IllegalArgumentException] { Snapshots.read(spark, root) }
    intercept[IllegalArgumentException] {
      Snapshots.readPruned(spark, root, Seq(("k", 0L, 100L)))
    }
    // stack an EQUALITY-delete commit on top: upsert k=5, delete k=7 —
    // and the upsert's new row must survive the older position tombstones
    Snapshots.commitChanges(root,
      upserts = Seq((5L, "V5")).toDF("k", "v"),
      deleteKeys = Seq(Tuple1(7L)).toDF("k"), "k", "chg"): Unit
    val stacked = Snapshots.readMerged(spark, root, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(stacked.map(_._1) ===
      (0L until 20L).filterNot(k => Set(3L, 7L, 13L)(k)))
    assert(stacked.find(_._1 == 5L).map(_._2) === Some("V5"))
    // a position delete against the MERGED state hits the upsert's file
    val pos2 = Snapshots.positionsWhere(spark, root, col("v") === "V5")
    // positionsWhere scans raw files: k=5 matches only the upsert row
    assert(pos2.count() === 1)
    Snapshots.commitPositionDeletes(root, pos2, "del-upsert"): Unit
    val afterPos2 = Snapshots.readMerged(spark, root, "k")
      .select("k").as[Long].collect().sorted.toSeq
    assert(afterPos2 === (0L until 20L).filterNot(k => Set(3L, 5L, 7L, 13L)(k)))
    // compaction materializes BOTH tombstone kinds away
    Snapshots.compactMerged(spark, root, "k"): Unit
    val s = Snapshots.snapshot(root, Snapshots.latestVersion(root).get)
    assert(s.deletes.isEmpty && s.posDeletes.isEmpty)
    assert(Snapshots.countRows(root) === Some(16L))
    assert(Snapshots.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq === afterPos2)
  }

  test("merge-on-read across additive schema evolution: old commits surface NULL for new columns") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "base"): Unit
    // the change batch carries a column the base never had
    Snapshots.commitChanges(root,
      upserts = Seq((2L, "B", "extra")).toDF("k", "v", "w"),
      deleteKeys = spark.emptyDataset[Long].toDF("k"), "k", "widen"): Unit
    val got = Snapshots.readMerged(spark, root, "k")
      .orderBy("k").as[(Long, String, Option[String])].collect().toSeq
    assert(got === Seq((1L, "a", None), (2L, "B", Some("extra"))))
  }

  test("row-group zone map over a snapshot version: group-level skipping inside the format's compacted files") {
    val root = freshTable()
    Snapshots.commit(root,
      spark.range(0, 100000).toDF().orderBy("id").coalesce(1),
      "big-file"): Unit
    // the row-group map resolves per-group stats from the MANIFEST's
    // files — pinned to the version, invisible to later commits
    val stats = Snapshots.zoneMapRowGroups(spark, root, Seq("id"))
    assert(stats.agg(org.apache.spark.sql.functions.sum("n_rows"))
      .collect()(0).getLong(0) === 100000L)
    val surv = graft.ops.Layout.zonePruneRowGroups(stats,
      Seq(("id", 10L, 20L)))
    assert(surv.nonEmpty)
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val got = graft.ops.Layout.readRowGroups(spark, surv,
        StructType(Seq(StructField("id", LongType))))
      .where(col("id").between(10L, 20L))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (10L to 20L))
  }

  test("changeFeed: upserts/inserts/deletes typed per commit from manifests; replace and position windows rejected") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "base"): Unit
    // v2: rewrite k=2, delete k=3 — one MOR change commit
    Snapshots.commitChanges(root,
      upserts = Seq((2L, "B")).toDF("k", "v"),
      deleteKeys = Seq(Tuple1(3L)).toDF("k"), "k", "chg"): Unit
    // v3: a PLAIN append (no tombstones) — rows are inserts
    Snapshots.commit(root, Seq((9L, "i")).toDF("k", "v"), "append"): Unit
    val feed = Snapshots.changeFeed(spark, root, 1L, 3L, "k")
      .select("k", "v", "_change_type", "_commit_version")
      .orderBy("_commit_version", "_change_type", "k")
      .as[(Long, Option[String], String, Long)].collect().toSeq
    assert(feed === Seq(
      (3L, None, "delete", 2L),
      (2L, Some("B"), "upsert", 2L),
      (9L, Some("i"), "insert", 3L)))
    // a replace in the window breaks the feed loudly
    Snapshots.commit(root, Seq((0L, "z")).toDF("k", "v"), "rewrite",
      replace = true): Unit
    intercept[IllegalArgumentException] {
      Snapshots.changeFeed(spark, root, 1L, 4L, "k")
    }
    // a position-delete window feeds the deleted row's FULL payload:
    // the tombstone's (file, pos) keys back to the raw row
    val root2 = freshTable()
    Snapshots.commit(root2, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "base"): Unit
    Snapshots.deleteWhere(spark, root2, col("k") === 1L): Unit
    val posFeed = Snapshots.changeFeed(spark, root2, 1L, 2L, "k")
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(posFeed === Seq((1L, "a", "delete", 2L)),
      "the position-deleted row must feed with its recovered payload")
    // a position re-deleted in a later commit feeds ONCE, at the first
    // deleting version (positionsWhere scans raw files, so a second
    // DELETE re-matches the dead row)
    Snapshots.deleteWhere(spark, root2, col("k") <= 2L): Unit
    val feed2 = Snapshots.changeFeed(spark, root2, 1L, 3L, "k")
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(feed2 === Seq((1L, "a", "delete", 2L), (2L, "b", "delete", 3L)))
    // and a window AFTER the first delete excludes the already-dead row
    val feed3 = Snapshots.changeFeed(spark, root2, 2L, 3L, "k")
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(feed3 === Seq((2L, "b", "delete", 3L)),
      "a pre-window tombstone's position must not feed again")
  }

  test("updateWhere: one atomic commit — matched rows rewritten O(matched), own-commit rewrites survive their tombstones") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root,
      (0L until 100L).map(k => (k, k * 1.0)).toDF("k", "x")
        .repartition(2), "base"): Unit
    val v2 = Snapshots.updateWhere(spark, root,
      col("k") % 10 === 3, Map("x" -> (col("x") * -1)))
    assert(v2 === 2L)
    // exactly one commit: tombstones + rewrites atomic
    assert(Snapshots.versions(root) === Seq(1L, 2L))
    val got = Snapshots.readMerged(spark, root, "k")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(got === (0L until 100L).map(k =>
      (k, if (k % 10 == 3) -k * 1.0 else k * 1.0)))
    // the rewrite appended O(matched): 10 rows across the new files
    val s2 = Snapshots.snapshot(root, 2L)
    assert(s2.files.filter(_.seq == 2L).map(_.rows).sum === 10L)
    assert(s2.posDeletes.map(_.rows).sum === 10L)
    // deleteWhere stacks on the merged state
    Snapshots.deleteWhere(spark, root, col("k") >= 90L): Unit
    val after = Snapshots.readMerged(spark, root, "k")
      .select("k").as[Long].collect().sorted.toSeq
    assert(after === (0L until 90L))
    // updateWhere refuses tombstoned versions (positions would not map)
    intercept[IllegalArgumentException] {
      Snapshots.updateWhere(spark, root, col("k") === 1L,
        Map("x" -> lit(0.0)))
    }
  }

  test("updateWhere SET clauses all see the OLD row: a swap swaps (SQL UPDATE semantics)") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root,
      Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("k", "a", "b"),
      "base"): Unit
    // UPDATE SET a = b, b = a WHERE k = 1 — a sequential withColumn fold
    // would make both columns b_old; the simultaneous select must swap
    Snapshots.updateWhere(spark, root, col("k") === 1L,
      Map("a" -> col("b"), "b" -> col("a"))): Unit
    val got = Snapshots.readMerged(spark, root, "k")
      .orderBy("k").as[(Long, Double, Double)].collect().toSeq
    assert(got === Seq((1L, 20.0, 10.0), (2L, 30.0, 40.0)))
  }

  test("optimizeFiles: fragments collapse to target-sized clustered files as an audited replace; content preserved") {
    val root = freshTable()
    (0 until 5).foreach { r =>
      Snapshots.commit(root,
        spark.range(r * 1000L, r * 1000L + 1000).toDF().repartition(3),
        s"frag$r"): Unit
    }
    val before = Snapshots.snapshot(root, 5L).files.size
    assert(before === 15)
    val v = Snapshots.optimizeFiles(spark, root, Seq("id"),
      targetBytes = 64L * 1024 * 1024, statsCols = Seq("id"))
    val snap = Snapshots.snapshot(root, v)
    assert(snap.files.size < before, "OPTIMIZE must collapse the fragments")
    assert(ids(root) === (0 until 5).flatMap(r =>
      r * 1000L until r * 1000L + 1000L).sorted)
    // audited, stats-bearing, and the fragments stay readable pinned
    assert(Snapshots.history(spark, root).select("note").collect()
      .map(_.getString(0)).contains("optimize-v5"))
    assert(snap.files.forall(_.stats.contains("id")))
    assert(ids(root, Some(5L)).size === 5000)
  }

  test("rename/drop schema rules: zero-rewrite evolution — old files read in the new shape, pinned versions keep the old, compaction materializes") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "old_v"),
      "base"): Unit
    val v2 = Snapshots.renameColumn(root, "old_v", "v")
    assert(v2 === 2L) // a metadata-only commit: zero data files written
    assert(Snapshots.snapshot(root, 2L).files.size ===
      Snapshots.snapshot(root, 1L).files.size)
    Snapshots.commit(root, Seq((3L, 30.0)).toDF("k", "v"), "post-rename"): Unit
    val got = Snapshots.read(spark, root).orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)),
      "pre-rename files must surface under the NEW name")
    // a reader pinned before the rename keeps the old shape
    assert(Snapshots.read(spark, root, Some(1L)).columns.toSeq ===
      Seq("k", "old_v"))
    // merge-on-read composes with the rules (upsert under the new name)
    Snapshots.commitChanges(root,
      upserts = Seq((1L, 11.0)).toDF("k", "v"),
      deleteKeys = spark.emptyDataset[Long].toDF("k"), "k", "chg"): Unit
    assert(Snapshots.readMerged(spark, root, "k").orderBy("k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))
    // row-level DML surfaces apply the rules (predicates compile against
    // the CURRENT name over pre-rename files); positionsWhere scans RAW
    // files, so the eq-suppressed pre-upsert row of k=1 is included —
    // documented as safe for tombstoning only
    assert(Snapshots.positionsWhere(spark, root, col("v") > 0).count() === 4,
      "3 current rows + 1 suppressed pre-upsert row match on raw files")
    // raw STATS surfaces still refuse rule-bearing versions loudly
    // (stats key raw file column names — genuinely unsound under rules)
    intercept[IllegalArgumentException] {
      Snapshots.zoneMap(spark, root, Seq("v"))
    }
    // compaction materializes the current shape and RETIRES the rules
    Snapshots.compactMerged(spark, root, "k"): Unit
    val head = Snapshots.snapshot(root, Snapshots.latestVersion(root).get)
    assert(head.rules.isEmpty, "a replace commit resets the rule chain")
    assert(Snapshots.read(spark, root).columns.toSeq === Seq("k", "v"))
    // DROP: widen with a column, then drop it — zero rewrite again
    Snapshots.commit(root, Seq((9L, 90.0, "x")).toDF("k", "v", "w"),
      "widen"): Unit
    Snapshots.dropColumn(root, "w"): Unit
    val dropped = Snapshots.read(spark, root)
    assert(!dropped.columns.contains("w"))
    assert(dropped.count() === 4)
  }

  test("schema-rule safety rails: collisions/typos rejected, an append losing to a rename conflicts, raw stats surfaces refuse") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, Seq((1L, 10.0)).toDF("k", "v"), "base"): Unit
    // a colliding rename would make every read ambiguous — rejected
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(root, "k", "v")
    }
    // renaming/dropping a column the table doesn't have is a typo
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(root, "nope", "x")
    }
    intercept[IllegalArgumentException] { Snapshots.dropColumn(root, "nope") }
    // an APPEND that lost the manifest race to a rename carries the
    // PRE-rule shape: rebasing would stamp its files past the rule and
    // permanently mix shapes — it must conflict, loudly
    Snapshots.renameColumn(root, "v", "val"): Unit // v2
    intercept[java.util.ConcurrentModificationException] {
      // basedOn pins the pre-rename version the batch was derived from
      Snapshots.commit(root, Seq((2L, 20.0)).toDF("k", "v"), "stale-shape",
        basedOn = Some(1L))
    }
    // the recomputed batch (new shape) commits fine
    Snapshots.commit(root, Seq((2L, 20.0)).toDF("k", "val"), "new-shape"): Unit
    assert(Snapshots.read(spark, root).orderBy("k")
      .as[(Long, Double)].collect().toSeq === Seq((1L, 10.0), (2L, 20.0)))
    // raw-name stats and increment surfaces refuse rule-bearing versions
    intercept[IllegalArgumentException] {
      Snapshots.zoneMap(spark, root, Seq("val"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.zoneMapManifest(spark, root, Seq("val"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.changesBetween(spark, root, 1L, 3L)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.syncSnapshotSource(root,
        java.nio.file.Files.createTempDirectory("graft_sync").toString)
    }
  }

  // ---- manifest-embedded column statistics -------------------------------------

  test("manifest-embedded stats equal the footer zone map; pruning plans from manifest text alone") {
    val root = freshTable()
    Snapshots.commit(root,
      spark.range(0, 10000).toDF()
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"),
      "stats-base", statsCols = Seq("id")): Unit
    val fromManifest = Snapshots.zoneMapManifest(spark, root, Seq("id"))
      .orderBy("file").collect().toSeq
    val fromFooters = Snapshots.zoneMap(spark, root, Seq("id"))
      .orderBy("file").collect().toSeq
    assert(fromManifest === fromFooters,
      "embedded bounds must equal the footer zone map exactly")
    // the pruned read: strict survivor set, exact rows
    val survivors = graft.ops.Layout.zonePrune(
      Snapshots.zoneMapManifest(spark, root, Seq("id")),
      Seq(("id", 2000L, 3000L)))
    assert(survivors.nonEmpty && survivors.size < 8)
    val got = Snapshots.readPrunedManifest(spark, root,
        Seq(("id", 2000L, 3000L)))
      .where(col("id").between(2000L, 3000L))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (2000L to 3000L))
    // stats survive RESTORE verbatim (segments carried by reference)
    Snapshots.commit(root, spark.range(0, 1).toDF(), "noise",
      replace = true): Unit
    Snapshots.restore(root, 1L): Unit
    assert(Snapshots.zoneMapManifest(spark, root, Seq("id"))
      .orderBy("file").collect().toSeq === fromManifest)
  }

  test("stats-free commits surface NULL bounds: conservatively scanned, never skipped") {
    val root = freshTable()
    Snapshots.commit(root,
      spark.range(0, 100).toDF().coalesce(1), "no-stats"): Unit
    Snapshots.commit(root,
      spark.range(100, 200).toDF().coalesce(1), "with-stats",
      statsCols = Seq("id")): Unit
    val stats = Snapshots.zoneMapManifest(spark, root, Seq("id")).collect()
    assert(stats.count(_.isNullAt(2)) === 1, "pre-stats entry → NULL bounds")
    assert(stats.count(!_.isNullAt(2)) === 1)
    // a window entirely inside the stats-bearing commit still keeps the
    // stats-free file (NULL = cannot prune), so no row can ever be lost
    val survivors = graft.ops.Layout.zonePrune(
      Snapshots.zoneMapManifest(spark, root, Seq("id")),
      Seq(("id", 150L, 160L)))
    assert(survivors.size === 2)
    val got = Snapshots.readPrunedManifest(spark, root, Seq(("id", 150L, 160L)))
      .where(col("id").between(150L, 160L))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (150L to 160L))
  }

  // ---- layout maintenance through the format ----------------------------------

  test("zorderCommitN: the z-order rewrite is a REPLACE commit — audited in history, pinned readers keep the old layout, strips prune via manifest stats") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    val rows = (0L until 4096L).map(i => (i % 64, (i * 37) % 64, i))
      .toDF("a", "b", "payload")
    val v1 = Snapshots.commit(root, rows, "base")
    val v2 = graft.ops.Layout.zorderCommitN(root,
      Snapshots.read(spark, root, Some(v1)), Seq("a", "b"),
      bits = 6, stripTopBits = 4, basedOn = Some(v1))
    assert(v2 === 2L)
    // the rewrite audits in DESCRIBE HISTORY as a replace note
    val notes = Snapshots.history(spark, root)
      .select("version", "note").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(notes(2L) === "zorder-a,b")
    // pinned v1 keeps the unlaid schema (no zval/zstrip)
    assert(!Snapshots.read(spark, root, Some(v1)).columns.contains("zval"))
    // rows preserved exactly
    assert(Snapshots.read(spark, root, Some(2L))
      .select("a", "b", "payload").orderBy("payload")
      .as[(Long, Long, Long)].collect().toSeq ===
      rows.orderBy("payload").as[(Long, Long, Long)].collect().toSeq)
    // strip skip set + manifest stats prune STRICTLY for a box on `a`
    val strips = graft.ops.Layout.zStripsN(Seq((0L, 15L), (0L, 63L)), 6, 4)
    val stats = Snapshots.zoneMap(spark, root, Seq("zstrip"))
    val survivors = graft.ops.Layout.zonePruneIn(stats, "zstrip", strips)
    val total = Snapshots.snapshot(root, 2L).files.size
    assert(survivors.nonEmpty && survivors.size < total,
      s"expected a strict prune, got ${survivors.size} of $total files")
    val got = spark.read.parquet(survivors: _*)
      .where(col("a") < 16).agg(count(lit(1))).collect()(0).getLong(0)
    assert(got === rows.where(col("a") < 16).count())
    // a concurrent commit surfaces as a conflict, never a lost rewrite
    intercept[java.util.ConcurrentModificationException] {
      graft.ops.Layout.zorderCommitN(root,
        Snapshots.read(spark, root, Some(2L)).drop("zval", "zstrip"),
        Seq("a", "b"), 6, 4, basedOn = Some(v1))
    }
  }

  // ---- streaming source over the snapshot format ------------------------------

  test("snapshot change stream: commits consumed exactly once across a restart; replace breaks the stream loudly") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    val base = java.nio.file.Files.createTempDirectory("graft_snapsrc").toString
    val stage = s"$base/stage"
    def runOnce(): Unit = {
      val q = graft.streaming.StreamOps.snapshotSource(spark, stage,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType))))
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .format("parquet")
        .option("path", s"$base/sink")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sink(): Seq[Long] = spark.read.schema("id BIGINT")
      .parquet(s"$base/sink").as[Long].collect().sorted.toSeq
    Snapshots.commit(root, spark.range(0, 5).toDF(), "c1"): Unit
    graft.streaming.StreamOps.syncSnapshotSource(root, stage): Unit
    runOnce() // phase 1: only commit 1's rows
    assert(sink() === (0L until 5L))
    // consumer down; the table moves on
    Snapshots.commit(root, spark.range(5, 8).toDF(), "c2"): Unit
    Snapshots.commit(root, spark.range(8, 10).toDF(), "c3"): Unit
    graft.streaming.StreamOps.syncSnapshotSource(root, stage): Unit
    runOnce() // restart: NEW query, SAME checkpoint — no re-emission
    assert(sink() === (0L until 10L),
      "resume must append exactly the new commits, never re-emit")
    // sync is idempotent: nothing new → nothing staged twice
    graft.streaming.StreamOps.syncSnapshotSource(root, stage): Unit
    runOnce()
    assert(sink() === (0L until 10L))
    // a replace commit drops consumed files: the next sync must refuse
    Snapshots.commit(root, spark.range(100, 103).toDF(), "rewrite",
      replace = true): Unit
    intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.syncSnapshotSource(root, stage)
    }
  }

  test("vacuumRetain: time-based retention keeps versions inside the window, always the head") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 3).toDF(), "old"): Unit
    Thread.sleep(60)
    Snapshots.commit(root, spark.range(3, 6).toDF(), "recent"): Unit
    // a window covering only the second commit drops the first
    Snapshots.vacuumRetain(root, retainMillis = 40, minAgeMillis = 0): Unit
    assert(Snapshots.versions(root) === Seq(2L))
    assert(ids(root) === (0L until 6L)) // v2 (an append) still composes both
    // a zero window on a quiet table keeps the head regardless
    Thread.sleep(30)
    Snapshots.vacuumRetain(root, retainMillis = 1, minAgeMillis = 0): Unit
    assert(Snapshots.versions(root) === Seq(2L))
  }

  test("vacuum reclaims unreferenced segments and leaked staging temps, sparing young ones") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 5).toDF(), "base"): Unit
    Snapshots.commit(root, spark.range(100, 103).toDF(), "rewrite",
      replace = true): Unit
    // a crash between createTempFile and the post-link delete leaks this
    val leak = java.nio.file.Paths.get(root, "_graft_snaps", ".stage_leak.tmp")
    java.nio.file.Files.write(leak, "orphan".getBytes("UTF-8"))
    def segCount() = new java.io.File(root, "_graft_snaps").listFiles()
      .count(_.getName.startsWith("seg_"))
    assert(segCount() === 2)
    // young guard: nothing reclaimed at default min age
    Snapshots.vacuum(root, keepVersions = 1): Unit
    assert(segCount() === 2 && java.nio.file.Files.exists(leak))
    // ripe: v1's manifest drops, its segment is unreferenced, the leak goes
    Snapshots.vacuum(root, keepVersions = 1, minAgeMillis = 0): Unit
    assert(segCount() === 1, "only the retained version's segment remains")
    assert(!java.nio.file.Files.exists(leak))
    assert(ids(root) === (100L until 103L))
  }

  test("updateWhere composes with rename/drop rules: SET and WHERE compile against the CURRENT names, no compaction needed") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("k", "old_v"), "base"): Unit
    Snapshots.renameColumn(root, "old_v", "v"): Unit
    // UPDATE right after the rename — pre-rule files still carry `old_v`
    // on disk; the DML scan applies the rule so `v` resolves everywhere
    Snapshots.updateWhere(spark, root, col("v") >= 20.0,
      Map("v" -> (col("v") + 1.0))): Unit
    assert(Snapshots.readMerged(spark, root, "k").orderBy("k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 21.0), (3L, 31.0)))
    // the rewritten rows materialized the CURRENT shape (their files
    // postdate the rule, so the rule never touches them)
    val head = Snapshots.snapshot(root, Snapshots.latestVersion(root).get)
    assert(head.rules.nonEmpty, "the rule chain is still live (no rewrite)")
    // a SET naming a column that doesn't exist is a typo — loud
    intercept[IllegalArgumentException] {
      Snapshots.updateWhere(spark, root, col("k") === 1L,
        Map("old_v" -> lit(0.0)))
    }
    // OPTIMIZE also works under live rules and retires them
    Snapshots.compactMerged(spark, root, "k"): Unit
    Snapshots.optimizeFiles(spark, root, Seq("k"), targetBytes = 1L << 20): Unit
    val optimized = Snapshots.snapshot(root, Snapshots.latestVersion(root).get)
    assert(optimized.rules.isEmpty, "the replace commit resets the rules")
    assert(Snapshots.read(spark, root).orderBy("k")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 21.0), (3L, 31.0)))
  }

  test("checkpoint collapses the ref chain to ONE segment; reads, MOR state, stats and rules replay identically") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    (0 until 6).foreach { i =>
      Snapshots.commit(root, spark.range(i * 10L, i * 10L + 10).toDF(),
        s"a$i", statsCols = Seq("id")): Unit
    }
    Snapshots.renameColumn(root, "id", "key"): Unit                 // v7
    Snapshots.commitChanges(root,
      upserts = Seq(Tuple1(3L)).toDF("key"),
      deleteKeys = Seq(Tuple1(11L)).toDF("key"), "key", "chg"): Unit // v8
    def refs(v: Long) = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, "_graft_snaps", f"v$v%08d.txt")), "UTF-8")
      .linesIterator.count(_.startsWith("segment="))
    // 6 appends + 1 change commit = 7 segments (the rename is
    // metadata-only: a header rule, no segment)
    assert(refs(8L) === 7, "pre-checkpoint: one ref per entry-bearing commit")
    val before = Snapshots.readMerged(spark, root, "key")
      .as[Long].collect().sorted.toSeq
    val cp = Snapshots.checkpoint(root)                             // v9
    assert(refs(cp) === 1, "the checkpoint manifest holds ONE ref")
    // state replays identically: entries, seqs, tombstones, rules, stats
    assert(Snapshots.readMerged(spark, root, "key")
      .as[Long].collect().sorted.toSeq === before)
    val snap = Snapshots.snapshot(root, cp)
    assert(snap.rules.nonEmpty, "rules carry through the checkpoint")
    assert(snap.files.map(_.seq).distinct.size >= 6,
      "original commit seqs are preserved verbatim")
    assert(snap.files.forall(f => f.seq > 6L || f.stats.nonEmpty),
      "manifest-embedded stats survive consolidation")
    // the chain RESTARTS: the next commit references checkpoint + own
    Snapshots.commitChanges(root, upserts = Seq(Tuple1(100L)).toDF("key"),
      deleteKeys = spark.emptyDataset[Long].toDF("key"), "key", "more"): Unit
    assert(refs(cp + 1) === 2, "post-checkpoint commits chain from ONE ref")
    assert(Snapshots.readMerged(spark, root, "key")
      .as[Long].collect().sorted.toSeq === (before :+ 100L).sorted)
    // pinned pre-checkpoint versions are untouched; history spans all
    assert(Snapshots.read(spark, root, Some(1L)).count() === 10L)
    assert(Snapshots.history(spark, root).count() === (cp + 1).toInt)
  }

  test("updateWhere on an additively-evolved table preserves the newer column (mergeSchema scan, never one footer's shape)") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, Seq((1L, 10.0)).toDF("k", "v"), "narrow"): Unit
    Snapshots.commit(root, Seq((2L, 20.0, "keep")).toDF("k", "v", "w"),
      "wide"): Unit
    // the UPDATE matches the WIDE row: its rewrite must carry w through
    // (a single-footer scan could adopt the narrow shape and silently
    // destroy w while the tombstone kills the original)
    Snapshots.updateWhere(spark, root, col("k") === 2L,
      Map("v" -> lit(21.0))): Unit
    val got = Snapshots.readMerged(spark, root, "k")
      .orderBy("k").select("k", "v", "w")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(got === Seq((1L, 10.0, None), (2L, 21.0, Some("keep"))))
    // optimizeFiles materializes the UNION schema for the same reason
    Snapshots.compactMerged(spark, root, "k"): Unit
    Snapshots.optimizeFiles(spark, root, Seq("k"), 1L << 20): Unit
    assert(Snapshots.read(spark, root).columns.toSet === Set("k", "v", "w"))
  }

  test("changeFeed position leg excludes rows already dead under PRE-window equality tombstones") {
    val ss = spark; import ss.implicits._
    val root = freshTable()
    Snapshots.commit(root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "base"): Unit                                               // v1
    Snapshots.commitChanges(root,
      upserts = spark.emptyDataset[(Long, String)].toDF("k", "v"),
      deleteKeys = Seq(Tuple1(1L)).toDF("k"), "k", "eqdel"): Unit // v2
    // a blanket DELETE WHERE re-matches the eq-dead raw row of k=1
    Snapshots.deleteWhere(spark, root, lit(true)): Unit           // v3
    val feed = Snapshots.changeFeed(spark, root, 2L, 3L, "k")
      .select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(feed === Seq((2L, "delete", 3L)),
      "k=1 was dead at window start — feeding its delete again would " +
        "make a CDC consumer delete twice")
  }

  test("manifest entries embed file sizes: planning and OPTIMIZE sizing need zero per-file stat calls") {
    val root = freshTable()
    Snapshots.commit(root, spark.range(0, 1000).toDF().repartition(3),
      "base"): Unit
    val snap = Snapshots.snapshot(root, 1L)
    snap.files.foreach { e =>
      assert(e.bytes === new java.io.File(root, e.path).length(),
        s"embedded size must equal the real file size for ${e.path}")
    }
    // sizes survive the manifest text round trip alongside stats
    Snapshots.commit(root, spark.range(1000, 1010).toDF().coalesce(1),
      "stats-append", statsCols = Seq("id")): Unit
    val both = Snapshots.snapshot(root, 2L).files.filter(_.seq == 2L)
    assert(both.nonEmpty && both.forall(e =>
      e.bytes > 0 && e.stats.contains("id")))
    // OPTIMIZE sizes its output from the embedded bytes (fallback stat
    // only for pre-size entries — covered by the legacy-manifest test,
    // whose hand-written entries parse with bytes = -1)
    Snapshots.optimizeFiles(spark, root, Seq("id"), targetBytes = 1L << 20): Unit
    assert(Snapshots.read(spark, root).count() === 1010L)
  }

  test("checkpointIfDeep: no-op below the ref threshold, collapses at it — safe to call after every commit batch") {
    val root = freshTable()
    (0 until 3).foreach { i =>
      Snapshots.commit(root, spark.range(i * 5L, i * 5L + 5).toDF(),
        s"a$i"): Unit
    }
    assert(Snapshots.checkpointIfDeep(root, maxRefs = 4).isEmpty)
    Snapshots.commit(root, spark.range(100, 105).toDF(), "a3"): Unit
    val cp = Snapshots.checkpointIfDeep(root, maxRefs = 4)
    assert(cp === Some(5L))
    assert(Snapshots.checkpointIfDeep(root, maxRefs = 4).isEmpty,
      "idempotent: the fresh checkpoint's chain is length 1")
    assert(Snapshots.countRows(root) === Some(20L))
  }

  test("commit notes must be single-line: a newline could inject manifest header lines") {
    val root = freshTable()
    intercept[IllegalArgumentException] {
      Snapshots.commit(root, spark.range(0, 1).toDF(),
        "load\nsegment=_graft_snaps/seg_evil.txt")
    }
    assert(Snapshots.versions(root).isEmpty, "the refused commit left no version")
  }

  test("statsCols names are whitelisted: anything that could split a manifest line is rejected at commit") {
    val root = freshTable()
    Seq("a|b", "a:b", "a;b", "a\nb", "a=b", "a b", "").foreach { bad =>
      intercept[IllegalArgumentException] {
        Snapshots.commit(root, spark.range(0, 1).toDF(), "x",
          statsCols = Seq(bad))
      }
    }
  }
}
