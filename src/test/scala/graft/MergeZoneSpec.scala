package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Layout, Reconcile}

/** The lakehouse WRITE-path completions: MERGE INTO (CDC collapse +
  * apply + partition-pruned copy-on-write execution) and the generic
  * min/max zone map (per-file stats on non-partition columns, built from
  * data or from parquet footers alone, consumed as planning-time file
  * pruning).
  */
class MergeZoneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-merge-zone-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- CDC merge -----------------------------------------------------------

  test("cdcLatest keeps exactly the highest-sequence change per key, tiebreak deterministic") {
    val ss = spark; import ss.implicits._
    val chg = Seq(
      (1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"),
      (2L, 7L, "x"),
      (3L, 5L, "t1"), (3L, 5L, "t2") // equal seq: tiebreak decides
    ).toDF("k", "seq", "v")
    val got = Reconcile.cdcLatest(chg, "k", "seq", col("v").desc)
      .orderBy("k").as[(Long, Long, String)].collect()
    assert(got.toSeq === Seq((1L, 3L, "c"), (2L, 7L, "x"), (3L, 5L, "t2")))
  }

  test("mergeApply: upserts replace, inserts add, deletes drop, untouched rows pass through") {
    val ss = spark; import ss.implicits._
    val target = Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
      .toDF("k", "name", "x")
    val changes = Seq(
      (2L, "TWO", 22.0, "upsert"),   // replace
      (4L, "four", 40.0, "upsert"),  // insert (absent key)
      (3L, "dead", 0.0, "delete"))   // delete
      .toDF("k", "name", "x", "op")
    val got = Reconcile.mergeApply(target, changes, "k", "op")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(got.toSeq === Seq((1L, "one", 10.0), (2L, "TWO", 22.0), (4L, "four", 40.0)))
  }

  test("mergeTouched rewrites ONLY touched partitions; untouched files byte-identical; all-deleted partition dir removed") {
    val ss = spark; import ss.implicits._
    val dir = tmp("graft_mt")
    // 4 buckets; bucket 3 holds a single row that the batch deletes
    val target = Seq(
      (0L, 0L, 1.0), (4L, 0L, 2.0),
      (1L, 1L, 3.0), (5L, 1L, 4.0),
      (2L, 2L, 5.0), (6L, 2L, 6.0),
      (3L, 3L, 7.0)).toDF("k", "bucket", "x")
    target.write.mode("overwrite").partitionBy("bucket").parquet(dir)

    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val cs = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        cs.filter(c => c.isFile && c.getName.endsWith(".parquet")) ++
          cs.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(dir))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = fileState()

    val changes = Seq(
      (1L, 1L, 33.0, "upsert"),  // replace in bucket 1
      (9L, 1L, 99.0, "upsert"),  // insert into bucket 1
      (3L, 3L, 0.0, "delete"))   // bucket 3 becomes empty
      .toDF("k", "bucket", "x", "op")
    val touched = Reconcile.mergeTouched(spark, dir, changes, "k", "op", "bucket")
    assert(touched.toSet === Set(1L, 3L))

    // semantics: equal to the declarative merge over the whole table
    val got = spark.read.parquet(dir)
      .select(col("k"), col("bucket").cast("long").as("bucket"), col("x"))
      .orderBy("k").as[(Long, Long, Double)].collect()
    assert(got.toSeq === Seq(
      (0L, 0L, 1.0), (1L, 1L, 33.0), (2L, 2L, 5.0),
      (4L, 0L, 2.0), (5L, 1L, 4.0), (6L, 2L, 6.0), (9L, 1L, 99.0)))

    // untouched partitions (0, 2) keep their EXACT files — same paths,
    // sizes and mtimes; touched bucket 1 was rewritten; bucket 3 is gone
    val after = fileState()
    val untouchedBefore = before.filter { case (p, _) =>
      p.contains("bucket=0") || p.contains("bucket=2") }
    assert(untouchedBefore.nonEmpty)
    untouchedBefore.foreach { case (p, st) => assert(after.get(p).contains(st),
      s"untouched file changed: $p") }
    assert(!new java.io.File(dir, "bucket=3").exists(),
      "all-deleted partition directory must be removed")
    assert(before.keys.filter(_.contains("bucket=1"))
      .forall(p => !after.contains(p)), "touched partition must be rewritten")
  }

  test("mergeTouched is idempotent: re-applying the same batch is a no-op on row content") {
    val ss = spark; import ss.implicits._
    val dir = tmp("graft_mt_idem")
    Seq((0L, 0L, 1.0), (1L, 1L, 2.0), (2L, 0L, 3.0))
      .toDF("k", "bucket", "x")
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val changes = Seq((1L, 1L, 20.0, "upsert"), (2L, 0L, 0.0, "delete"))
      .toDF("k", "bucket", "x", "op")
    Reconcile.mergeTouched(spark, dir, changes, "k", "op", "bucket"): Unit
    val once = spark.read.parquet(dir).select("k", "x")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    Reconcile.mergeTouched(spark, dir, changes, "k", "op", "bucket"): Unit
    val twice = spark.read.parquet(dir).select("k", "x")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(once === Seq((0L, 1.0), (1L, 20.0)))
    assert(twice === once)
  }

  // ---- zone maps -----------------------------------------------------------

  private def writeRangeLayout(dir: String, nFiles: Int): Unit =
    spark.range(0, 10000)
      .select(col("id"), (col("id") % 97).as("payload"),
        col("id").cast("double").as("d"))
      .repartitionByRange(nFiles, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(dir)

  test("zoneMapFooters equals the data-pass zoneMap (per-file n_rows/min/max), no data pages read") {
    val dir = tmp("graft_zm")
    writeRangeLayout(dir, 8)
    val fromData = Layout.zoneMap(
      spark.read.parquet(dir), Seq("id", "d"))
      .select(col("file"), col("n_rows"),
        col("min_id").cast("double"), col("max_id").cast("double"),
        col("min_d"), col("max_d"))
      .collect().map(r => (r.getString(0).replaceFirst("^file:/*", "/"),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val fromFooters = Layout.zoneMapFooters(spark, dir, Seq("id", "d"))
      .collect().map(r => (r.getString(0).replaceFirst("^file:/*", "/"),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(fromFooters.size === 8)
    assert(fromData.keySet === fromFooters.keySet)
    fromData.foreach { case (f, st) => assert(fromFooters(f) === st, f) }
  }

  test("zonePrune keeps exactly the intersecting files and the pruned scan equals the full scan") {
    val dir = tmp("graft_zp")
    writeRangeLayout(dir, 10) // ~file i covers [1000i, 1000(i+1))
    val stats = Layout.zoneMapFooters(spark, dir, Seq("id"))
    val all = stats.count()
    assert(all === 10)
    val survivors = Layout.zonePrune(stats, Seq(("id", 2500L, 4100L)))
    assert(survivors.size < all && survivors.size >= 2,
      s"expected a strict prune, got ${survivors.size} of $all")
    val pruned = spark.read.parquet(survivors: _*)
      .where(col("id") >= 2500 && col("id") <= 4100)
      .agg(count(lit(1)), sum(col("payload")), sum(col("d")))
      .collect()(0)
    val full = spark.read.parquet(dir)
      .where(col("id") >= 2500 && col("id") <= 4100)
      .agg(count(lit(1)), sum(col("payload")), sum(col("d")))
      .collect()(0)
    assert(pruned === full)
  }

  test("string zone maps: footer bounds prune a lexicographic window; decimal columns give NULL stats (kept)") {
    val dir = tmp("graft_zs")
    spark.range(0, 2600)
      .select(concat(lit("key_"), format_string("%04d", col("id"))).as("s"),
        col("id").cast("decimal(12,2)").as("dec"),
        col("id"))
      .repartitionByRange(4, col("s"))
      .sortWithinPartitions(col("s"))
      .write.mode("overwrite").parquet(dir)
    val stats = Layout.zoneMapFooters(spark, dir, Seq("dec"), Seq("s"))
    assert(stats.count() === 4)
    // decimal stats are deliberately NULL: physical min/max are the
    // UNSCALED integers, and pruning logical bounds against them would
    // drop matching files
    assert(stats.where(col("min_dec").isNotNull ||
      col("max_dec").isNotNull).count() === 0)
    assert(Layout.zonePrune(stats, Seq(("dec", 0, 1))).size === 4)
    // string window: a narrow lexicographic range hits ~1 of 4 files
    val survivors = Layout.zonePrune(stats,
      Seq(("s", "key_0700", "key_0800")))
    assert(survivors.size < 4 && survivors.nonEmpty)
    val pruned = spark.read.parquet(survivors: _*)
      .where(col("s") >= "key_0700" && col("s") <= "key_0800")
      .agg(count(lit(1)), sum(col("id"))).collect()(0)
    val full = spark.read.parquet(dir)
      .where(col("s") >= "key_0700" && col("s") <= "key_0800")
      .agg(count(lit(1)), sum(col("id"))).collect()(0)
    assert(pruned === full)
  }

  test("zonePrune treats NULL stats as unprunable (kept), and an empty predicate list keeps everything") {
    val ss = spark; import ss.implicits._
    val stats = Seq(
      ("f_low", 10L, Some(0.0), Some(9.0)),
      ("f_hit", 10L, Some(50.0), Some(60.0)),
      ("f_null", 10L, None, None))
      .toDF("file", "n_rows", "min_x", "max_x")
    val got = Layout.zonePrune(stats, Seq(("x", 55, 100)))
    assert(got.toSet === Set("f_hit", "f_null"))
    assert(Layout.zonePrune(stats, Seq.empty).toSet ===
      Set("f_low", "f_hit", "f_null"))
  }

  test("row-group zone map: per-group stats prune INSIDE one file; the ranged read equals the full scan") {
    val ss = spark; import ss.implicits._
    val dir = tmp("graft_zrg")
    // ONE sorted file with many small row groups — the layout where
    // file-level pruning is powerless and group-level skipping is the
    // whole game
    spark.range(0, 200000).toDF("id")
      .withColumn("v", col("id") * 2)
      .orderBy("id").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", "65536").parquet(dir)
    val stats = Layout.zoneMapRowGroupsIn(spark, dir, Seq("id"))
    val nGroups = stats.count()
    assert(stats.select("file").distinct().count() === 1)
    assert(nGroups > 3, s"need multiple row groups, got $nGroups")
    // stats cover the file exactly: group row counts sum to the table
    assert(stats.agg(sum("n_rows")).collect()(0).getLong(0) === 200000L)
    val surv = Layout.zonePruneRowGroups(stats, Seq(("id", 50000L, 60000L)))
    assert(surv.nonEmpty && surv.size < nGroups,
      s"expected a strict prune, got ${surv.size} of $nGroups groups")
    import org.apache.spark.sql.types._
    val got = Layout.readRowGroups(spark, surv, StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))))
      .where(col("id").between(50000L, 60000L))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === (50000L to 60000L).map(k => (k, k * 2)))
    // file-level pruning cannot skip anything here
    val fileStats = Layout.zoneMapFooters(spark, dir, Seq("id"))
    assert(Layout.zonePrune(fileStats, Seq(("id", 50000L, 60000L))).size === 1)
  }

  test("bloom pruning: definitely-absent files skipped on a hash layout where zones are powerless; bloom-less files kept") {
    val ss = spark; import ss.implicits._
    val dir = tmp("graft_bloom")
    // hash-bucketed: every file spans the whole id domain — min/max
    // zones keep everything; blooms are the only skip channel
    spark.range(0, 200000).toDF("id")
      .repartition(8, col("id"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#id", "true")
      .option("parquet.bloom.filter.expected.ndv#id", "200000")
      .parquet(dir)
    val files = Layout.zoneMapFooters(spark, dir, Seq.empty)
      .select("file").as[String].collect().toSeq
    assert(files.size === 8)
    // zones indeed powerless on this layout
    assert(Layout.zonePrune(Layout.zoneMapFooters(spark, dir, Seq("id")),
      Seq(("id", 777L, 777L))).size === 8)
    val keys = Seq(777L, 123456L)
    val survivors = Layout.bloomPrune(spark, files, "id", keys)
    assert(survivors.nonEmpty && survivors.size < 8,
      s"expected a strict bloom prune, got ${survivors.size} of 8")
    val got = spark.read.parquet(survivors: _*)
      .where(col("id").isin(keys: _*))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === keys.sorted, "the bloom path must lose no rows")
    // a value present nowhere prunes everything except false positives;
    // the read over whatever survives is still exactly empty
    val none = Layout.bloomPrune(spark, files, "id", Seq(99999999L))
    if (none.nonEmpty)
      assert(spark.read.parquet(none: _*)
        .where(col("id") === 99999999L).count() === 0)
    // a bloom-less write cannot prune — conservatively ALL kept
    val plain = tmp("graft_bloomless")
    spark.range(0, 1000).toDF("id").repartition(4)
      .write.mode("overwrite").parquet(plain)
    val pf = Layout.zoneMapFooters(spark, plain, Seq.empty)
      .select("file").as[String].collect().toSeq
    assert(Layout.bloomPrune(spark, pf, "id", Seq(5L)).size === pf.size)
  }

  test("int64 footer stats above 2^53 widen conservatively: min never raised, max never lowered") {
    val ss = spark; import ss.implicits._
    // 2^60-63 rounds UP to 2^60 (raising a min), 2^60+1 rounds DOWN to
    // 2^60 (lowering a max) — the two lossy directions a skip index must
    // widen, never tighten (snowflake ids / nanosecond timestamps live
    // out here)
    val lo = (1L << 60) - 63
    val hi = (1L << 60) + 1
    val dir = tmp("graft_zint64")
    Seq(lo, hi).toDF("c").coalesce(1).write.mode("overwrite").parquet(dir)
    val stats = Layout.zoneMapFooters(spark, dir, Seq("c")).collect()
    assert(stats.length === 1)
    val mn = BigDecimal(stats(0).getAs[Double]("min_c"))
    val mx = BigDecimal(stats(0).getAs[Double]("max_c"))
    assert(mn <= BigDecimal(lo), s"min stat $mn must not exceed true min $lo")
    assert(mx >= BigDecimal(hi), s"max stat $mx must not undercut true max $hi")
    // in-range longs stay EXACT (no widening tax on normal tables)
    val dir2 = tmp("graft_zint64b")
    Seq(100L, 2000L).toDF("c").coalesce(1).write.mode("overwrite").parquet(dir2)
    val s2 = Layout.zoneMapFooters(spark, dir2, Seq("c")).collect()(0)
    assert(s2.getAs[Double]("min_c") === 100.0)
    assert(s2.getAs[Double]("max_c") === 2000.0)
  }

  test("mergeTouched removes all-deleted partition dirs through Spark's path escaping (special chars, null)") {
    val ss = spark; import ss.implicits._
    val dir = tmp("graft_mt_escape")
    // partition values Spark escapes on disk: ':' URL-encodes, null lands
    // in __HIVE_DEFAULT_PARTITION__ — the raw s"$partCol=$p" path misses
    // both and the "deleted" rows would resurface on the next read
    val target = Seq(
      (1L, "a:b", 10.0), (2L, "a:b", 20.0),
      (3L, null.asInstanceOf[String], 30.0),
      (4L, "plain", 40.0))
      .toDF("k", "p", "x")
    target.write.mode("overwrite").partitionBy("p").parquet(dir)
    val changes = Seq(
      (1L, "a:b", 0.0, "delete"), (2L, "a:b", 0.0, "delete"),
      (3L, null.asInstanceOf[String], 0.0, "delete"))
      .toDF("k", "p", "x", "op")
    Reconcile.mergeTouched(spark, dir, changes, "k", "op", "p"): Unit
    val back = spark.read.parquet(dir).select("k").as[Long].collect().toSeq
    assert(back === Seq(4L), "deleted partitions must not resurface")
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs === Set("p=plain"),
      s"stale escaped/null partition dirs must be removed, got $dirs")
  }
}
