package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{RangeJoin, Sketches, Stats, TextStats}

/** Sketch aggregates (HLL distinct, count-min frequency), the bucketed
  * range join vs its naive BETWEEN reference, and the stratified /
  * repetition text operators added in round 4.
  */
class SketchRangeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-sketch-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      // events reader prerequisite - see Tables.NanosAsLongConf
      .config(graft.ops.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("hllDistinct: estimate within 3 standard errors of exact, exact column exact") {
    val sp = spark; import sp.implicits._
    // two keys with very different cardinalities
    val df = (1 to 2000).map(i => ("big", i.toLong)) ++
      (1 to 50).flatMap(i => Seq.fill(4)(("small", i.toLong)))
    val out = Sketches.hllDistinct(df.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("big")._1 == 2000L)
    assert(out("small")._1 == 50L)
    // m=64 → standard error ~1.04/sqrt(64) = 13%; allow 3σ
    val (_, estBig) = out("big")
    assert(math.abs(estBig - 2000.0) / 2000.0 < 0.39, s"estBig=$estBig")
    // small range hits the linear-counting correction — tighter than raw
    val (_, estSmall) = out("small")
    assert(math.abs(estSmall - 50.0) / 50.0 < 0.35, s"estSmall=$estSmall")
  }

  test("hllDistinct is insensitive to duplication factor and row order") {
    val sp = spark; import sp.implicits._
    val once = (1 to 300).map(i => ("k", i.toLong))
    val dup = scala.util.Random.shuffle(once ++ once ++ once)
    val a = Sketches.hllDistinct(once.toDF("k", "v"), "k", "v").collect().head.getDouble(2)
    val b = Sketches.hllDistinct(dup.toDF("k", "v"), "k", "v").collect().head.getDouble(2)
    assert(a == b)
  }

  test("hllMergeDistinct: sliced-then-merged estimate equals the direct one") {
    val sp = spark; import sp.implicits._
    // values scattered across 7 slices, some present in several slices
    val df = (1 to 900).map(i => ("k", s"slice${i % 7}", (i % 400).toLong))
      .toDF("k", "slice", "v")
    val direct = Sketches.hllDistinct(df, "k", "v")
      .collect().head
    val merged = Sketches.hllMergeDistinct(df, "k", "slice", "v")
      .collect().head
    assert(merged.getLong(1) == 7L)                        // n_slices
    assert(merged.getLong(2) == direct.getLong(1))         // exact
    assert(merged.getDouble(3) == direct.getDouble(2),     // estimate ==
      s"merged=${merged.getDouble(3)} direct=${direct.getDouble(2)}")
  }

  test("cmsFrequency: never undercounts, exact for most probes, 0-truth for absent") {
    val sp = spark; import sp.implicits._
    val items = Seq.fill(100)("alpha") ++ Seq.fill(10)("beta") ++
      (1 to 200).map(i => s"noise$i")
    val out = Sketches.cmsFrequency(items.toDF("item"), "item",
        Seq("alpha", "beta", "absent"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { case (t, (est, truth)) =>
      assert(est >= truth, s"$t: CMS undercounted $est < $truth")
    }
    assert(out("alpha")._2 == 100L)
    assert(out("beta")._2 == 10L)
    assert(out("absent")._2 == 0L)
  }

  test("bloom filter: no false negatives; misses are definite") {
    val sp = spark; import sp.implicits._
    val base = (1 to 200).map(i => s"key$i").toDF("k")
    val bloom = Sketches.bloomBuild(base, "k")
    // every base key must probe as maybe (no false negatives)
    val baseProbe = Sketches.bloomProbe(bloom,
        base.withColumn("id", col("k")), "id", "k")
      .collect().map(_.getLong(1))
    assert(baseProbe.forall(_ == 1L))
    // fresh keys: mostly definite misses at this fill factor, and any
    // maybe is a (rare) false positive — never the other way around
    val fresh = (1 to 200).map(i => s"other$i").toDF("k")
    val freshMaybe = Sketches.bloomProbe(bloom,
        fresh.withColumn("id", col("k")), "id", "k")
      .collect().count(_.getLong(1) == 1L)
    assert(freshMaybe < 100, s"false-positive rate implausible: $freshMaybe/200")
  }

  test("range join: bucketed equi-join equals the naive BETWEEN join") {
    val sp = spark; import sp.implicits._
    val iv = Seq(
      (1L, "2020-01-01 12:00:00", "2020-01-03 06:00:00"), // spans 3 days
      (2L, "2020-01-02 00:00:00", "2020-01-02 00:00:00"), // instant
      (3L, "2020-03-01 00:00:00", "2020-03-10 00:00:00")  // no points
    ).toDF("interval_id", "lo_s", "hi_s")
      .select(col("interval_id"), to_timestamp(col("lo_s")).as("lo"),
        to_timestamp(col("hi_s")).as("hi"))
    val pts = Seq(
      (10L, "2020-01-01 11:59:59"), // before iv1
      (11L, "2020-01-01 12:00:00"), // on iv1.lo (inclusive)
      (12L, "2020-01-02 00:00:00"), // inside iv1, == iv2 both bounds
      (13L, "2020-01-03 06:00:00"), // on iv1.hi (inclusive)
      (14L, "2020-01-03 06:00:01")  // past iv1
    ).toDF("pt_id", "ts_s")
      .select(col("pt_id"), to_timestamp(col("ts_s")).as("ts"))
    val got = RangeJoin.pointInInterval(pts, iv, "ts", "lo", "hi")
      .select(col("pt_id"), col("interval_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(iv, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select(col("pt_id"), col("interval_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got == Set((11L, 1L), (12L, 1L), (12L, 2L), (13L, 1L)))
  }

  test("range join: two-level rollup equals join-then-aggregate, mid-day bounds") {
    val sp = spark; import sp.implicits._
    // intervals with mid-day lo/hi (boundary days NOT fully contained),
    // a single-day interval, a two-day one (no interior), and a long one
    val iv = Seq(
      (1L, "2020-01-01 12:00:00", "2020-01-06 06:00:00"), // 4 interior days
      (2L, "2020-01-03 08:00:00", "2020-01-03 18:00:00"), // single day
      (3L, "2020-01-04 23:00:00", "2020-01-05 01:00:00"), // two days, no interior
      (4L, "2020-02-01 00:00:00", "2020-02-09 00:00:00")  // no points
    ).toDF("interval_id", "lo_s", "hi_s")
      .select(col("interval_id"), to_timestamp(col("lo_s")).as("lo"),
        to_timestamp(col("hi_s")).as("hi"))
    // points every 5 hours over 8 days, value = hour index
    val pts = sp.range(40).select(
      (to_timestamp(lit("2020-01-01 00:00:00")) +
        expr("make_dt_interval(0, cast(id * 5 as int))")).as("ts"),
      col("id").cast("decimal(18,2)").as("v"))
    val expected = RangeJoin.pointInInterval(pts, iv, "ts", "lo", "hi")
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_items"), sum(col("v")).as("val_sum"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDecimal(2).doubleValue()))).toMap
    val got = RangeJoin.countSumByInterval(pts, iv, "ts", "lo", "hi", col("v"))
      .select(col("interval_id"), col("n_items"), col("val_sum"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDecimal(2).doubleValue()))).toMap
    assert(got == expected)
    assert(got.contains(1L) && got.contains(2L) && got.contains(3L))
    assert(!got.contains(4L)) // pointless interval absent on both paths
  }

  test("invertedIndex: exact df, postings capped and ascending, minDf honored") {
    val sp = spark; import sp.implicits._
    // "common" in every doc (df=30, capped postings), "rare" in 2 (below minDf)
    val docs = (1L to 30L).map { i =>
      (i, if (i <= 2) "common rare word" + i else "common word" + i)
    }.toDF("doc_id", "text")
    val out = TextStats.invertedIndex(docs, minDf = 3, maxPostings = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("common") == (30L, "1,2,3,4,5")) // exact df, capped ascending
    assert(!out.contains("rare"))               // df=2 < minDf=3
    assert(!out.exists(_._1.startsWith("word"))) // each word<i> is df=1
  }

  test("corrMatrix: perfectly correlated, anti-correlated, and self-checked pairs") {
    val sp = spark; import sp.implicits._
    val df = (1 to 200).map { i =>
      (i.toDouble, 2.0 * i + 5.0, 100.0 - i.toDouble, (i % 7).toDouble)
    }.toDF("x", "y", "z", "w")
    val out = Stats.corrMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("x", "y")) == 1.0)   // exact linear
    assert(out(("x", "z")) == -1.0)  // exact inverse
    assert(out(("y", "z")) == -1.0)
    assert(math.abs(out(("x", "w"))) < 0.1) // near-independent
    assert(out.size == 6)
  }

  test("repetition: degenerate loop scores high, varied text scores 0") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "one two three four five six seven eight"),
      (3L, "too short")).toDF("doc_id", "text")
    val out = TextStats.repetition(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L)._2 > 0.8) // 6 identical shingles of 6 → 1 - 1/6
    assert(out(2L)._2 == 0.0)
    assert(out(3L)._1 == 0L && out(3L)._2 == 0.0) // <n tokens → no shingles
  }

  test("stratifiedSample: deterministic, per-stratum rates honored") {
    val sp = spark; import sp.implicits._
    val df = (1 to 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "zz"))
      .toDF("id", "lang")
    def run() = TextStats.stratifiedSample(df, "lang", "id", "s",
      Seq("en" -> 50), 5).collect().map(_.getLong(0)).toSet
    val a = run()
    assert(a == run()) // pure function of key
    val langs = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val en = a.count(id => langs(id) == "en").toDouble / 2000
    val zz = a.count(id => langs(id) == "zz").toDouble / 2000
    assert(math.abs(en - 0.5) < 0.06, s"en rate $en")
    assert(math.abs(zz - 0.05) < 0.03, s"zz rate $zz")
  }

  test("kmeansStep: k=1 gives the global per-dim mean; cells partition the corpus") {
    val sp = spark; import sp.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)), (3L, Seq(5.0f, 10.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val one = graft.ops.Similarity.kmeansStep(df, 1)
      .orderBy(col("dim")).collect()
    assert(one.length == 2)
    assert(one(0).getLong(2) == 3L && one(1).getLong(2) == 3L)
    assert(one(0).getDouble(3) == 3.0) // (1+3+5)/3
    assert(one(1).getDouble(3) == 6.0) // (2+6+10)/3
    val two = graft.ops.Similarity.kmeansStep(df, 2).collect()
    // every cell×dim row carries that cell's member count; cells partition
    val perCell = two.groupBy(_.getLong(0)).map { case (_, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length == 1)
      rs.head.getLong(2)
    }
    assert(perCell.sum == 3L)
  }

  test("kmeansTrain: round 1 equals kmeansStep; loop converges; no cached state") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    // two well-separated blobs → Lloyd converges in a handful of rounds
    val vecs = (0L until 60L).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i, Seq(base + rnd.nextFloat(), base + rnd.nextFloat()))
    }
    val df = vecs.toDF("vec_id", "embedding")
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val step = toMap(graft.ops.Similarity.kmeansStep(df, 4).collect())
    val (one, r1) = graft.ops.Similarity.kmeansTrainLoop(df, 4, 1)
    assert(r1 == 1 && toMap(one.collect()) == step,
      "maxIters=1 must reproduce kmeansStep bit-for-bit")
    // loop state is all driver-side: nothing may be left cached/checkpointed
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val (fin, rc) = graft.ops.Similarity.kmeansTrainLoop(df, 4, 50)
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore,
      "kmeansTrain must not leave cached RDDs behind")
    assert(rc < 50, s"two-blob Lloyd should converge well before 50 rounds, ran $rc")
    // the converged state is a fixed point: a longer budget stops at the
    // same round with the same means
    val (again, rc2) = graft.ops.Similarity.kmeansTrainLoop(df, 4, rc + 5)
    assert(rc2 == rc && toMap(again.collect()) == toMap(fin.collect()))
  }

  test("pqEncode: codes in range, codebook rows encode to themselves exactly") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(16)(rnd.nextFloat())))
    val df = vecs.toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.pqEncode(df, subs = 4, k = 8)
      .orderBy(col("vec_id")).collect()
    assert(out.length == 40)
    out.foreach { r =>
      (1 to 4).foreach(c => assert(r.getLong(c) >= 0 && r.getLong(c) < 8))
    }
    // a codebook member's distance to itself is 0 in every sub-space, so
    // its codes must be a codebook index consistently reachable — and two
    // identical vectors always get identical codes
    val dup = df.unionAll(df.where(col("vec_id") === 5).withColumn("vec_id", lit(99L)))
    val enc = graft.ops.Similarity.pqEncode(dup, subs = 4, k = 8)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(enc(5L) == enc(99L))
  }

  test("streaming hourly (availableNow, complete mode) equals the batch aggregate") {
    val d = "/root/testdata/sf0.001"
    val streamed = streaming.StreamOps.runToCompletion(spark,
        streaming.StreamOps.hourlyStatsStream(
          streaming.StreamOps.eventsStream(spark, d)))
      .orderBy(col("hour"), col("event_type")).collect()
    val batch = graft.ops.Events.hourlyStats(graft.ops.Tables.events(spark, d))
      .select(col("hour"), col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("hour"), col("event_type")).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getString(0) == b.getString(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(s.getDouble(3) == b.getDouble(3))
    }
  }

  test("streaming heavy hitters (misra_gries in the state store) equals the batch two-pass") {
    val d = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getLong(2))
    val streamed = streaming.StreamOps
      .streamHeavyHittersBySource(spark, d, k = 4096, minCount = 10)
      .orderBy(col("source"), col("cnt").desc, col("term"))
      .collect().map(key).toSeq
    val batch = TextStats
      .heavyHittersBySource(graft.ops.Tables.documents(spark, d), 4096, 10)
      .orderBy(col("source"), col("cnt").desc, col("term"))
      .collect().map(key).toSeq
    assert(streamed.nonEmpty, "parity test must exercise a non-empty result")
    assert(streamed == batch)
  }

  // a small k forces heavy decrement churn through the state-store merge
  // path; output stays exact because pass 2 re-counts (superset guarantee)
  test("streaming heavy hitters stays exact with a tiny sketch budget") {
    val d = "/root/testdata/sf0.001"
    val tiny = streaming.StreamOps
      .streamHeavyHittersBySource(spark, d, k = 64, minCount = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = TextStats
      .heavyHittersBySource(graft.ops.Tables.documents(spark, d), 64, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(tiny == batch)
  }
}
