package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{RangeJoin, Sketches}

/** Randomized invariants (seeded, 5 cases each) for the round-4
  * primitives: the count-min sketch can only overcount, the Bloom filter
  * has no false negatives, and the bucketed range join equals the naive
  * BETWEEN join on random interval/point sets with every interval
  * boundary included as a point (edge coverage).
  */
class SketchProps extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-sketch-props")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("CMS: estimate >= true count for every probe, random multisets") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(101)
    (1 to 5).foreach { _ =>
      val items = List.fill(80)(
        if (rnd.nextBoolean()) s"hot${rnd.nextInt(8)}" else s"cold${rnd.nextInt(500)}")
      val probes = items.distinct.take(5) :+ "never-seen"
      val out = Sketches.cmsFrequency(items.toDF("item"), "item", probes)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.length == probes.distinct.length)
      out.foreach { case (t, est, truth) =>
        assert(est >= truth, s"undercount for $t: $est < $truth")
        assert(truth == items.count(_ == t).toLong)
      }
    }
  }

  test("Bloom: every inserted key probes as maybe, random key sets") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(202)
    (1 to 5).foreach { _ =>
      val keys = List.fill(60)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString).distinct
      val df = keys.toDF("k")
      val bloom = Sketches.bloomBuild(df, "k")
      val probe = Sketches.bloomProbe(bloom, df.withColumn("id", col("k")), "id", "k")
      assert(probe.collect().forall(_.getLong(1) == 1L))
    }
  }

  test("range join: bucketed == naive BETWEEN on random intervals/points") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(303)
    val base = 1500000000L // 2017-07-14, epoch seconds
    (1 to 5).foreach { _ =>
      val ivs = List.fill(6) {
        val lo = base + (rnd.nextDouble() * 20 * 86400).toLong
        (lo, lo + (rnd.nextDouble() * 5 * 86400).toLong)
      }.distinct
      val pts = List.fill(40)(base + (rnd.nextDouble() * 26 * 86400).toLong)
      // every interval boundary is also a point: inclusive-edge coverage
      val allPts = (pts ++ ivs.flatMap(i => Seq(i._1, i._2))).distinct
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("interval_id", "lo_s", "hi_s")
        .select(col("interval_id"),
          timestamp_seconds(col("lo_s")).as("lo"),
          timestamp_seconds(col("hi_s")).as("hi"))
      val p = allPts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("pt_id", "ts_s")
        .select(col("pt_id"), timestamp_seconds(col("ts_s")).as("ts"))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select(col("pt_id"), col("interval_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bucketed = pairs(RangeJoin.pointInInterval(p, iv, "ts", "lo", "hi"))
      val naive = pairs(p.join(iv,
        col("ts") >= col("lo") && col("ts") <= col("hi")))
      assert(bucketed == naive)
    }
  }

  test("misra_gries: bounds bracket true counts; every > n/k item present; random skewed streams") {
    val sp = spark; import sp.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(303)
    (1 to 5).foreach { _ =>
      // Zipf-ish: a few hot items + a long cold tail, shuffled, multiple
      // partitions so the mergeable-summary path (serialize/merge/
      // truncate) is exercised, not just single-buffer updates.
      val k = 8 + rnd.nextInt(8)
      val items = rnd.shuffle(
        (0 until 4).flatMap(h => List.fill(100 + rnd.nextInt(100))(s"hot$h")) ++
          List.fill(300)(s"cold${rnd.nextInt(150)}"))
      val truth = items.groupBy(identity).map { case (it, xs) => it -> xs.size.toLong }
      val n = items.size.toLong
      val rows = items.toDF("item").repartition(4)
        .agg(expr(s"misra_gries(item, $k)").as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.item"), col("e.cnt"), col("e.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.length <= k)
      rows.foreach { case (item, cnt, err) =>
        val t = truth.getOrElse(item, 0L)
        assert(cnt <= t, s"$item: MG count $cnt must under-estimate true $t")
        assert(cnt + err >= t, s"$item: upper bound ${cnt + err} < true $t")
        // the mergeable-summaries decrement bound
        assert(err <= n / (k + 1) + 1, s"err $err exceeds n/(k+1) = ${n / (k + 1)}")
      }
      val present = rows.map(_._1).toSet
      truth.filter(_._2 > n / k).keys.foreach { hot =>
        assert(present(hot), s"guaranteed heavy hitter $hot (> ${n / k}) missing")
      }
    }
  }

  test("misra_gries under groupBy: per-group summaries keep per-group guarantees") {
    val sp = spark; import sp.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(505)
    // 3 groups with different hot sets; the aggregate must keep one
    // independent bounded summary per group through partial aggregation.
    val k = 12
    val rowsIn = rnd.shuffle((0 until 3).flatMap { g =>
      (0 until 3).flatMap(h => List.fill(120)((s"g$g", s"g${g}hot$h"))) ++
        List.fill(240)((s"g$g", s"cold${rnd.nextInt(120)}"))
    })
    val truth = rowsIn.groupBy(identity).map { case ((g, it), xs) => (g, it) -> xs.size.toLong }
    val nPerGroup = rowsIn.groupBy(_._1).map { case (g, xs) => g -> xs.size.toLong }
    val out = rowsIn.toDF("g", "item").repartition(4)
      .groupBy(col("g")).agg(expr(s"misra_gries(item, $k)").as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.item"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.length <= k, s"group $g summary exceeds k: ${rows.length}")
      rows.foreach { case (_, item, cnt, err) =>
        val t = truth.getOrElse((g, item), 0L)
        assert(cnt <= t && cnt + err >= t,
          s"group $g item $item: [$cnt, ${cnt + err}] does not bracket $t")
      }
      val present = rows.map(_._2).toSet
      val n = nPerGroup(g)
      truth.collect { case ((`g`, it), c) if c > n / k => it }.foreach { hot =>
        assert(present(hot), s"group $g: guaranteed heavy hitter $hot missing")
      }
    }
  }

  test("heavyHitters: exact output equals plain groupBy-count-filter, random corpora") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(404)
    (1 to 3).foreach { _ =>
      val vocabHot = (0 until 5).map(i => s"hotword$i")
      val vocabCold = (0 until 200).map(i => s"cold$i")
      val docs = (0 until 120).map { id =>
        val ws = List.fill(8)(
          if (rnd.nextInt(3) == 0) vocabHot(rnd.nextInt(vocabHot.size))
          else vocabCold(rnd.nextInt(vocabCold.size)))
        (id.toLong, ws.mkString(" "))
      }.toDF("doc_id", "text")
      val k = 64
      val minCount = 10L
      val got = graft.ops.TextStats.heavyHitters(docs, k, minCount)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val toks = docs.select(explode(graft.functions.tokens(col("text"))).as("t"))
      val n = toks.count()
      val thr = math.max(minCount, math.ceil(n.toDouble / k).toLong)
      val exact = toks.groupBy("t").count()
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .filter(_._2 > thr).toSet
      assert(got == exact, s"sketch-pruned $got != exact $exact (thr $thr)")
    }
  }
}
