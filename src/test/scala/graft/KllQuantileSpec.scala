package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KllState
import graft.ops.Quantiles

/** The KLL quantile surface, bottom-up:
  *
  *  - state level: the certified rank-error bound `|R(x) − trueRank(x)| ≤
  *    errBound` holds for EVERY query point under random chunkings and
  *    random merge trees (the theorem the two-pass design leans on);
  *  - aggregate level: serialization round-trips mid-stream;
  *  - operator level: [[Quantiles.exactQuantiles]] equals the sort-based
  *    exact quantile on adversarial distributions (sorted, reverse,
  *    constant, heavy-duplicate, near-unique), grouped and global;
  *  - merge path: [[Quantiles.mergedQuantiles]] equals the direct run.
  */
class KllQuantileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-kll-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Σ_{item v ≤ x} w over the summary. */
  private def sketchRank(st: KllState, x: Double): Long =
    st.items.collect { case (v, w) if v <= x => w }.sum

  /** Exact discrete quantile: min v with #{y ≤ v} ≥ ceil(q·n). */
  private def exactQ(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    s(math.max(math.ceil(q * s.length).toInt, 1) - 1)
  }

  test("state: rank certificate holds under random chunking + merge trees") {
    val rnd = new scala.util.Random(42)
    val dists: Seq[Int => Seq[Double]] = Seq(
      n => Seq.fill(n)(rnd.nextDouble() * 1000),            // uniform
      n => (1 to n).map(_.toDouble),                        // sorted
      n => (n to 1 by -1).map(_.toDouble),                  // reverse
      n => Seq.fill(n)(7.0),                                // constant
      n => Seq.fill(n)(rnd.nextInt(5).toDouble),            // heavy dups
      n => Seq.fill(n)(math.pow(rnd.nextDouble(), 8) * 1e9) // skewed
    )
    dists.zipWithIndex.foreach { case (gen, di) =>
      val xs = gen(5000)
      // random chunking into partial states, merged in a random order —
      // the shapes Spark's partial aggregation actually produces
      var states = List[KllState]()
      var rest = xs
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(900)
        val st = new KllState(64)
        rest.take(take).foreach(st.update)
        states = st :: states
        rest = rest.drop(take)
      }
      while (states.length > 1) {
        val shuffled = rnd.shuffle(states)
        shuffled.head.mergeFrom(shuffled(1))
        states = shuffled.head :: shuffled.drop(2)
      }
      val st = states.head
      assert(st.n == xs.length)
      assert(st.items.map(_._2).sum == st.n, "summary weight must equal n")
      val probes = xs.distinct ++ Seq(-1e18, 1e18) ++
        Seq.fill(20)(rnd.nextDouble() * 1000)
      probes.foreach { x =>
        val trueRank = xs.count(_ <= x).toLong
        val err = math.abs(sketchRank(st, x) - trueRank)
        assert(err <= st.errBound,
          s"dist $di: rank error $err exceeds certificate ${st.errBound} at x=$x")
      }
      // the certificate must also be USEFUL: well under n for k=64
      assert(st.errBound < xs.length / 4,
        s"dist $di: certificate ${st.errBound} too loose for n=${xs.length}")
    }
  }

  test("aggregate: serialize/deserialize round-trips mid-stream") {
    val agg = graft.functions.KllSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0d), None, 32)
    val st = new KllState(32)
    (1 to 1000).foreach(i => st.update((i * 37 % 97).toDouble))
    val back = agg.deserialize(agg.serialize(st))
    assert(back.n == st.n && back.errBound == st.errBound)
    assert(back.items.toSeq == st.items.toSeq)
    // and the revived state keeps working
    (1 to 500).foreach(i => back.update(i.toDouble))
    assert(back.n == 1500)
  }

  test("exactQuantiles: equals sort-based exact quantiles, global and grouped") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { i =>
      val g = if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"
      val v = g match {
        case "a" => rnd.nextDouble() * 1e6          // near-unique
        case "b" => rnd.nextInt(10).toDouble        // heavy dups
        case _   => i.toDouble                      // sorted drift
      }
      (g, v)
    }
    val df = rows.toDF("g", "v").repartition(7)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)

    val global = Quantiles.exactQuantiles(df, "v", qs, k = 128)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    qs.foreach { case (nm, q) =>
      assert(global(nm) == exactQ(rows.map(_._2), q), s"global $nm")
    }

    val grouped = Quantiles.exactQuantiles(df, "v", qs, k = 128,
        groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    for (g <- Seq("a", "b", "c"); (nm, q) <- qs) {
      val vs = rows.filter(_._1 == g).map(_._2)
      assert(grouped((g, nm)) == exactQ(vs, q), s"group $g $nm")
    }
  }

  test("mergedQuantiles: slice→merge path equals the direct run") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 15000).map(i => (i % 12, rnd.nextDouble() * 1e4))
    val df = rows.toDF("m", "v").repartition(5)
    val qs = Seq("p50" -> 0.5, "p99" -> 0.99)
    val direct = Quantiles.exactQuantiles(df, "v", qs, k = 128)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val merged = Quantiles.mergedQuantiles(df, "v", col("m"), qs, k = 128)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(merged.map(_._3).distinct.toSeq == Seq(12L), "n_slices")
    merged.foreach { case (nm, v, _) =>
      assert(v == direct(nm), s"merged $nm: $v vs direct ${direct(nm)}")
    }
  }

  test("streaming: state-store sketches yield batch-identical exact quantiles") {
    val sfDir = "/root/testdata/sf0.001"
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val streamed = graft.streaming.StreamOps
      .streamQuantilesByType(spark, sfDir, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val ev = graft.ops.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
    val batch = Quantiles.exactQuantiles(ev, "value", qs,
        groupCols = Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch divergence: $streamed vs $batch")
  }

  test("edges: extreme q, constant columns, n<k, one-row groups, negatives") {
    val sp = spark; import sp.implicits._
    // q=1.0 (max), q tiny (t clamps to 1 → min), constants, duplicates,
    // negatives — and n far below k so zero compactions (err = 0,
    // brackets collapse to the exact answer)
    val xs = Seq(-5.0, -5.0, 0.0, 0.0, 0.0, 2.5, 7.0, 7.0, 9.0, 11.0)
    val df = xs.map(("g", _)).toDF("g", "v").repartition(3)
    val qs = Seq("q_min" -> 0.0001, "p50" -> 0.5, "q_max" -> 1.0)
    val got = Quantiles.exactQuantiles(df, "v", qs, k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("q_min") == -5.0 && got("q_max") == 11.0)
    assert(got("p50") == exactQ(xs, 0.5))

    val const = Seq.fill(500)(("g", 42.0)).toDF("g", "v").repartition(4)
    val cg = Quantiles.exactQuantiles(const, "v", qs, k = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cg.values.toSet == Set(42.0), s"constant column: $cg")

    // grouped with a 1-row group alongside a 5000-row group
    val mixed = (Seq(("solo", 3.25)) ++
      (1 to 5000).map(i => ("big", i.toDouble))).toDF("g", "v").repartition(4)
    val mg = Quantiles.exactQuantiles(mixed, "v", Seq("p50" -> 0.5), k = 64,
        groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(mg("solo") == 3.25 && mg("big") == 2500.0, s"$mg")
  }

  test("exactFromSketches: duplicate sketch rows per group merge; all-NULL groups surface as NULL") {
    val sp = spark; import sp.implicits._
    graft.functions.GraftFunctions.register(sp)
    val rnd = new scala.util.Random(23)
    val rows: Seq[(String, java.lang.Double)] =
      (1 to 9000).map(i => ("g" + (i % 3), java.lang.Double.valueOf(rnd.nextDouble() * 1e5))) ++
        Seq.fill(40)(("gnull", null: java.lang.Double))
    val df = rows.toDF("g", "v").repartition(4)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)

    // Two appended summary snapshots of the same table — each half
    // sketched independently, unioned: TWO sketch rows per group. The
    // round-6 code interleaved their cumw and corrupted the bracket;
    // exactFromSketches must now pre-merge them (n/err add, items union).
    val lo = df.where(col("v") < 5e4)
    val hi = df.where(col("v") >= 5e4 || col("v").isNull)
    val sk = lo.groupBy(col("g")).agg(expr("kll_sketch(cast(v as double), 128)").as("sk"))
      .unionByName(hi.groupBy(col("g")).agg(expr("kll_sketch(cast(v as double), 128)").as("sk")))
    val got = Quantiles.exactFromSketches(df, "v", sk, qs, Seq("g"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    for (g <- Seq("g0", "g1", "g2"); (nm, q) <- qs) {
      val vs = rows.collect { case (`g`, v) if v != null => v.doubleValue() }
      assert(got((g, nm)) == Some(exactQ(vs, q)),
        s"duplicate-sketch group $g $nm")
    }
    // the all-NULL group is not silently dropped — it reports NULL, as a
    // plain-SQL aggregate over a nullable column would
    qs.foreach { case (nm, _) =>
      assert(got.contains(("gnull", nm)) && got(("gnull", nm)).isEmpty,
        s"all-NULL group must surface a NULL $nm row: $got")
    }
  }

  test("weighted: certificate holds and answers equal the replicated form") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(19)
    // state level: weighted rank bound under mixed weights incl. powers
    // of two, odd weights, and weight-1 rows
    val rows = (1 to 3000).map(_ =>
      (rnd.nextDouble() * 100, 1L + rnd.nextInt(37).toLong))
    val st = new graft.functions.KllState(64)
    rows.foreach { case (x, w) => st.updateWeighted(x, w) }
    assert(st.n == rows.map(_._2).sum)
    assert(st.items.map(_._2).sum == st.n)
    rows.map(_._1).distinct.take(200).foreach { x =>
      val trueRank = rows.collect { case (v, w) if v <= x => w }.sum
      val skRank = st.items.collect { case (v, w) if v <= x => w }.sum
      assert(math.abs(skRank - trueRank) <= st.errBound,
        s"weighted rank error at $x exceeds ${st.errBound}")
    }

    // DataFrame level: weighted quantiles == unweighted over w-fold
    // replicated rows (small weights so replication stays cheap)
    val wrows = (1 to 4000).map(_ =>
      (rnd.nextDouble() * 1000, 1L + rnd.nextInt(9).toLong))
    val wdf = wrows.toDF("v", "w").repartition(5)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val weighted = Quantiles.exactQuantiles(wdf, "v", qs, k = 128,
        weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val replicated = wrows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
    qs.foreach { case (nm, q) =>
      assert(weighted(nm) == exactQ(replicated, q), s"weighted $nm")
    }
    // zero/negative-weight rows contribute nothing
    val withZeros = (wrows ++ Seq((99999.0, 0L), (-99999.0, -5L)))
      .toDF("v", "w").repartition(3)
    val wz = Quantiles.exactQuantiles(withZeros, "v", qs, k = 128,
        weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wz == weighted, "non-positive weights must be ignored")

    // GROUPED + weighted combined (the weighted_quantiles_grouped shape):
    // each group's weighted answer equals the unweighted answer over that
    // group's w-fold-replicated values — groups stay fully independent.
    val grows = (1 to 3000).map { i =>
      (s"s${i % 4}", rnd.nextDouble() * 1000, 1L + rnd.nextInt(9).toLong)
    }
    val gdf = grows.toDF("g", "v", "w").repartition(5)
    val gw = Quantiles.exactQuantiles(gdf, "v", qs, k = 128,
        groupCols = Seq("g"), weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    grows.groupBy(_._1).foreach { case (g, rs) =>
      val rep = rs.flatMap { case (_, v, w) => Seq.fill(w.toInt)(v) }
      qs.foreach { case (nm, q) =>
        assert(gw((g, nm)) == exactQ(rep, q), s"group $g $nm")
      }
    }
  }

  test("robustScale: exact median/MAD and planted-outlier count") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(3)
    // bulk N(ish) values in [0, 100), plus exactly 7 planted far outliers
    val bulk = (1 to 2000).map(i => ("g", 50.0 + (rnd.nextDouble() - 0.5) * 40))
    val outliers = (1 to 7).map(i => ("g", 5000.0 + i))
    val df = (bulk ++ outliers).toDF("g", "v").repartition(4)
    val row = Quantiles.robustScale(df, "v", Seq("g"), k = 128).head()
    val xs = (bulk ++ outliers).map(_._2)
    val med = exactQ(xs, 0.5)
    val mad = exactQ(xs.map(x => math.abs(x - med)), 0.5)
    assert(row.getLong(1) == xs.length)
    assert(row.getDouble(2) == med, s"median ${row.getDouble(2)} vs $med")
    assert(row.getDouble(3) == mad, s"MAD ${row.getDouble(3)} vs $mad")
    val expectOut = xs.count(x => math.abs(x - med) > 4.4478 * mad)
    assert(row.getLong(4) == expectOut && expectOut >= 7,
      s"outliers ${row.getLong(4)} vs $expectOut (>= the 7 planted)")
  }

  test("quantile_bins: equi-depth property — every bin holds n/10 ± rounding") {
    // The query's own output proves cut exactness: with exact decile cuts
    // over a (near-)unique measure, bin populations can only differ from
    // n/10 by rounding plus the multiplicity of the cut values themselves.
    val rows = SparkEntry.queries("quantile_bins")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == (0L to 9L), s"expected bins 0..9: ${rows.toSeq}")
    val n = rows.map(_._2).sum
    rows.foreach { case (b, c) =>
      assert(math.abs(c - n / 10.0) <= 2,
        s"bin $b holds $c of $n — not equi-depth (expected ~${n / 10})")
    }
  }

  test("SQL surface: kll_sketch resolves and certifies through the registry") {
    val sp = spark; import sp.implicits._
    graft.functions.GraftFunctions.register(sp)
    val row = (1 to 4096).map(_.toDouble).toDF("x")
      .agg(expr("kll_sketch(x, 64)").as("sk"))
      .select(col("sk.n"), col("sk.err"), size(col("sk.items")))
      .head()
    assert(row.getLong(0) == 4096)
    assert(row.getLong(1) > 0 && row.getLong(1) < 4096 / 4)
    assert(row.getInt(2) < 4096 / 4, "summary must be far smaller than input")
    // analysis-time argument validation, misra_gries-style
    val e = intercept[Exception] {
      Seq(1.0d).toDF("x").agg(expr("kll_sketch(x, 7)")).head()
    }
    assert(e.getMessage.contains("even"), e.getMessage)
  }
}
