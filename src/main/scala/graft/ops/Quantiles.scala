package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Exact quantiles at corpus scale in TWO bounded passes, via the native
  * `kll_sketch` aggregate ([[graft.functions.KllSketch]]).
  *
  * The existing histogram-CDF quantiles ([[SkewAgg.histogramQuantiles]])
  * shuffle one row per distinct (key, value) — ideal for low-cardinality
  * measures, quadratic-ruin for near-unique ones (a price or latency
  * column at 100 TB has billions of distincts). This path never moves the
  * value set:
  *
  *  1. **sketch pass** — one `kll_sketch(x, k)` aggregate; each map task
  *     reduces its split to an O(k·log(n/k)) summary (partial
  *     aggregation), and the result carries a CERTIFIED rank-error bound
  *     `err` (the sum of per-compaction weights — see [[graft.functions.KllState]]);
  *  2. **bracket** — on the tiny summary frame, for each target rank
  *     `t = ceil(q·n)` pick `lo` = max summary value with cumulative
  *     weight ≤ t − err − 1 and `hi` = min with cumw ≥ t + err. The
  *     certificate proves the true t-th smallest lies in `(lo, hi]`;
  *  3. **exact pass** — re-scan once with the ≤ |q| bracket rows
  *     broadcast: rows ≤ lo collapse into one counting bucket map-side,
  *     rows in `(lo, hi]` (O(err) of them) group by exact value, and the
  *     running-sum CDF over that bounded frame reads off the exact
  *     order statistic.
  *
  * The output is the EXACT quantile — deterministic regardless of
  * partition merge order (the sketch only steers which values the second
  * pass examines, never the answer) — which is what lets a
  * sketch-accelerated query hash-match a plain-SQL oracle.
  */
object Quantiles {

  /** Default sketch capacity per level: err ≈ n·log₂(n/k)/k ≈ 1% of n at
    * a million rows; raise k to shrink the pass-2 window fraction at
    * larger n (k=8192 holds it ≈ 0.4% at 10^12 rows).
    */
  val DefaultK = 1024

  /** Exact quantiles of `valCol` (cast to double), optionally per
    * `groupCols` group. `qs` maps output labels to fractions, e.g.
    * `Seq("p50" -> 0.5)`. Output: `(groupCols..., quantile, value)` where
    * `value` is the smallest x with #{rows ≤ x} ≥ ceil(q·n) — the same
    * discrete-CDF definition the SQL oracles use.
    */
  def exactQuantiles(df: DataFrame, valCol: String, qs: Seq[(String, Double)],
                     k: Int = DefaultK,
                     groupCols: Seq[String] = Nil,
                     weightCol: Option[String] = None): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val gcols = groupCols.map(col)
    val aggSql = weightCol match {
      case None => s"kll_sketch(cast($valCol as double), $k)"
      case Some(w) =>
        s"kll_sketch(cast($valCol as double), cast($w as bigint), $k)"
    }
    val sk = df.groupBy(gcols: _*).agg(expr(aggSql).as("sk"))
    exactFromSketches(df, valCol, sk, qs, groupCols, weightCol)
  }

  /** Bracket + exact pass off an EXTERNALLY built sketch frame
    * `(groupCols..., sk: kll_sketch result struct)` — the entry point for
    * sketches that arrive from somewhere other than a batch aggregate of
    * `df` itself: the streaming state store
    * ([[graft.streaming.StreamOps]]), a persisted summary table, a
    * different-but-equal snapshot. The certificate only has to hold for
    * the data `df` actually contains, which it does whenever the sketch
    * was built over exactly those rows.
    */
  def exactFromSketches(df: DataFrame, valCol: String, sk: DataFrame,
                        qs: Seq[(String, Double)],
                        groupCols: Seq[String],
                        weightCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    // A group may arrive with SEVERAL sketch rows (appended summary
    // snapshots, a re-run stream table) — merge them first exactly as
    // [[mergedQuantiles]] does (n and err add, items union), so the CDF
    // window below always sees ONE (n, err) per group. Without this,
    // duplicate rows interleave cumw and silently corrupt the bracket.
    // Checkpointed because TWO consumers read it (`summary` below and the
    // all-NULL-group branch): without the cut, Catalyst re-derives the
    // sketch aggregate — one extra full corpus scan — for the second
    // consumer. Same pattern as [[mergedQuantiles]]'s `per` frame; the
    // frame itself is O(groups · k·log) rows, cheap to pin.
    val merged = sk
      .select(gcols :+ col("sk.n").as("n1") :+ col("sk.err").as("e1") :+
        col("sk.items").as("i1"): _*)
      .groupBy(gcols: _*)
      .agg(sum(col("n1")).cast("long").as("kll_n"),
        sum(col("e1")).cast("long").as("kll_err"),
        flatten(collect_list(col("i1"))).as("items"))
      .localCheckpoint()
    val summary = merged
      .select(gcols :+ col("kll_n") :+ col("kll_err") :+
        explode(col("items")).as("it"): _*)
      .groupBy(gcols :+ col("kll_n") :+ col("kll_err") :+
        col("it.v").as("v"): _*)
      .agg(sum(col("it.w")).as("wv"))
      .withColumn("cumw",
        sum(col("wv")).over(Window.partitionBy(gcols: _*).orderBy(col("v"))))
    val res = exactFromSummary(df, valCol, summary, qs, groupCols, weightCol)
    // A group whose values are ALL NULL sketches to zero items; the
    // explode above would silently drop it, but a plain-SQL aggregate
    // over a nullable column still emits the group (and an UNGROUPED
    // aggregate emits one row even when every input is NULL) — so
    // surface those with a NULL quantile value, like the oracle does.
    // For groupCols.isEmpty, `merged` is the single global groupBy().agg
    // row, so the same filter yields exactly one all-NULL marker row.
    val emptyGroups = merged.where(size(col("items")) === 0)
      .select(gcols: _*)
      .crossJoin(qs.map(_._1).toDF("quantile"))
      .withColumn("value", lit(null).cast("double"))
    res.unionByName(emptyGroups)
  }

  /** The mergeable-summaries path: one independent sketch per `sliceCol`
    * slice (what an incremental pipeline persists as each day/shard
    * lands), then the slice summaries merge DECLARATIVELY — items union,
    * n and err add — and the same bracket + exact pass runs off the
    * merged summary without ever re-sketching the raw rows. Each slice's
    * certificate bounds its sub-stream's rank error and true ranks add
    * over disjoint slices, so the merged certificate is valid under any
    * slicing (Agarwal et al., "Mergeable summaries", PODS 2012 — the
    * property proven for this family). Output
    * `(quantile, value, n_slices)`; `value` is identical to the direct
    * [[exactQuantiles]] run by construction.
    */
  def mergedQuantiles(df: DataFrame, valCol: String, sliceExpr: Column,
                      qs: Seq[(String, Double)],
                      k: Int = DefaultK): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // The per-slice summary frame is O(slices · k·log) rows — checkpoint it
    // so the three tiny consumers below (totals, union, n_slices) never
    // re-trigger the raw scan: the raw rows are read exactly twice overall
    // (sketch pass here, exact pass in exactFromSummary).
    val per = df.groupBy(sliceExpr.as("slice"))
      .agg(expr(s"kll_sketch(cast($valCol as double), $k)").as("sk"))
      .select(col("sk.n").as("sn"), col("sk.err").as("serr"),
        col("sk.items").as("items"))
      .localCheckpoint()
    val tot = per.agg(sum(col("sn")).as("kll_n"), sum(col("serr")).as("kll_err"),
      count(lit(1)).as("n_slices"))
    // Unpartitioned window by design: the merged summary is O(k·log(n/k))
    // rows REGARDLESS of slice count (same-value items collapse in the
    // groupBy above), so the single-task CDF pass is bounded by the
    // sketch capacity, never by data volume. If a deployment ever raises
    // k·log past single-task comfort, switch to a two-level cumulative
    // sum (per-bucket partial sums + broadcast offsets).
    val summary = per.select(explode(col("items")).as("it"))
      .groupBy(col("it.v").as("v")).agg(sum(col("it.w")).as("wv"))
      .crossJoin(broadcast(tot))
      .withColumn("cumw", sum(col("wv")).over(Window.orderBy(col("v"))))
    exactFromSummary(df, valCol, summary, qs, Nil)
      .crossJoin(broadcast(tot.select(col("n_slices"))))
  }

  /** Robust per-group scaling statistics: exact median, exact MAD
    * (median absolute deviation), and the count of robust outliers
    * (`|x − med| > 3·1.4826·MAD` — the normal-consistent z>3 cut). Mean/
    * stddev scaling is itself corrupted by the outliers it should flag;
    * median/MAD is the standard robust alternative, and both medians here
    * are EXACT order statistics via the KLL two-pass, so the output is
    * engine-portable. Cost: five narrow columnar scans (two sketch+exact
    * quantile rounds plus the outlier count), each shuffling only bounded
    * summaries — never a value-keyed CDF.
    */
  def robustScale(df: DataFrame, valCol: String, groupCols: Seq[String],
                  k: Int = DefaultK): DataFrame = {
    val gcols = groupCols.map(col)
    // med and mad are one row per group — checkpoint each so its quantile
    // round runs ONCE (un-checkpointed, every downstream reference would
    // re-execute the whole two-pass: the raw table was being read 9x
    // instead of 5, which is exactly what the scan-multiplicity plan
    // sweep exists to catch).
    val med = exactQuantiles(df, valCol, Seq("med" -> 0.5), k, groupCols)
      .select(gcols :+ col("value").as("med"): _*)
      .localCheckpoint()
    val dev = df.join(broadcast(med), groupCols)
      .select(gcols :+ col("med") :+
        abs(col(valCol).cast("double") - col("med")).as("adev"): _*)
    val mad = exactQuantiles(dev, "adev", Seq("mad" -> 0.5), k, groupCols)
      .select(gcols :+ col("value").as("mad"): _*)
      .localCheckpoint()
    df.join(broadcast(med), groupCols).join(broadcast(mad), groupCols)
      .select(gcols :+ col(valCol).cast("double").as("x") :+
        col("med") :+ col("mad"): _*)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        count(when(abs(col("x") - col("med")) > lit(4.4478) * col("mad"),
          lit(1))).as("n_outliers"))
  }

  /** Bracket the target ranks on the summary frame, then one exact
    * windowed re-scan. `summary`: `(groupCols..., kll_n, kll_err, v, wv,
    * cumw)`. With `weightCol`, ranks count each row `weight` times
    * (matching the weighted sketch: rows with null/non-positive weight
    * contribute nothing) and `t = ceil(q·totalWeight)`.
    */
  private def exactFromSummary(df: DataFrame, valCol: String,
                               summary: DataFrame, qs: Seq[(String, Double)],
                               groupCols: Seq[String],
                               weightCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    // Quantile fractions are interpreted at 6-decimal precision and the
    // target rank is computed in EXACT integer arithmetic:
    // t = ceil(n·q) = (n·num + den−1) div den with den = 10⁶. A double
    // ceil(q·n) can land one ulp above an exact integer product (q=0.9,
    // n=10 → 9.000000000000002 → t=10) and diverge from a DECIMAL-typed
    // SQL oracle; integer div cannot. Safe to n ≈ 9.2·10¹² rows/weight
    // before the n·num product overflows a long.
    val qdf = qs.map { case (lbl, q) =>
      require(q > 0.0 && q <= 1.0, s"quantile fraction out of (0,1]: $q")
      (lbl, math.round(q * 1000000.0))
    }.toDF("quantile", "qnum")
    // t = ceil(q·n) clamped to ≥ 1; lo/hi from the certificate: cumw is the
    // summary rank R(v), |R(v) − trueRank(v)| ≤ err, so cumw ≤ t−err−1 ⇒
    // trueRank(v) ≤ t−1 (answer is strictly above v) and cumw ≥ t+err ⇒
    // trueRank(v) ≥ t (answer is ≤ v). Null lo/hi = unbounded side.
    val br = summary.crossJoin(broadcast(qdf))
      .withColumn("t",
        greatest(expr("(kll_n * qnum + 999999) div 1000000"), lit(1L)))
      .groupBy(gcols :+ col("quantile") :+ col("t"): _*)
      .agg(
        max(when(col("cumw") <= col("t") - col("kll_err") - 1, col("v"))).as("lo"),
        min(when(col("cumw") >= col("t") + col("kll_err"), col("v"))).as("hi"))
    val rowWeight = weightCol match {
      case None => lit(1L)
      case Some(w) => col(w).cast("long")
    }
    val x = df.select(gcols :+ col(valCol).cast("double").as("x") :+
      rowWeight.as("rw"): _*)
      .filter(col("rw").isNotNull && col("rw") > 0)
    val joined =
      if (groupCols.isEmpty) x.crossJoin(broadcast(br))
      else x.join(broadcast(br), groupCols)
    val keys = gcols :+ col("quantile") :+ col("t")
    joined
      .filter(col("x").isNotNull && (col("hi").isNull || col("x") <= col("hi")))
      // everything at-or-below lo collapses into ONE null bucket (combined
      // map-side); only the (lo, hi] window — O(err) rows — keeps exact
      // values, so the shuffle carries O(tasks + err) rows per quantile
      .select(keys :+ col("rw") :+ when(col("lo").isNotNull && col("x") <= col("lo"),
        lit(null).cast("double")).otherwise(col("x")).as("b"): _*)
      .groupBy(keys :+ col("b"): _*)
      .agg(sum(col("rw")).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(gcols :+ col("quantile"): _*)
          .orderBy(col("b").asc_nulls_first)))
      .filter(col("b").isNotNull && col("cum") >= col("t"))
      .groupBy(gcols :+ col("quantile"): _*)
      .agg(min(col("b")).as("value"))
  }
}
