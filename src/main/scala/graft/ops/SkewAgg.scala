package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe aggregation patterns.
  *
  * Plain `groupBy(hotKey).agg(...)` shuffles every row to one reducer per
  * key — fine for combinable aggregates (sum/count get map-side partial
  * aggregation) but a straggler factory for aggregates that must SEE all
  * values per key (exact distinct, collect_list, exact percentiles) when
  * the key domain is tiny or skewed (e.g. 3 return flags over 100 TB of
  * lineitem).
  */
object SkewAgg {

  /** Exact distinct count per key, restated as dedupe-then-count:
    * the first shuffle keys on (key, value) — cardinality = distinct
    * pairs, uniformly spread — and the second aggregates pre-deduped rows
    * with map-side combine. No reducer ever holds a hot key's full value
    * multiset, versus a naive per-key distinct-set aggregate. (This is
    * the manual restatement of what Catalyst's Expand-based rewrite does
    * for `countDistinct`; spelled out here as the composable pattern for
    * aggregates the optimizer does NOT rewrite, e.g. collect_set size
    * with filters, multi-stage sketches.)
    */
  def distinctCount(df: DataFrame, key: String, value: String,
                    outCol: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key))
      .agg(count(lit(1)).as(outCol))

  /** Exact lower median per key over a bounded-domain value column,
    * computed from the per-(key, value) histogram: the first shuffle keys
    * on (key, value) — domain-bounded and uniform — with map-side combine
    * collapsing duplicates before any data moves; the windows then run
    * over at most |domain| rows per key. Versus `percentile(value, 0.5)`,
    * which ships every raw row of a hot key to one reducer. The lower
    * median (smallest value whose cumulative count reaches ceil(n/2))
    * avoids cross-engine interpolation ambiguity for even counts.
    */
  def histogramMedian(df: DataFrame, key: String, value: String,
                      outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key), col(value)).agg(count(lit(1)).as("n"))
    val byKey = Window.partitionBy(col(key))
    val cum = sum(col("n")).over(byKey.orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val tot = sum(col("n")).over(byKey)
    counts
      .withColumn("cum", cum)
      .withColumn("tot", tot)
      .where(col("cum") >= ceil(col("tot") / 2.0d))
      .groupBy(col(key))
      .agg(min(col(value)).as(outCol))
  }

  /** Exact lower quantiles per key from the same per-(key, value)
    * histogram CDF as [[histogramMedian]] — one (key, value)-keyed shuffle
    * with map-side combine, then all requested quantiles read off the
    * cumulative counts in a single pass: quantile q = the smallest value
    * whose cumulative count reaches ceil(q·n). At 100 TB this replaces a
    * `percentile(...)` that would ship every raw row of a hot key to one
    * reducer; the histogram is bounded by the value DOMAIN, not the row
    * count. Lower-quantile semantics (no interpolation) keep the result
    * engine-portable.
    */
  def histogramQuantiles(df: DataFrame, key: String, value: String,
                         quantiles: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantiles.nonEmpty && quantiles.forall { case (_, q) => q > 0 && q <= 1 })
    val counts = df.groupBy(col(key), col(value)).agg(count(lit(1)).as("n"))
    val byKey = Window.partitionBy(col(key))
    val cum = sum(col("n")).over(byKey.orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val aggs = quantiles.map { case (name, q) =>
      min(when(col("cum") >= ceil(col("tot") * q), col(value))).as(name)
    }
    counts
      .withColumn("cum", cum)
      .withColumn("tot", sum(col("n")).over(byKey))
      .groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
  }
}
