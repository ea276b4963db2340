package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the LATEST right row of
  * the same key whose timestamp is ≤ the left row's timestamp — the
  * feature-store lookup ("value of feature f as of time t") that
  * relational joins cannot express directly.
  *
  * Spark has no AsOf operator; this composes one from existing primitives
  * (the brief's preference (a)) with the union + ordered-window +
  * `last(ignoreNulls)` pattern:
  *
  *   1. tag left rows (side=1) and right rows (side=0), union them with a
  *      unified schema (each side null-pads the other's columns);
  *   2. one window per key, ordered by (ts, side, tiebreak): a running
  *      `last(right_col, ignoreNulls = true)` carries the most recent
  *      right values forward — right rows sort BEFORE left rows at equal
  *      ts, so an exactly-simultaneous right row is visible (ASOF `>=`
  *      semantics);
  *   3. keep only left rows. Unmatched left rows keep nulls (LEFT ASOF).
  *
  * Scale shape: ONE shuffle on the key + one per-partition sort — the same
  * cost class as any keyed window; per-key volume is bounded by per-entity
  * history, not corpus size. No range self-join (quadratic), no broadcast
  * requirement on either side.
  *
  * Right rows must be unique per (key, ts) for a deterministic answer;
  * callers dedupe first (e.g. `max_by(value, event_id)`).
  */
object AsOfJoin {

  /** @param rightCols right-side value columns carried to the output,
    *                   prefixed `r_`
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap

    val l = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col("_ats"), col("_side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(rightTypes(c)).as(s"r_$c")): _*)
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val r = right
      .withColumn("_ats", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col("_ats"), col("_side")) ++
        leftCols.map(c => if (c == key) col(key)
                          else lit(null).cast(leftTypes(c)).as(c)) ++
        rightCols.map(c => col(c).as(s"r_$c")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_ats"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.map(c => last(col(s"r_$c"), ignoreNulls = true).over(w).as(s"r_$c"))

    l.unionByName(r)
      .select(Seq(col("_side")) ++ leftCols.map(col) ++ carried: _*)
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"r_$c")): _*)
  }
}
