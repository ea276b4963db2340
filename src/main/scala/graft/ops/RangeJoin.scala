package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join: match each point-in-time row to the
  * intervals `[lo, hi]` that contain it.
  *
  * A naive `points JOIN intervals ON ts BETWEEN lo AND hi` has no equi-key,
  * so Spark plans it as BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * comparisons, the classic 100 TB cliff. The scalable restatement here
  * BUCKETIZES time: each interval is exploded into the calendar days it
  * touches (bounded fan-out: an interval of d days becomes d+1 rows), each
  * point maps to exactly ONE day, and the join becomes a hash equi-join on
  * the day key followed by the exact `BETWEEN` residual filter. A point can
  * meet a given interval in at most one bucket (its own day), so no
  * dedup pass is needed. Shuffle volume: |points| + Σ interval-days — both
  * linear; the day key also spreads hot intervals across reducers.
  */
object RangeJoin {

  /** Join `points` (with timestamp `tsCol`) to `intervals` (with
    * timestamps `loCol`/`hiCol`, inclusive) by containment.
    * Output: every point column + every interval column, one row per
    * (point, containing interval).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, loCol: String, hiCol: String): DataFrame = {
    val days = intervals.withColumn("_day",
      explode(sequence(date_trunc("DAY", col(loCol)),
        date_trunc("DAY", col(hiCol)), expr("interval 1 day"))))
    val pts = points.withColumn("_day", date_trunc("DAY", col(tsCol)))
    pts.join(days, Seq("_day"))
      .where(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("_day")
  }
}
