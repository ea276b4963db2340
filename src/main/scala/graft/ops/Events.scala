package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Time-series operators over the `events` table (ts timestamp, user_id,
  * event_type, value double, props JSON string).
  *
  * Batch tumbling windows via `window($"ts", ...)`: the aggregation is a
  * single hash-aggregate keyed on (window, event_type) — partial map-side
  * combine, one shuffle of the (tiny) group keys, never a row-level
  * shuffle. JSON extraction (`get_json_object`) is a map-side projection
  * evaluated before the aggregate. The same plan shape runs under
  * Structured Streaming (`readStream` + watermark) unchanged — the window
  * expression is identical in both modes.
  *
  * Money-style sums go through DECIMAL(18,2) so they are order-independent
  * and bit-identical to a SQL oracle; the window start is formatted as a
  * string so timestamp precision never enters the comparison.
  */
object Events {

  /** Per-hour, per-type event stats: count, exact value sum, and the sum of
    * the JSON `$.k` property.
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"), col("sum_k"))

  /** Per-user activity profile: event count, distinct active days, total
    * value — the "user feature" shape of a training-data pipeline.
    */
  def userStats(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
}
