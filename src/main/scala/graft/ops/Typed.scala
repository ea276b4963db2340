package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** Typed Dataset surface: case-class Encoders + a custom `Aggregator`.
  *
  * The Aggregator is the type-safe custom aggregate that KEEPS Spark's
  * partial aggregation: `reduce` runs map-side in every task and `merge`
  * combines partial buffers at the shuffle — unlike `mapGroups`, which
  * ships every raw row to its group's reducer. At 100 TB that difference
  * is the whole game for per-key summaries; all buffer fields here are
  * order-insensitive (counts, max), so the result is also deterministic
  * under any partitioning — which is what lets a SQL oracle replay it.
  */
object Typed {

  case class Ev(user_id: Long, event_type: String, value: Double)
  case class EvBuf(n: Long, purchases: Long, maxv: Double)
  case class EvSummary(user_id: Long, n_events: Long, n_purchases: Long,
                       max_value: Double)

  /** Per-user activity summary as a typed Aggregator. */
  object EvAgg extends Aggregator[Ev, EvBuf, EvBuf] {
    override def zero: EvBuf = EvBuf(0L, 0L, Double.NegativeInfinity)
    override def reduce(b: EvBuf, e: Ev): EvBuf = EvBuf(
      b.n + 1L,
      b.purchases + (if (e.event_type == "purchase") 1L else 0L),
      math.max(b.maxv, e.value))
    override def merge(a: EvBuf, b: EvBuf): EvBuf =
      EvBuf(a.n + b.n, a.purchases + b.purchases, math.max(a.maxv, b.maxv))
    override def finish(r: EvBuf): EvBuf = r
    override def bufferEncoder: Encoder[EvBuf] = Encoders.product[EvBuf]
    override def outputEncoder: Encoder[EvBuf] = Encoders.product[EvBuf]
  }

  /** events → per-user typed summary (one map-side-combined shuffle). */
  def userSummary(events: DataFrame): DataFrame = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .agg(EvAgg.toColumn.name("s"))
      .map { case (uid, s) => EvSummary(uid, s.n, s.purchases, s.maxv) }
      .toDF()
  }
}
