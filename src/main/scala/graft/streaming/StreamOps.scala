package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions._

/** Structured Streaming surface: the batch operators of [[graft.ops.Events]]
  * restated incrementally. The transforms are IDENTICAL plan shapes — a
  * windowed aggregate is the same Catalyst node in batch and streaming —
  * so a pipeline developed against the batch corpus runs on a live stream
  * by swapping `read` for `readStream` and adding a watermark.
  *
  * Scale notes: streaming state (window partials, open sessions) lives in
  * the executor state store keyed by group — it shuffles once per
  * micro-batch on the group key and is bounded by the watermark (closed
  * windows / timed-out sessions are evicted). No driver-side state.
  */
object StreamOps {

  /** Watermarked tumbling-window stats — the streaming twin of
    * [[graft.ops.Events.hourlyStats]]. Append-mode emits each (hour, type)
    * row exactly once, when the watermark passes the window end.
    */
  def hourlyStatsStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup — the incremental twin of
    * [[graft.ops.Dedup.exactByDigest]]: keep the first occurrence of each
    * key, with the seen-keys state BOUNDED by the event-time watermark
    * (`dropDuplicates` alone would grow state forever on an unbounded
    * corpus stream). The state store holds only the key columns — dedup a
    * document stream on its digest, never on the body.
    */
  def dedupStream(rows: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermarkDelay: String = "1 hour"): DataFrame =
    rows.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  // ----------------------------------------------------- sessionization

  final case class Evt(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session accumulator kept in the state store (per user). */
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)

  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Long,
                               total_value: Double)

  /** Gap-based sessionization with `flatMapGroupsWithState` — the
    * incremental twin of [[graft.ops.Events.sessionize]]. A session closes
    * (and is emitted, append-mode) when a later event of the same user
    * arrives past the gap, or when the event-time watermark passes
    * `last event + gap` (timeout). State per user is O(1): one open
    * session.
    *
    * Input must carry a watermark on `ts` (EventTimeTimeout requires it).
    */
  def sessionize(events: Dataset[Evt], gapMinutes: Int): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def close(uid: Long, s: OpenSession): UserSession =
      UserSession(uid, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evts: Iterator[Evt], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(uid, s))
          } else {
            val sorted = evts.toArray.sortBy(_.ts.getTime)
            val out = new ArrayBuffer[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  out += close(uid, s)
                  Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  Some(OpenSession(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            out.iterator
          }
      }
  }
}
