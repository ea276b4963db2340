package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-leg plan fingerprints: the batch snapshot
  * (`plan_fingerprints.txt`) covers every query's BATCH plan, but a
  * `stream_*` query's micro-batch execution also carries STATE operators
  * (aggregation state, dedup state, join buffers, transformWithState) the
  * batch plan never shows. This spec pins each streaming query's
  * state-operator name list, captured from the final micro-batch progress
  * by `StreamOps.lastStateOps` — so a silent shape change (a stateless
  * stream-static join growing state, a windowed aggregate turning into a
  * full-history aggregate, a dedup losing its watermark bound) fails a
  * test instead of shipping.
  */
class StreamStateOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-stream-stateops-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.ops.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // Golden state-operator lists (Spark's own operatorName values).
  // Multi-run queries record the LAST streaming leg that completed.
  private val golden: Map[String, Seq[String]] = Map(
    "stream_hourly" -> Seq("stateStoreSave"),          // windowed agg state
    "stream_dp_counts" -> Seq("stateStoreSave"),       // complete-mode counts
    "stream_vocab" -> Seq("stateStoreSave"),           // complete-mode top-k agg
    "stream_heavy_hitters" -> Seq("stateStoreSave"),   // Misra-Gries agg state
    "stream_quantiles" -> Seq("stateStoreSave"),       // KLL agg state
    "stream_approx_distinct" -> Seq("stateStoreSave"), // HLL register agg state
    "stream_score" -> Seq("stateStoreSave"),           // per-lang scoring agg
    "stream_dedup" -> Seq("dedupeWithinWatermark"),    // watermark-bounded dedup
    "stream_neardup" -> Seq("dedupe"),                 // candidate-pair dedup
    "stream_resume" -> Seq("dedupe"),                  // restart-restored dedup state
    "stream_join" -> Seq("symmetricHashJoin"),         // two-sided buffered join
    "stream_static_join" -> Seq(),                     // stream-static: STATELESS
    "stream_snapshot_source" -> Seq(),                 // file-source passthrough: STATELESS (exactly-once lives in the offset log)
    "stream_snapshot_front" -> Seq(),                  // graft-snap v1 Source passthrough: STATELESS (offsets are versions, exactly-once in the offset log)
    "stream_snapshot_sink" -> Seq(),                   // graft-snap v1 Sink passthrough: STATELESS (batch markers live in the commit notes)
    "stream_snapshot_cdc" -> Seq(),                    // graft-snap CDC v1 Source passthrough: STATELESS (the change feed is derived per window from manifests; exactly-once lives in the offset log)
    "stream_foreach_digest" -> Seq(),                  // append passthrough: STATELESS
    "stream_upsert" -> Seq(),                          // foreachBatch CDC apply: STATELESS (merge state lives in the snapshot table)
    "stream_upsert_mor" -> Seq(),                      // foreachBatch MOR CDC apply: STATELESS (tombstones live in the snapshot table)
    "stream_sessions" -> Seq("flatMapGroupsWithState"),
    "stream_sessions_timers" -> Seq("transformWithStateExec"),
    "stream_running_totals" -> Seq("transformWithStateExec"))

  test("every streaming query's state-operator list matches its golden shape") {
    val streamNames = SparkEntry.queries.keys.filter(_.startsWith("stream_")).toSeq.sorted
    assert(streamNames.toSet == golden.keySet,
      s"golden map out of sync: missing=${streamNames.toSet -- golden.keySet} " +
        s"stale=${golden.keySet -- streamNames.toSet}")
    val got = streamNames.map { n =>
      SparkEntry.queries(n)(spark, sfDir).collect()
      n -> graft.streaming.StreamOps.lastStateOps
    }
    val bad = got.filter { case (n, ops) => ops != golden(n) }
    assert(bad.isEmpty,
      bad.map { case (n, ops) =>
        s"$n: got [${ops.mkString(",")}] expected [${golden(n).mkString(",")}]"
      }.mkString("state-operator drift:\n", "\n", ""))
  }
}
