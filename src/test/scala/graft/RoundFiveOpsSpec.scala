package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Events, Graph, Stats, TextStats}

/** Round-5 additions: weighted sampling (A-ES), substring-level
  * duplication spans, reciprocal-rank fusion, and the language-ID
  * confusion surface.
  */
class RoundFiveOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-round5-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("weightedSample is deterministic, k-bounded, and weight-sensitive") {
    val sp = spark; import sp.implicits._
    val rows = (1L to 200L).map(i => (i, 10L)) :+ (999L, 1000000000L)
    val df = rows.toDF("doc_id", "n_chars")
    val a = TextStats.weightedSample(df, "doc_id", "n_chars", "t", 20)
      .collect().map(_.getLong(0)).toSeq
    val b = TextStats.weightedSample(df, "doc_id", "n_chars", "t", 20)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "same inputs must select the same sample")
    assert(a.size == 20)
    // the 10^8×-heavier row's variate is ~10^8 smaller: it must win
    assert(a.head == 999L)
    // different salt ⇒ a different (but still deterministic) subset
    val c = TextStats.weightedSample(df, "doc_id", "n_chars", "u", 20)
      .collect().map(_.getLong(0)).toSeq
    assert(c != a)
    // zero/negative weights are excluded, never divide-by-zero
    val z = TextStats.weightedSample(
      Seq((1L, 0L), (2L, 5L)).toDF("doc_id", "n_chars"),
      "doc_id", "n_chars", "t", 10).collect()
    assert(z.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("dupSpans counts cross-document n-gram positions") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),  // 3 8-grams; first shared with doc 2
      (2L, "a b c d e f g h x y"),  // 3 8-grams; first shared with doc 1
      (3L, "q w e r t y u i o p"),  // 3 8-grams, all unique
      (4L, "too short")             // < 8 tokens: no positions, absent
    ).toDF("doc_id", "text")
    val out = TextStats.dupSpans(docs, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((3L, 1L, 0.3333)))
    assert(out(2L) == ((3L, 1L, 0.3333)))
    assert(out(3L) == ((3L, 0L, 0.0)))
  }

  test("dupSpans counts repeated positions but requires ANOTHER document") {
    val sp = spark; import sp.implicits._
    // doc 5 repeats its own 8-gram (positions 1 and 9 of the token list)
    // but no other doc shares it: within-doc repetition is NOT a dup span.
    val docs = Seq(
      (5L, "a b c d e f g h a b c d e f g h"),
      (6L, "z z z z z z z z q"),
      (7L, "z z z z z z z z r")
    ).toDF("doc_id", "text")
    val out = TextStats.dupSpans(docs, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(5L)._2 == 0L, "self-repeats alone must not count")
    // docs 6/7 share "z z z z z z z z" (positions 1 in each; doc 6 has
    // 2 grams: zzzzzzzz at 1 and zzzzzzzq... wait 9 tokens → 2 grams)
    assert(out(6L) == ((2L, 1L)))
    assert(out(7L) == ((2L, 1L)))
  }

  test("rrfFuse merges ranks with 1/(c+rank) and coalesces absences") {
    val sp = spark; import sp.implicits._
    val a = Seq((10L, 1L), (11L, 2L)).toDF("doc_id", "rank")
    val b = Seq((10L, 1L), (12L, 2L)).toDF("doc_id", "rank")
    val out = TextStats.rrfFuse(a, b, 10, 60).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    assert(out(10L) == r9(2.0 / 61.0))
    assert(out(11L) == r9(1.0 / 62.0))
    assert(out(12L) == r9(1.0 / 62.0))
    // doc present in both lists outranks single-list docs
    val first = TextStats.rrfFuse(a, b, 1, 60).collect().head.getLong(0)
    assert(first == 10L)
  }

  test("columnProfile counts nulls, distincts, and string min/max per column") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (Some("a"), Some(1L)), (Some("b"), None),
      (Some("a"), Some(3L)), (None, Some(3L))
    ).toDF("s", "x")
    val out = Stats.columnProfile(df, Seq("s" -> col("s"), "x" -> col("x")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(out("s") == ((4L, 1L, 2L, "a", "b")))
    assert(out("x") == ((4L, 1L, 2L, "1", "3")))
  }

  test("pagerankStep matches the hand-computed iteration on a 3-node graph") {
    val sp = spark; import sp.implicits._
    // a→b, a→c, b→c; r0 = 1/3 each, d = 0.85, dangling c keeps its mass
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val out = Graph.pagerankStep(edges, 0.85).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 0.05) < 1e-6)
    assert(math.abs(out("b") - (0.05 + 0.85 / 3.0 / 2.0)) < 1e-6)
    assert(math.abs(out("c") - (0.05 + 0.85 * (1.0 / 3.0 / 2.0 + 1.0 / 3.0))) < 1e-6)
  }

  test("minhashAccuracy reports est=exact=1 for identical docs and bounded error") {
    val sp = spark; import sp.implicits._
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, body), (2L, body),                       // identical pair
      (3L, body + " extra tail words here now"),    // near-dup of 1/2
      (4L, "totally different text with its own words entirely")
    ).toDF("doc_id", "text")
    val rows = Dedup.minhashAccuracy(docs, k = 6, bands = 3, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows.contains((1L, 2L)))
    val (e12, x12, err12) = rows((1L, 2L))
    assert(e12 == 1.0 && x12 == 1.0 && err12 == 0.0)
    rows.values.foreach { case (e, x, err) =>
      assert(e >= 0.0 && e <= 1.0 && x >= 0.0 && x <= 1.0)
      assert(math.abs(err - math.rint(math.abs(e - x) * 1e4) / 1e4) < 1e-9)
    }
  }

  test("sourceEntropy is 0 for a constant stream and ln(2) for a fair coin") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "s1", "same same same same"),
      (2L, "s2", "heads tails heads tails")
    ).toDF("doc_id", "source", "text")
    val out = TextStats.sourceEntropy(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("s1") == ((4L, 0.0)))
    assert(out("s2")._1 == 4L)
    assert(math.abs(out("s2")._2 - math.log(2.0)) < 1e-6)
  }

  test("gapFillHourly emits explicit zero rows for missing hours") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      ("a", ts("2026-01-01 10:15:00")),
      ("a", ts("2026-01-01 12:45:00")),  // 11:00 missing for a
      ("b", ts("2026-01-01 11:30:00"))   // 10:00 and 12:00 missing for b
    ).toDF("event_type", "ts")
    val out = Events.gapFillHourly(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.size == 6, "2 types x 3 hours")
    assert(out(("a", "2026-01-01 10:00:00")) == 1L)
    assert(out(("a", "2026-01-01 11:00:00")) == 0L)
    assert(out(("a", "2026-01-01 12:00:00")) == 1L)
    assert(out(("b", "2026-01-01 11:00:00")) == 1L)
    assert(out(("b", "2026-01-01 10:00:00")) == 0L)
    assert(out(("b", "2026-01-01 12:00:00")) == 0L)
  }

  test("compactStream drops only same-type consecutive events per user") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      (1L, 1L, "view", ts("2026-01-01 10:00:00")),
      (1L, 2L, "view", ts("2026-01-01 10:00:30")),  // dup of prev → dropped
      (1L, 3L, "click", ts("2026-01-01 10:01:00")),
      (1L, 4L, "view", ts("2026-01-01 10:02:00")),  // type change → kept
      (2L, 5L, "view", ts("2026-01-01 10:00:30"))   // other user unaffected
    ).toDF("user_id", "event_id", "event_type", "ts")
    val kept = Events.compactStream(events).collect().map(_.getLong(1)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("langId passThrough carries label columns for the confusion matrix") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "en", "the cat and the dog is in that house for it was"),
      (2L, "de", "der hund und die katze ist nicht ein tier mit von zu"),
      (3L, "en", "zzz qqq xxx")  // no stopword hits → predicted und
    ).toDF("doc_id", "lang", "text")
    val out = TextStats.langId(docs, passThrough = Seq("lang"))
      .select("lang", "lang_pred").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("en", "en"), ("de", "de"), ("en", "und")))
  }
}
