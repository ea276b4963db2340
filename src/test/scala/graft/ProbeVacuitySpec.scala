package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Vacuity audit for every accuracy PROBE the engine ships: a probe row
  * can be oracle-green yet worthless — a knob that stopped biting reports
  * recall 1.0 (or error 0.0) forever, and the hash compare happily
  * confirms it. Round 10 shipped exactly that (`sparse_recall` with a df
  * cap above the fixture's max df pruned nothing); round 11's audit
  * caught a second (`ndcg_eval`'s saturating binary relevance read 1.0
  * at every SF). This spec pins, for EVERY probe, at least one
  * non-trivial value on the fixture — a recall strictly below 1, an
  * error strictly above 0, a knob whose two settings genuinely differ —
  * so a future change that de-fangs a probe fails the suite instead of
  * reporting perfection forever.
  */
class ProbeVacuitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-probe-vacuity-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.ops.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, sfDir).collect().toSeq

  private def d(r: Row, c: String): Double = r.getAs[Any](c) match {
    case x: Double => x
    case x: Long => x.toDouble
    case x: java.math.BigDecimal => x.doubleValue()
  }

  // Each entry: (probe query, description of the bite, predicate over
  // the result rows). A predicate false on the fixture means the probe
  // has gone vacuous — its knob no longer produces a measurable signal.
  private val probes: Seq[(String, String, Seq[Row] => Boolean)] = Seq(
    ("ann_recall", "IVF recall strictly between 0 and 1 somewhere",
      rs => rs.exists(d(_, "recall") > 0) && rs.exists(d(_, "recall") < 1)),
    ("ann_recall_probe", "second probe buys recall; recall not saturated",
      rs => rs.exists(r => d(r, "recall_p2") > d(r, "recall_p1")) &&
        rs.exists(d(_, "recall_p2") < 1)),
    ("ann_recall_trained", "shipped-quantizer multi-probe buys recall",
      rs => rs.exists(r => d(r, "recall_p2") > d(r, "recall_p1")) &&
        rs.exists(d(_, "recall_p2") < 1)),
    ("ann_recall_ivfpq", "routing loss visible; second probe buys it back",
      rs => rs.exists(r => d(r, "recall_p2") > d(r, "recall_p1")) &&
        rs.exists(d(_, "recall_p2") < 1)),
    ("ann_recall_ivfpq_res", "raw and residual codes measurably differ",
      rs => rs.exists(r => d(r, "recall_raw") != d(r, "recall_res")) &&
        rs.exists(d(_, "recall_raw") < 1)),
    ("auc_eval", "AUC strictly inside (0,1) on a mixed label set",
      rs => rs.exists(r => d(r, "auc") > 0 && d(r, "auc") < 1 &&
        d(r, "n_pos") > 0 && d(r, "n_pos") < d(r, "n"))),
    ("calibration_bins", "bins differ in observed rate, none degenerate-free",
      rs => rs.length >= 2 &&
        rs.map(d(_, "frac_pos")).distinct.length >= 2 &&
        rs.exists(r => d(r, "frac_pos") > 0 && d(r, "frac_pos") < 1)),
    ("lang_confusion", "confusions AND correct predictions both present",
      rs => rs.exists(r => r.getAs[String]("lang") != r.getAs[String]("lang_pred")
          && d(r, "n") > 0) &&
        rs.exists(r => r.getAs[String]("lang") == r.getAs[String]("lang_pred")
          && d(r, "n") > 0)),
    ("map_eval", "some query has partial precision (0 < AP < 1)",
      rs => rs.exists(d(_, "ap") > 0) && rs.exists(d(_, "ap") < 1) &&
        rs.exists(r => d(r, "map") > 0 && d(r, "map") < 1)),
    ("mrr_eval", "some query ranks its first relevant below position 1",
      rs => rs.exists(d(_, "rr") > 0) && rs.exists(d(_, "rr") < 1) &&
        rs.exists(r => d(r, "mrr") > 0 && d(r, "mrr") < 1)),
    ("ndcg_eval", "BM25 ranking measurably differs from the tf ideal",
      rs => rs.exists(r => d(r, "ndcg") > 0 && d(r, "ndcg") < 1)),
    ("sketch_eval", "MinHash estimate carries real error somewhere",
      rs => rs.exists(d(_, "abs_err") > 0) && rs.exists(d(_, "est_j") < 1)),
    ("sparse_recall", "df pruning costs measurable recall",
      rs => rs.exists(d(_, "recall") > 0) && rs.exists(d(_, "recall") < 1)))

  test("every accuracy probe produces a non-trivial value on the fixture") {
    val dead = probes.flatMap { case (name, bite, ok) =>
      val rs = rows(name)
      if (ok(rs)) None
      else Some(s"$name — expected: $bite; got:\n  ${rs.mkString("\n  ")}")
    }
    assert(dead.isEmpty,
      s"vacuous probes (green but measuring nothing):\n${dead.mkString("\n")}")
  }

  test("the probe list covers every *recall*/*eval*/confusion/calibration query") {
    // a NEW probe query must register its non-triviality predicate here
    val probeNames = SparkEntry.queries.keys.filter { n =>
      n.contains("recall") || n.endsWith("_eval") ||
        n.contains("confusion") || n.contains("calibration") ||
        n.contains("sketch_eval")
    }.toSet
    val covered = probes.map(_._1).toSet
    assert(probeNames.subsetOf(covered),
      s"probe queries missing a vacuity predicate: ${probeNames -- covered}")
  }
}
