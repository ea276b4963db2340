package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.tokens

/** Distributed model training/evaluation primitives for the curation
  * pipeline — the "train a cheap classifier over corpus features, then
  * trust its scores as a quality gate" loop (fastText-style language /
  * quality filters, but with the featurize→fit→evaluate machinery run
  * INSIDE the engine instead of exporting to a driver-side library).
  *
  * Scale shape, shared by both operators:
  *
  *  - [[logregTrain]] is batch gradient descent where each round is ONE
  *    corpus scan: features, the margin z = w·x (left-to-right fold over a
  *    FIXED, small feature list) and the 6-dp-rounded sigmoid all ride the
  *    same map-side projection into a single 1-row aggregate (one decimal
  *    sum per feature, map-side combined). Like
  *    [[graft.ops.Similarity.pcaPower]], ALL loop state is the O(features)
  *    driver-side weight vector, re-embedded as literals each round —
  *    nothing cached, nothing checkpointed, shuffle O(features × tasks).
  *
  *  - [[aucEval]] is the tie-aware rank AUC computed WITHOUT a global
  *    per-row ranking: rows collapse to per-score buckets first (sigmoid
  *    scores rounded to 6 dp have ≤ 10⁶ + 1 distinct values, so the
  *    bucket frame is bounded regardless of corpus size), and the single-
  *    partition window that assigns average ranks runs over buckets, not
  *    rows. Average ranks step in halves, so `2·avgrank` is an exact
  *    integer — the AUC numerator is integer arithmetic, bit-identical
  *    in any engine, with one final rounded division.
  *
  * Determinism: inputs quantize to 6 dp, per-round sums are order-free
  * decimal folds, sigmoids are rounded to 6 dp BEFORE entering any sum
  * (so a last-ulp `exp` divergence between engines cannot leak into the
  * gradient), and weights round to 6 dp per round — the whole loop
  * replays bit-for-bit as an unrolled SQL CTE chain.
  */
object Learn {

  private val dec = DecimalType(28, 12)

  /** Per-doc features for the demo classifier: bias, kilo-chars, hecto-
    * tokens — plus the label (is the doc English?). All 6-dp-quantized.
    */
  def docFeatures(docs: DataFrame): DataFrame =
    docs.select(
      when(col("lang") === "en", 1.0d).otherwise(0.0d).as("y"),
      lit(1.0d).as("x0"),
      round(col("n_chars").cast("double") / 1000.0d, 6).as("x1"),
      round(size(tokens(col("text"))).cast("double") / 100.0d, 6).as("x2"))

  /** σ(z) rounded to 6 dp — the rounding is load-bearing for oracle
    * portability, see the object doc. */
  private def sigmoid6(z: Column): Column =
    round(lit(1.0d) / (lit(1.0d) + exp(-z)), 6)

  /** Batch-GD logistic regression over [[docFeatures]]. Output: one row
    * per feature, `(feature, weight)`, weights 6-dp-rounded; `rounds`
    * full-gradient steps at learning rate `lr` from w = 0.
    */
  def logregTrain(docs: DataFrame, rounds: Int, lr: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val names = Seq("x0", "x1", "x2")
    val feats = docFeatures(docs)
    val w = trainWeights(feats, names, rounds, lr)
    names.zip(w).map { case (n, wv) => (n, wv) }.toSeq
      .toDF("feature", "weight")
  }

  /** The loop behind [[logregTrain]], returning the raw weight vector —
    * shared with [[aucOfTrained]] so evaluation scores with EXACTLY the
    * weights training produced.
    */
  def trainWeights(feats: DataFrame, names: Seq[String], rounds: Int,
                   lr: Double): Array[Double] = {
    require(rounds >= 1, "need at least one GD round")
    var w = Array.fill(names.length)(0.0d)
    for (_ <- 1 to rounds) {
      val z = names.zip(w)
        .map { case (n, wv) => col(n) * lit(wv) }
        .reduceLeft(_ + _) // fixed left-to-right fold — portable
      val resid = (sigmoid6(z) - col("y")).as("r")
      // one decimal sum per feature — a single 1-row aggregate per round
      val aggCols = names.map(n =>
        sum((col("r") * col(n)).cast(dec)).as(s"g_$n"))
      val row = feats.select(resid +: names.map(col): _*)
        .agg(count(lit(1)).as("n"), aggCols: _*)
        .head() // 1 row — the only driver-side data movement per round
      val n = row.getLong(0).toDouble
      require(n > 0, "logreg: empty training frame")
      w = w.indices.map { j =>
        val g = row.getDecimal(j + 1).doubleValue() / n
        roundTo(w(j) - lr * g, 6)
      }.toArray
    }
    w
  }

  /** The default demo-classifier feature list, shared by every trainer
    * and apply-pass so artifacts line up by name. */
  val featureNames: Seq[String] = Seq("x0", "x1", "x2")

  /** Train on the corpus, score the SAME corpus with the final weights,
    * and report the rank AUC — the end-to-end "did the cheap classifier
    * learn anything" check. One row: `(n, n_pos, auc)`.
    */
  def aucOfTrained(docs: DataFrame, rounds: Int, lr: Double): DataFrame = {
    val feats = docFeatures(docs)
    aucOfWeights(docs, trainWeights(feats, featureNames, rounds, lr))
  }

  /** The APPLY half of [[aucOfTrained]]: score the corpus with an
    * explicit (typically artifact-loaded — see [[ModelStore]]) weight
    * vector and report the rank AUC. Map-only scoring into [[aucEval]]'s
    * bucketed rank — no training job runs here.
    */
  def aucOfWeights(docs: DataFrame, w: Array[Double]): DataFrame = {
    val z = featureNames.zip(w).map { case (n, wv) => col(n) * lit(wv) }
      .reduceLeft(_ + _)
    aucEval(docFeatures(docs).select(sigmoid6(z).as("score"), col("y")))
  }

  /** Tie-aware ROC-AUC over `(score, y)` rows, WITHOUT a per-row global
    * rank: rows collapse to per-score buckets (6-dp scores ⇒ ≤ 10⁶ + 1
    * buckets at any corpus size), average ranks are assigned by a window
    * over the bucket frame only, and — because tied average ranks step in
    * halves — `2·avgrank` keeps the whole Mann-Whitney numerator in exact
    * integer arithmetic until one final rounded division.
    * Output: one row, `(n, n_pos, auc)`.
    */
  def aucEval(scored: DataFrame, scoreCol: String = "score",
              yCol: String = "y"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = scored.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("nb"), sum(col(yCol).cast("long")).as("pb"))
    val ord = Window.orderBy(col("s"))
    // 2·avgrank of a bucket = 2·(#rows in lower buckets) + nb + 1
    val ranked = buckets.select(col("nb"), col("pb"),
      (coalesce(sum(col("nb")).over(ord.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L)) * 2 + col("nb") + 1)
        .as("avgrank2"))
    // DECIMAL(38,0) keeps the rank sums exact past the int64 range a
    // 10¹¹-row corpus would overflow (DuckDB reaches the same values via
    // its automatic HUGEINT sums).
    val big = DecimalType(38, 0)
    val agg = ranked.agg(
      sum(col("nb")).as("n"),
      sum(col("pb")).as("n_pos"),
      sum(col("pb").cast(big) * col("avgrank2")).as("sum2"))
    // AUC = (Σ_pos avgrank − P(P+1)/2) / (P·(N−P)), doubled through.
    // A single-class corpus (P=0 or P=N) has no rank AUC — guard the
    // zero denominator explicitly so the result is NULL on every engine
    // (an unguarded 0/0 is NULL in Spark but NaN/Inf in DuckDB).
    agg.select(col("n"), col("n_pos"),
      when(col("n_pos") > 0 && col("n_pos") < col("n"),
        round(
          (col("sum2") - col("n_pos").cast(big) * (col("n_pos") + 1)).cast("double")
            / (lit(2.0d) * col("n_pos").cast("double")
              * (col("n") - col("n_pos")).cast("double")), 6))
        .otherwise(lit(null).cast("double")).as("auc"))
  }

  /** Reliability diagram of the trained classifier: centile bins of the
    * 6-dp sigmoid score vs the empirical positive rate — the calibration
    * check run before classifier scores are trusted as probabilities
    * (e.g. as sampling weights in a quality-filtered mixture).
    *
    * One corpus scan into ≤ 100 groups (map-side combined); the mean score
    * is an exact DECIMAL(18,6) sum of already-6-dp scores and the positive
    * rate an exact integer ratio, so every engine reproduces the bins
    * bit-for-bit. Output: `(bin, n, mean_score, frac_pos)`.
    */
  def calibrationOfTrained(docs: DataFrame, rounds: Int,
                           lr: Double): DataFrame =
    calibrationOfWeights(docs,
      trainWeights(docFeatures(docs), featureNames, rounds, lr))

  /** Streaming-safe APPLY of a persisted classifier: score documents
    * map-only with explicit (artifact-loaded) weights and aggregate per
    * language — `(lang, n, n_flagged, mean_score)`, flagged at score ≥ ½.
    * ONE aggregate (complete-mode-legal on a stream: counts and the
    * exact-decimal score sum are micro-batch-order-free), so the batch
    * and streaming answers are identical by construction.
    */
  def scoreByLang(docs: DataFrame, w: Array[Double]): DataFrame = {
    val dec6 = DecimalType(18, 6)
    val feats = docs.select(col("lang"),
      lit(1.0d).as("x0"),
      round(col("n_chars").cast("double") / 1000.0d, 6).as("x1"),
      round(size(tokens(col("text"))).cast("double") / 100.0d, 6).as("x2"))
    val z = featureNames.zip(w).map { case (n, wv) => col(n) * lit(wv) }
      .reduceLeft(_ + _)
    feats.select(col("lang"), sigmoid6(z).as("score"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum((col("score") >= 0.5d).cast("long")).as("n_flagged"),
        sum(col("score").cast(dec6)).as("ssum"))
      .select(col("lang"), col("n"), col("n_flagged"),
        round(col("ssum").cast("double") / col("n"), 6).as("mean_score"))
  }

  /** The APPLY half of [[calibrationOfTrained]]: bin the corpus with an
    * explicit (artifact-loaded) weight vector — one map-only scan into
    * ≤ 100 groups, no training job.
    */
  def calibrationOfWeights(docs: DataFrame, w: Array[Double]): DataFrame = {
    val z = featureNames.zip(w).map { case (n, wv) => col(n) * lit(wv) }
      .reduceLeft(_ + _)
    val dec6 = DecimalType(18, 6)
    docFeatures(docs).select(sigmoid6(z).as("score"), col("y"))
      .select(least(lit(99L), floor(col("score") * 100).cast("long")).as("bin"),
        col("score"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("score").cast(dec6)).as("ssum"),
        sum(col("y")).as("ysum"))
      .select(col("bin"), col("n"),
        round(col("ssum").cast("double") / col("n"), 6).as("mean_score"),
        round(col("ysum") / col("n"), 6).as("frac_pos"))
  }

  private def roundTo(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble
}
