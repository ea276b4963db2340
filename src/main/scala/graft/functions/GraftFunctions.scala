package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.ops.HybridSort

/** SQL surface of the engine's native expressions. Two installation
  * paths, same builders:
  *
  *  - [[GraftFunctions.register]]: imperative per-session registration
  *    (used by the operators themselves);
  *  - [[graft.GraftExtensions]]: declarative, via
  *    `spark.sql.extensions=graft.GraftExtensions` — the idiomatic way to
  *    ship the function library to a whole cluster (every session created
  *    from that config, including Thrift/Connect sessions, gets the
  *    functions without touching application code).
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  /** Resolve an argument that must be an INTEGRAL literal within Int
    * range, at analysis time. The permissive `Literal(n: Number)` +
    * `intValue()` form this replaces silently truncated out-of-range
    * values — `misra_gries(term, 8000000000)` became a small/negative k
    * instead of an argument error.
    */
  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Byte, _)  => v.toInt
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Int, _)   => v
    case Literal(v: Long, _)  =>
      if (v >= Int.MinValue && v <= Int.MaxValue) v.toInt
      else throw new IllegalArgumentException(
        s"$fn: $arg=$v is outside Int range")
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  /** (name, usage, builder) for every engine function. */
  val builders: Seq[(String, String, Builder)] = Seq(
    ("hybrid_sort_array",
      "hybrid_sort_array(arr[, threshold]) - sorts an int array with the quicksort+insertion hybrid",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => HybridSortArray(c, HybridSort.DefaultThreshold)
        // Only an in-range integral literal threshold, checked here at
        // resolution time — anything else (NULL, strings, non-foldable
        // expressions, a long that would truncate) gets a clean
        // analysis-time error instead of an opaque runtime failure.
        case Seq(c, t) =>
          HybridSortArray(c, intLit("hybrid_sort_array", "threshold", t))
        case _ => throw new IllegalArgumentException(
          "hybrid_sort_array(arr[, threshold]) takes 1 or 2 arguments")
      }),
    ("simhash60",
      "simhash60(tokens) - 60-bit SimHash fingerprint of a string array",
      (exprs: Seq[Expression]) => SimHash60(exprs.head)),
    ("h60",
      "h60(str) - first 60 bits of md5(str) as a non-negative bigint",
      (exprs: Seq[Expression]) => H60(exprs.head)),
    ("minhash31",
      "minhash31(shingles, k) - k-function MinHash signature as array<bigint>",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, k) => MinHash31(c, intLit("minhash31", "k", k))
        case _ => throw new IllegalArgumentException(
          "minhash31(shingles, k) takes (array<string>, int literal)")
      }),
    ("topk_by_score",
      "topk_by_score(score, id, k) - bounded-heap top-k aggregate",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s, i, k) => TopKByScore(s, i, intLit("topk_by_score", "k", k))
        case _ => throw new IllegalArgumentException(
          "topk_by_score(score, id, k) takes (double, bigint, int literal)")
      }),
    ("misra_gries",
      "misra_gries(item, k) - bounded Misra-Gries frequent-items sketch aggregate",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, k) => MisraGries(c, intLit("misra_gries", "k", k))
        case _ => throw new IllegalArgumentException(
          "misra_gries(item, k) takes (string, int literal)")
      }),
    ("lex_min",
      "lex_min(e) - min over any orderable type as an ObjectHashAggregate (no SortAggregate fallback)",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => LexExtreme(c, isMin = true)
        case _ => throw new IllegalArgumentException("lex_min(e) takes 1 argument")
      }),
    ("lex_max",
      "lex_max(e) - max over any orderable type as an ObjectHashAggregate (no SortAggregate fallback)",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => LexExtreme(c, isMin = false)
        case _ => throw new IllegalArgumentException("lex_max(e) takes 1 argument")
      }),
    ("kll_sketch",
      "kll_sketch(value[, weight], k) - bounded mergeable quantile sketch with a certified rank-error bound",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, k) => KllSketch(c, None, intLit("kll_sketch", "k", k))
        case Seq(c, w, k) =>
          KllSketch(c, Some(w), intLit("kll_sketch", "k", k))
        case _ => throw new IllegalArgumentException(
          "kll_sketch(value[, weight], k) takes (double[, bigint], int literal)")
      }),
  )

  /** Imperative per-session registration. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Declarative injection for `spark.sql.extensions`. */
  def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, usage, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", null, name, usage, ""),
        b))
    }
}
