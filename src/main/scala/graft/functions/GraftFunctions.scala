package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.ops.HybridSort

/** SQL registration for the engine's native expressions, so they are
  * callable from `expr(...)` / `spark.sql(...)` like built-ins.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("hybrid_sort_array", (exprs: Seq[Expression]) =>
      exprs match {
        case Seq(c) => HybridSortArray(c, HybridSort.DefaultThreshold)
        // Accept only a non-null integral literal threshold, checked here at
        // resolution time — anything else (NULL, strings, non-foldable
        // expressions) gets a clean analysis-time error instead of an
        // opaque NPE/ClassCastException from an eager eval().
        case Seq(c, Literal(t: Number, _)) if t != null =>
          HybridSortArray(c, t.intValue())
        case Seq(_, t) => throw new IllegalArgumentException(
          s"hybrid_sort_array(arr[, threshold]): threshold must be an integer literal, got ${t.sql}")
        case _ => throw new IllegalArgumentException(
          "hybrid_sort_array(arr[, threshold]) takes 1 or 2 arguments")
      }, "built-in")
    reg.createOrReplaceTempFunction("simhash60", (exprs: Seq[Expression]) =>
      SimHash60(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("h60", (exprs: Seq[Expression]) =>
      H60(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("minhash31", (exprs: Seq[Expression]) =>
      exprs match {
        case Seq(c, Literal(kk: Number, _)) if kk != null =>
          MinHash31(c, kk.intValue())
        case _ => throw new IllegalArgumentException(
          "minhash31(shingles, k) takes (array<string>, int literal)")
      }, "built-in")
    reg.createOrReplaceTempFunction("topk_by_score", (exprs: Seq[Expression]) =>
      exprs match {
        case Seq(s, i, Literal(kk: Number, _)) if kk != null =>
          TopKByScore(s, i, kk.intValue())
        case _ => throw new IllegalArgumentException(
          "topk_by_score(score, id, k) takes (double, bigint, int literal)")
      }, "built-in")
  }
}
