package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

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
        case Seq(c, t) =>
          HybridSortArray(c, t.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "hybrid_sort_array(arr[, threshold]) takes 1 or 2 arguments")
      }, "built-in")
    reg.createOrReplaceTempFunction("simhash60", (exprs: Seq[Expression]) =>
      SimHash60(exprs.head), "built-in")
  }
}
