package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `NearestCentroid(emb, centroids)` — id of the max-cosine centroid for a
  * double-array embedding, as one native pass over a broadcast-style
  * centroid table embedded in the expression.
  *
  * Tie/edge semantics (pinned to the SQL oracle):
  *  - cosine is rounded to 6dp BEFORE the argmax, so rank ties resolve
  *    identically to an oracle ranking rounded similarities;
  *  - ties break toward the SMALLER centroid id;
  *  - zero-norm embeddings (or zero-norm centroids) score 0.0, never NaN.
  *
  * Replaces the declarative `array_max(transform(centArrayLiteral, ...))`
  * argmax, which evaluated an interpreted lambda per centroid per row. At
  * 100 TB this is THE corpus-side map stage of IVF assignment: per-row
  * cost is |centroids| native dot products, no join, no shuffle, no
  * struct allocation.
  */
case class NearestCentroid(child: Expression,
                           centIds: Array[Long],
                           centEmbs: Array[Array[Double]],
                           centNorms: Array[Double])
  extends UnaryExpression {

  require(centIds.length == centEmbs.length && centIds.length == centNorms.length
    && centIds.nonEmpty, "NearestCentroid: non-empty, aligned centroid arrays required")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  /** Public for generated code (referenced via addReferenceObj). */
  def assign(e: ArrayData): Long = {
    val n = e.numElements()
    val v = new Array[Double](n)
    var i = 0
    var sq = 0.0d
    while (i < n) {
      if (!e.isNullAt(i)) v(i) = e.getDouble(i)
      sq += v(i) * v(i)
      i += 1
    }
    val nrm = math.sqrt(sq)
    var bestId = Long.MaxValue
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < centIds.length) {
      val ce = centEmbs(c)
      val d = math.min(n, ce.length)
      var acc = 0.0d
      var j = 0
      while (j < d) { acc += v(j) * ce(j); j += 1 }
      val denom = nrm * centNorms(c)
      val cos = if (denom > 0) acc / denom else 0.0d
      val r = BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (r > bestCos || (r == bestCos && centIds(c) < bestId)) {
        bestCos = r
        bestId = centIds(c)
      }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nc", this, classOf[NearestCentroid].getName)
    defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
  }

  override def prettyName: String = "nearest_centroid"
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
