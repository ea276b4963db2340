package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `PqCodes(emb, codebook, subs)` — product-quantization codes of a
  * double-array embedding: the vector is split into `subs` equal
  * sub-vectors and each is replaced by the index of its nearest codebook
  * entry (squared L2 over that sub-range, ties to the smaller index).
  * Returns `array<long>` of length `subs`.
  *
  * One native pass: per row, `subs × |codebook| × subDim` fused
  * multiply-adds against the codebook embedded in the expression — no
  * join, no struct allocation, no interpreted lambdas. The declarative
  * equivalent (an `array_min` over `CreateStruct` distances per
  * sub-space) builds ~1k expression nodes and falls out of efficient
  * codegen; this replaces it at >100× lower per-row cost
  * (`NativeExprEquivalenceSpec` pins the value equivalence).
  *
  * Arithmetic is pinned to the SQL oracle: each distance accumulates
  * `(e[p]-c[p])²` left-to-right — the same association order as the
  * oracle's explicit `+` chain — so distances, and therefore argmin
  * codes, are bit-identical across engines.
  */
case class PqCodes(child: Expression,
                   codebook: Array[Array[Double]],
                   subs: Int)
  extends UnaryExpression {

  require(codebook.nonEmpty && subs > 0 &&
    codebook.head.length % subs == 0,
    "PqCodes: non-empty codebook with dim divisible by subs required")

  private val dim = codebook.head.length
  private val subDim = dim / subs

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  /** Public for generated code (referenced via addReferenceObj). */
  def encode(e: ArrayData): GenericArrayData = {
    val n = e.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < math.min(n, dim)) {
      if (!e.isNullAt(i)) v(i) = e.getDouble(i)
      i += 1
    }
    val codes = new Array[Long](subs)
    var s = 0
    while (s < subs) {
      val off = s * subDim
      var bestJ = 0L
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < codebook.length) {
        val ce = codebook(j)
        var acc = 0.0d
        var k = 0
        while (k < subDim) {
          val diff = v(off + k) - ce(off + k)
          acc += diff * diff
          k += 1
        }
        if (acc < bestD) { bestD = acc; bestJ = j.toLong }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pq", this, classOf[PqCodes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override def prettyName: String = "pq_codes"
  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}
