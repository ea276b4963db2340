package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `SrpBits(emb, planes)` — sign-random-projection signature of a double
  * array against a fixed hyperplane set, as a '0'/'1' bit string (bit b =
  * 1 iff `emb · planes(b) ≥ 0`).
  *
  * Native single pass: all `planes.length` dot products are computed in
  * one loop over the embedding — versus one interpreted
  * `aggregate(zip_with(...))` lambda chain PER BIT in the declarative
  * form. Dot products accumulate in index order (a left fold), matching
  * both the declarative `aggregate` and the SQL oracle's
  * `list_sum(list_transform(...))`, so the sign at the decision boundary
  * is bit-identical across engines.
  *
  * 100 TB shape: map-only over the corpus; the signature shuffles as a
  * ≤ `Bits`-byte string. Codegen'd: generated code calls [[SrpBits.bits]]
  * directly (the expression instance is attached via `addReferenceObj`).
  */
case class SrpBits(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_bits requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    bits(input.asInstanceOf[ArrayData])

  /** Public for generated code (referenced via addReferenceObj). */
  def bits(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val out = new Array[Byte](planes.length)
    var b = 0
    while (b < planes.length) {
      val plane = planes(b)
      val d = math.min(n, plane.length)
      var acc = 0.0d
      var i = 0
      while (i < d) {
        if (!arr.isNullAt(i)) acc += arr.getDouble(i) * plane(i)
        i += 1
      }
      out(b) = if (acc >= 0.0d) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srp", this, classOf[SrpBits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bits($c)")
  }

  override def prettyName: String = "srp_bits"
  override protected def withNewChildInternal(newChild: Expression): SrpBits =
    copy(child = newChild)
}
