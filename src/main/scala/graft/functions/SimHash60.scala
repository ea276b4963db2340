package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Runtime for [[SimHash60]] — static so generated code can call it. */
object SimHashUtil {

  /** Per-thread digest instance: `MessageDigest.getInstance` does a
    * provider lookup per call — measurable at millions of hashes per task.
    */
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8(s)) as a non-negative long; identical to the
    * portable column hash `h60` (and to the DuckDB oracle's
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`).
    */
  def h60(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    ByteBuffer.wrap(md.digest(bytes)).getLong >>> 4
  }

  def h60(s: String): Long = h60(s.getBytes(StandardCharsets.UTF_8))

  /** SimHash over a token array: per bit b of each token's h60, vote +1 if
    * set else -1, weighted by occurrence (tokens are NOT deduplicated);
    * output bit b is 1 iff its vote total is strictly positive.
    */
  def simhash60(tokens: ArrayData): Long = {
    val counters = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        val h = ByteBuffer.wrap(d).getLong >>> 4
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counters(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** `simhash60(tokens)` — 60-bit SimHash fingerprint of a string array.
  *
  * A native Catalyst expression: one pass over the token array per row, no
  * UDF serialization, stays inside whole-stage codegen. At 100 TB this is a
  * map-only projection — fingerprints shuffle as 8-byte longs, and near-dup
  * banding on bit-slices of the result reuses the MinHash-LSH join shape.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash60($c)")

  override def prettyName: String = "simhash60"
  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
