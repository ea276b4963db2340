package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `h60(str)` — the engine's portable 60-bit hash as a NATIVE codegen'd
  * expression: first 60 bits of md5(utf8(str)) as a non-negative long,
  * bit-identical to the SQL-built-in formulation
  * `conv(substring(md5(s), 1, 15), 16, 10)` and to the DuckDB oracle's
  * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`.
  *
  * Why native: the built-in chain allocates a 32-char hex string, slices
  * it, and runs a BigInteger radix parse PER EVALUATION — tens of µs
  * inside an interpreted higher-order-function lambda. This expression
  * goes digest-bytes → long directly (no hex, no BigInteger) with a
  * thread-local MessageDigest: ~50× less per-row cost on md5-heavy
  * operators (MinHash, fingerprints), which at 100 TB are scan-bound
  * map stages where per-row constants are everything.
  */
case class H60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"h60 requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.h60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.h60($c.getBytes())")

  override def prettyName: String = "h60"
  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)
}

/** Runtime + parameter derivation for [[MinHash31]]. */
object MinHashUtil {

  /** Modulus for the universal-hash family: 2^31 - 1 (prime). Keeps every
    * product `(h % P) * a + b` under 2^62 — no i64 overflow in any engine.
    */
  val P = 2147483647L

  /** Per-function multipliers/offsets, derived from the portable h60 so a
    * SQL oracle regenerates them: a_i ∈ [1, P-1], b_i ∈ [0, P-1].
    */
  def mixA(i: Int): Long = SimHashUtil.h60(s"mh-a:$i") % (P - 1) + 1
  def mixB(i: Int): Long = SimHashUtil.h60(s"mh-b:$i") % P

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def params(k: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(k, kk => (Array.tabulate(kk)(mixA), Array.tabulate(kk)(mixB)))

  /** One pass over the element array: a single md5 per element, k integer
    * mixes — versus k full md5+hex+BigInteger chains per element for the
    * declarative form. Empty input → empty signature.
    */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val (as, bs) = params(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = SimHashUtil.h60(arr.getUTF8String(i).getBytes) % P
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(mins.map(v => v: Any))
  }
}

/** `minhash31(shingles, k)` — k-function MinHash signature of a string
  * array as `array<bigint>`, computed in one native pass.
  *
  * Signature value i is `min over elements of ((h60(x) % P) * a_i + b_i) % P`
  * — a classic universal-hash MinHash family. All parameters derive from
  * the portable md5-based h60, so an independent SQL engine reproduces the
  * exact signature (see SparkEntry's oracle).
  *
  * Replaces the reference-free declarative form (k × `array_min(transform
  * (sh, md5-chain))`), which re-walked the shingle array k times with an
  * interpreted lambda. 100 TB shape: map-only, one md5 per shingle,
  * signatures shuffle as k×8 bytes.
  */
case class MinHash31(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"minhash31: k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash31 requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.minhash($c, $k)")

  override def prettyName: String = "minhash31"
  override protected def withNewChildInternal(newChild: Expression): MinHash31 =
    copy(child = newChild)
}
