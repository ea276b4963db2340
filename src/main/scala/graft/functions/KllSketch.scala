package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable PRIMITIVE double buffer — the level store. A
  * `mutable.ArrayBuffer[Double]` would box every element (200M boxed
  * Doubles of garbage on a 2e8-row update stream); this is `add` into a
  * bare `Array[Double]` with amortized doubling.
  */
final class DoubleBuf(initial: Int = 16) {
  var arr: Array[Double] = new Array[Double](initial)
  var len: Int = 0
  def add(x: Double): Unit = {
    if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(len) = x
    len += 1
  }
  def clear(): Unit = len = 0
}

/** Mutable KLL/MRL-style quantile-sketch state: a stack of level buffers
  * where level ℓ holds items of weight 2^ℓ, each buffer at most `k` items.
  *
  * Public-literature lineage: Munro & Paterson 1980 (selection in limited
  * storage), Manku–Rajagopalan–Lindsay SIGMOD 1998 (the level/compaction
  * scheme), Karnin–Lang–Liberty FOCS 2016 (KLL; our fixed per-level
  * capacity is the simpler MRL layout with KLL's accounting). Compaction
  * sorts a full buffer and promotes every other item to the next level at
  * doubled weight; which parity survives alternates deterministically per
  * level (`flips`), halving systematic drift without randomness — the
  * engine's oracle contract needs deterministic OUTPUT, and the guarantee
  * below is deterministic regardless of parity choices.
  *
  * **Certified error accounting.** For any query value x, let
  * `R(x) = Σ_{item v ≤ x} w(item)` over the summary. Compacting an even
  * buffer of m items at weight w changes R(x) by at most w (keep-odd gives
  * floor(j/2), keep-even ceil(j/2), of the j items ≤ x — either is within
  * w·j ± w of the original mass), and merges/odd-leftovers change nothing.
  * So `|R(x) − trueRank(x)| ≤ errBound` where `errBound` is the running
  * sum of `2^ℓ` over all compactions — tracked exactly in the state and
  * exposed in the result. Downstream consumers ([[graft.ops.Quantiles]])
  * use that certificate to bracket a target rank and then compute EXACT
  * quantiles in one more bounded re-scan, which is what makes a
  * sketch-accelerated quantile oracle-checkable against plain SQL.
  *
  * Bounded state is the point at 100 TB: memory is O(k·log(n/k)) doubles
  * per aggregation group no matter how many rows stream in — the shuffle
  * carries one small summary per task, never the (possibly near-unique)
  * value set that an exact `groupBy(value)` CDF would move.
  */
final class KllState(val k: Int) {
  import scala.collection.mutable.ArrayBuffer

  /** levels(ℓ) = unsorted buffer of items with weight 2^ℓ. */
  val levels: ArrayBuffer[DoubleBuf] = ArrayBuffer(new DoubleBuf(16))
  /** Per-level parity of the next compaction (deterministic alternation). */
  val flips: ArrayBuffer[Boolean] = ArrayBuffer(false)
  var n: Long = 0L
  var errBound: Long = 0L

  def update(x: Double): Unit = {
    n += 1
    levels(0).add(x)
    if (levels(0).len >= k) compact(0)
  }

  /** Weighted update: an integer weight decomposes into its binary bits,
    * and the value enters once at each set bit's level — a level-ℓ item
    * weighs 2^ℓ by construction, so a weight-w row contributes exactly w
    * to every rank, with NO error added (inserts are exact; only
    * compactions spend certificate). This is how "this row counts w
    * times" (token counts, epoch multipliers, pre-aggregated frequencies)
    * rides the same sketch without w-fold replication.
    */
  def updateWeighted(x: Double, w: Long): Unit = {
    if (w <= 0) return
    n += w
    var rem = w
    var l = 0
    while (rem != 0) {
      if ((rem & 1L) == 1L) {
        while (levels.length <= l) addLevel()
        levels(l).add(x)
        if (levels(l).len >= k) compact(l)
      }
      rem >>>= 1
      l += 1
    }
  }

  private def addLevel(): Unit = { levels += new DoubleBuf(16); flips += false }

  /** Sort level ℓ, promote every other item (alternating parity) at
    * doubled weight; an odd straggler stays behind at level ℓ. Cascades
    * when the promotion fills the next level.
    */
  private def compact(l: Int): Unit = {
    val buf = levels(l)
    if (buf.len < 2) return
    if (levels.length == l + 1) addLevel()
    val m = buf.len
    java.util.Arrays.sort(buf.arr, 0, m)
    val even = m - (m % 2)
    val offset = if (flips(l)) 1 else 0
    flips(l) = !flips(l)
    val next = levels(l + 1)
    var i = offset
    while (i < even) { next.add(buf.arr(i)); i += 2 }
    val straggler = if (even < m) buf.arr(even) else 0.0 // odd one keeps weight
    buf.clear()
    if (even < m) buf.add(straggler)
    errBound += 1L << l
    if (next.len >= k) compact(l + 1)
  }

  /** Merge: level-wise concatenation (weights align by construction), then
    * compact any over-full level. n and the error certificates add; the
    * concatenation itself is exact, so the bound survives any merge tree.
    */
  def mergeFrom(o: KllState): Unit = {
    n += o.n
    errBound += o.errBound
    var l = 0
    while (l < o.levels.length) {
      if (levels.length == l) addLevel()
      val src = o.levels(l)
      val dst = levels(l)
      var j = 0
      while (j < src.len) { dst.add(src.arr(j)); j += 1 }
      l += 1
    }
    l = 0
    while (l < levels.length) {
      if (levels(l).len >= k) compact(l)
      l += 1
    }
  }

  /** Summary items (value, weight), value ascending. Σ weight == n. */
  def items: Array[(Double, Long)] = {
    var total = 0
    levels.foreach(b => total += b.len)
    val out = new Array[(Double, Long)](total)
    var i = 0
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      val b = levels(l)
      var j = 0
      while (j < b.len) { out(i) = (b.arr(j), w); i += 1; j += 1 }
      l += 1
    }
    java.util.Arrays.sort(out, new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int =
        java.lang.Double.compare(a._1, b._1)
    })
    out
  }
}

/** `kll_sketch(value[, weight], k)` — bounded mergeable quantile-sketch
  * aggregate.
  *
  * Returns `struct<n bigint, err bigint, items array<struct<v double,
  * w bigint>>>`: the summary items value-ascending with their weights
  * (Σw = n = exact non-null input count, or the exact weight total in
  * the weighted form) and the certified rank-error bound `err` (see
  * [[KllState]]). With a `weight` column each row counts `weight` times
  * toward every rank — binary-decomposed into the matching levels, no
  * replication, no added error. As a `TypedImperativeAggregate` it
  * participates in partial aggregation: each map task reduces its split
  * to one O(k·log(n/k))-entry summary before the shuffle. Pair with one
  * exact windowed re-scan for exact quantiles in two bounded passes
  * ([[graft.ops.Quantiles.exactQuantiles]]).
  */
case class KllSketch(
    valueExpr: Expression,
    weightExpr: Option[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {

  require(k >= 8 && k % 2 == 0, s"kll_sketch: k must be even and >= 8, got $k")

  override def children: Seq[Expression] = valueExpr +: weightExpr.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = KllSketch.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, weightExpr.map(_.dataType)) match {
      case (DoubleType, None | Some(LongType)) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, w) => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch(value double[, weight bigint], k) got " +
          s"${(v +: w.toSeq).map(_.catalogString).mkString(", ")}")
    }

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = valueExpr.eval(input)
    if (v != null) weightExpr match {
      case None => buf.update(v.asInstanceOf[Double])
      case Some(we) =>
        val w = we.eval(input)
        // null or non-positive weight = the row contributes nothing
        // (mirrored by the oracle's WHERE weight > 0)
        if (w != null) buf.updateWeighted(v.asInstanceOf[Double],
          w.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KllState): Any = {
    val es = buf.items
    val rows = new Array[Any](es.length)
    var i = 0
    while (i < es.length) {
      rows(i) = InternalRow(es(i)._1, es(i)._2)
      i += 1
    }
    InternalRow(buf.n, buf.errBound, new GenericArrayData(rows))
  }

  override def serialize(buf: KllState): Array[Byte] = {
    var bytes = 8 + 8 + 4
    buf.levels.foreach(b => bytes += 1 + 4 + 8 * b.len)
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(buf.n)
    bb.putLong(buf.errBound)
    bb.putInt(buf.levels.length)
    var l = 0
    while (l < buf.levels.length) {
      bb.put(if (buf.flips(l)) 1.toByte else 0.toByte)
      val b = buf.levels(l)
      bb.putInt(b.len)
      var j = 0
      while (j < b.len) { bb.putDouble(b.arr(j)); j += 1 }
      l += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KllState(k)
    st.n = bb.getLong
    st.errBound = bb.getLong
    val nl = bb.getInt
    var l = 0
    while (l < nl) {
      if (st.levels.length == l) {
        st.levels += new DoubleBuf(16)
        st.flips += false
      }
      st.flips(l) = bb.get() == 1.toByte
      val m = bb.getInt
      var j = 0
      while (j < m) { st.levels(l).add(bb.getDouble); j += 1 }
      l += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketch =
    copy(valueExpr = newChildren(0),
      weightExpr = weightExpr.map(_ => newChildren(1)))
  override def prettyName: String = "kll_sketch"
}

object KllSketch {
  val resultType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false),
      nullable = false)))
}
