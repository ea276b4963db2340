package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra-Gries (frequent-items) state: at most k counters.
  *
  * Invariants (Misra & Gries 1982; merging per Agarwal et al., "Mergeable
  * summaries", PODS 2012 — both public literature):
  *   - `cnt(item)` is an UNDER-estimate: cnt ≤ true_count;
  *   - `totalDec` (the cumulative decrement, ≤ n/(k+1) under any merge
  *     tree) bounds the loss: true_count ≤ cnt + totalDec — for ABSENT
  *     items too (cnt = 0), which is what guarantees any item with
  *     true_count > n/(k+1) is present in the summary.
  *
  * The classic "decrement ALL k counters" step is O(1) here: counters are
  * stored as `stored = effective + base` against a global `base`, so a
  * decrement round is `base += 1` and an item dies when `stored ≤ base`.
  * Eviction order needs the minimum counter; counters only grow by 1, so
  * a LAZY min-heap works — every increment pushes a fresh
  * (stored, item) snapshot, reads discard stale ones, and each decrement
  * round purges the newly-dead items from the heap top (their fresh
  * snapshots are exactly the entries with stored ≤ base). The heap is
  * rebuilt when it outgrows 4k entries, keeping updates O(log k)
  * amortized and memory O(k) — per aggregation group, regardless of
  * stream length. That bounded state is the point at corpus scale: the
  * sketch shuffles ONE k-entry summary per task, never the distinct-key
  * set.
  */
final class MisraGriesState(val k: Int) {
  /** item → stored counter (effective count = stored − base). All mapped
    * items are live (stored > base): deaths are purged eagerly at each
    * decrement round, so `stored.size()` is the live-counter count.
    * Values are BOXED `java.lang.Long`, not Scala `Long`: with a
    * primitive value type, `get` on a missing key silently unboxes null
    * to 0 and `!= null` is constant-true, which turns the absent-item
    * branch into an insert — the map then grows with the distinct-key
    * count, the exact unboundedness this sketch exists to avoid.
    */
  val stored = new java.util.HashMap[String, java.lang.Long]()
  var base: Long = 0L
  var totalDec: Long = 0L
  var n: Long = 0L

  // (stored snapshot, item); min stored first, larger item first on ties
  // so the lexicographically-smaller item survives a tied eviction.
  private val heap = new java.util.PriorityQueue[(Long, String)](
    math.max(k, 1),
    new java.util.Comparator[(Long, String)] {
      override def compare(a: (Long, String), b: (Long, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else b._2.compareTo(a._2)
      }
    })

  /** Diagnostic: current lazy-heap entry count (live + stale). */
  def heapSize: Int = heap.size()

  def rebuildHeap(): Unit = {
    heap.clear()
    val it = stored.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); heap.add((e.getValue, e.getKey)) }
  }

  def update(item: String): Unit = {
    n += 1
    val cur = stored.get(item)
    if (cur != null) {
      val c1 = cur.longValue() + 1
      stored.put(item, c1)
      heap.add((c1, item))
    } else if (stored.size() < k) {
      stored.put(item, base + 1)
      heap.add((base + 1, item))
    } else {
      // Full and item absent: Misra-Gries decrements every counter (the
      // arrival itself is not credited). O(1) via the shared base, then
      // purge newly-dead items: each mapped item has exactly one FRESH
      // heap entry (snapshot == its current stored), so the fresh entries
      // with stored ≤ base are the dead items; stale entries (snapshot ≠
      // current stored, or item already unmapped) are discarded on sight.
      base += 1
      totalDec += 1
      var top = heap.peek()
      while (top != null && top._1 <= base) {
        heap.poll()
        val c = stored.get(top._2)
        if (c != null && c.longValue() == top._1) stored.remove(top._2)
        top = heap.peek()
      }
    }
    if (heap.size() > 4 * k + 8) rebuildHeap()
  }

  /** Effective counts (item, cnt) — cnt desc, item asc. */
  def sortedDesc: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](stored.size())
    val it = stored.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); arr(i) = (e.getKey, e.getValue.longValue() - base); i += 1
    }
    java.util.Arrays.sort(arr, new java.util.Comparator[(String, Long)] {
      override def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    arr
  }

  /** Merge per Agarwal et al.: sum effective counts over the union; if
    * more than k survive, subtract the (k+1)-th largest count from every
    * counter and drop the non-positive — that subtraction joins the
    * cumulative decrement, preserving both bounds under any merge tree.
    */
  def mergeFrom(o: MisraGriesState): Unit = {
    n += o.n
    totalDec += o.totalDec
    val merged = new java.util.HashMap[String, java.lang.Long]()
    val it1 = stored.entrySet().iterator()
    while (it1.hasNext) {
      val e = it1.next(); merged.put(e.getKey, e.getValue.longValue() - base)
    }
    val it2 = o.stored.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val eff = e.getValue.longValue() - o.base
      val cur = merged.get(e.getKey)
      merged.put(e.getKey, if (cur == null) eff else cur.longValue() + eff)
    }
    var cut = 0L
    if (merged.size() > k) {
      val effs = new Array[Long](merged.size())
      val vit = merged.values().iterator()
      var i = 0
      while (vit.hasNext) { effs(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(effs)
      cut = effs(effs.length - k - 1) // (k+1)-th largest
      totalDec += cut
    }
    stored.clear()
    base = 0L
    val mit = merged.entrySet().iterator()
    while (mit.hasNext) {
      val e = mit.next()
      val eff = e.getValue.longValue() - cut
      if (eff > 0) stored.put(e.getKey, eff)
    }
    rebuildHeap()
  }
}

/** `misra_gries(item, k)` — bounded frequent-items sketch aggregate.
  *
  * Returns `array<struct<item string, cnt bigint, err bigint>>`, count
  * desc: for each retained item, `cnt` is a lower bound on its true
  * count, `cnt + err` an upper bound (err = the summary's cumulative
  * decrement, ≤ n/(k+1)); any item with true count > err — in particular
  * anything above n/(k+1) — is guaranteed retained.
  *
  * As a `TypedImperativeAggregate` it participates in partial
  * aggregation: each map task reduces its split to one ≤ k-entry summary
  * before the shuffle, so finding corpus heavy hitters moves
  * O(k · numPartitions) bytes — never the full distinct-key set an exact
  * `groupBy` would shuffle. Pair with an exact count over the (≤ k)
  * candidates for exact heavy hitters in two bounded passes
  * ([[graft.ops.TextStats.heavyHitters]]).
  */
case class MisraGries(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesState] {

  require(k > 0, s"misra_gries: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = itemExpr.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries(item string, k) got ${t.catalogString}")
  }

  override def createAggregationBuffer(): MisraGriesState = new MisraGriesState(k)

  override def update(buf: MisraGriesState, input: InternalRow): MisraGriesState = {
    val v = itemExpr.eval(input)
    // .toString copies out of Spark's reusable UTF8String buffer.
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MisraGriesState, other: MisraGriesState): MisraGriesState = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MisraGriesState): Any = {
    val es = buf.sortedDesc
    val rows = new Array[Any](es.length)
    var i = 0
    while (i < es.length) {
      rows(i) = InternalRow(UTF8String.fromString(es(i)._1), es(i)._2, buf.totalDec)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MisraGriesState): Array[Byte] = {
    val es = buf.sortedDesc
    val itemBytes = es.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      16 + 4 + itemBytes.map(_.length + 4 + 8).sum)
    bb.putLong(buf.n)
    bb.putLong(buf.totalDec)
    bb.putInt(es.length)
    var i = 0
    while (i < es.length) {
      bb.putInt(itemBytes(i).length); bb.put(itemBytes(i))
      bb.putLong(es(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new MisraGriesState(k)
    st.n = bb.getLong
    st.totalDec = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      st.stored.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    st.rebuildHeap()
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(itemExpr = newChildren(0))
  override def prettyName: String = "misra_gries"
}
