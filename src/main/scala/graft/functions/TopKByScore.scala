package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable bounded-heap state for [[TopKByScore]]: keeps the k best
  * (score desc, id asc) pairs seen so far. The heap is ordered worst-first
  * so eviction is O(log k); memory is O(k) per group regardless of input
  * size — this is what makes the aggregate safe on a 100 TB corpus where a
  * window-function top-k would concentrate an entire key's rows on one task.
  */
object TopKState {
  final class Entry(val score: Double, val id: Long)

  /** Worst-first: lower score first; on ties, LARGER id first (so the
    * preferred smaller id survives eviction).
    */
  val WorstFirst: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
  }
}

final class TopKState(val k: Int) {
  import TopKState._
  val heap = new java.util.PriorityQueue[Entry](math.max(k, 1), WorstFirst)

  def insert(score: Double, id: Long): Unit = {
    if (heap.size() < k) { heap.add(new Entry(score, id)); return }
    val w = heap.peek()
    if (score > w.score || (score == w.score && id < w.id)) {
      heap.poll()
      heap.add(new Entry(score, id))
    }
  }

  def mergeFrom(o: TopKState): Unit = {
    val it = o.heap.iterator()
    while (it.hasNext) { val e = it.next(); insert(e.score, e.id) }
  }

  /** Entries best-first: score desc, id asc. */
  def sortedDesc: Array[Entry] = {
    val arr = heap.toArray(new Array[Entry](heap.size()))
    java.util.Arrays.sort(arr, WorstFirst.reversed())
    arr
  }
}

/** `topk_by_score(score, id, k)` — bounded per-group top-k aggregate.
  *
  * Returns `array<struct<cos_sim double, nbr_id bigint>>` of the k rows
  * with the highest score (ties broken by smaller id), sorted best-first.
  *
  * This is the Spark-native restatement of the reference's heap-based
  * k-way merge with bounded emission (`/root/reference/QuickInsertionHeap.c:87-136`
  * keeps a num_procs-slot min-heap; `quickThreshold.c:109,116` emits only
  * the first N values): a `TypedImperativeAggregate` participates in
  * partial aggregation, so each map task reduces its partitions to ≤ k
  * rows per group BEFORE the shuffle — only k·numPartitions rows ever move,
  * versus a window function shuffling the full corpus per key.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0, s"topk_by_score: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos_sim", DoubleType, nullable = false),
    StructField("nbr_id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score(score double, id bigint, k) got (${s.catalogString}, ${i.catalogString})")
    }

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKState): Any = {
    val es = buf.sortedDesc
    val rows = new Array[Any](es.length)
    var i = 0
    while (i < es.length) { rows(i) = InternalRow(es(i).score, es(i).id); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    val arr = buf.sortedDesc
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { e => bb.putDouble(e.score); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new TopKState(k)
    var i = 0
    while (i < n) { st.insert(bb.getDouble, bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "topk_by_score"
}
