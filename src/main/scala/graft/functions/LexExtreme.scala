package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Current extreme, as a defensively-copied Catalyst value; `null` =
  * no non-null input seen (SQL MIN/MAX semantics).
  */
final class LexExtremeState(var value: Any)

/** `lex_min(e)` / `lex_max(e)` — MIN/MAX over ANY orderable Catalyst type
  * (strings, structs, arrays) as a [[TypedImperativeAggregate]], value-
  * identical to the built-in `min`/`max`.
  *
  * Why it exists: the built-in declarative Min/Max keep their buffer
  * INSIDE the UnsafeRow aggregation buffer, which only supports mutable
  * fixed-width types — so `min(string)` or `min(struct(...))` (the
  * keep-first/keep-best reduction of every dedup pipeline) silently falls
  * back to SortAggregate, which SORTS each partition's rows before
  * aggregating. At 100 TB that per-partition O(n log n) sort — and the
  * sort it forces onto the shuffle's reduce side — IS the query cost.
  * A typed-imperative buffer lives on the JVM heap instead, so the same
  * reduction plans as ObjectHashAggregate: one O(1)-state comparison per
  * row, partial (map-side) aggregation, no sort anywhere.
  *
  * Ordering is Catalyst's own interpreted ordering for the input type —
  * identical comparison semantics to the SortAggregate path and to a SQL
  * oracle's `min`/`max`, so swapping the function never changes a result.
  */
case class LexExtreme(
    child: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LexExtremeState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support ordering on ${child.dataType.catalogString}")

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType))

  private def better(candidate: Any, incumbent: Any): Boolean =
    incumbent == null || {
      val c = ordering.compare(candidate, incumbent)
      if (isMin) c < 0 else c > 0
    }

  override def createAggregationBuffer(): LexExtremeState =
    new LexExtremeState(null)

  override def update(buf: LexExtremeState, input: InternalRow): LexExtremeState = {
    val v = child.eval(input)
    // copy before keeping: eval of strings/structs returns buffers the
    // scan reuses for the next row
    if (v != null && better(v, buf.value)) buf.value = InternalRow.copyValue(v)
    buf
  }

  override def merge(buf: LexExtremeState, other: LexExtremeState): LexExtremeState = {
    if (other.value != null && better(other.value, buf.value))
      buf.value = other.value
    buf
  }

  override def eval(buf: LexExtremeState): Any = buf.value

  override def serialize(buf: LexExtremeState): Array[Byte] =
    if (buf.value == null) Array.emptyByteArray
    else proj(InternalRow(buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): LexExtremeState =
    if (bytes.isEmpty) new LexExtremeState(null)
    else {
      val row = new UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      new LexExtremeState(InternalRow.copyValue(row.get(0, child.dataType)))
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): LexExtreme =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LexExtreme =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LexExtreme =
    copy(child = newChildren(0))
  override def prettyName: String = if (isMin) "lex_min" else "lex_max"
}
