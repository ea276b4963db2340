package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import graft.ops.HybridSort

/** The reference's whole pipeline — scatter → per-node hybrid
  * quicksort+insertion sort → ordered gather
  * (`/root/reference/QuickInsertionHeap.c:197-215`) — as a first-class
  * Catalyst *physical operator*, not just a rewrite to `orderBy`.
  *
  * `global = true` declares `OrderedDistribution(order)` as the required
  * child distribution, so `EnsureRequirements` inserts a range-partitioning
  * shuffle: Spark's sampled range scatter standing in for the reference's
  * root-computed `Scatterv` counts (`QuickInsertionHeap.c:164-187`). Each
  * task then runs the literal hybrid algorithm
  * (`SequentialQuickInsert.c:40-52`, threshold knob
  * `quickThreshold.c:188-191`) over its partition, comparator supplied by
  * Catalyst's generated row ordering — so the operator sorts ANY schema by
  * ANY key set, not just the reference's bare ints. Downstream consumption
  * in partition-index order is the gather/merge; no single-node k-way merge
  * exists anywhere (the reference's rank-0 merge is its scale ceiling).
  *
  * Scale honesty: `HybridSortExec` materializes each partition on-heap —
  * the reference's own in-memory contract (`malloc` of the full chunk,
  * `QuickInsertionHeap.c:181`) — so unlike `SortExec` (Tungsten
  * `UnsafeExternalSorter`) it cannot spill. Partitions must fit in executor
  * memory; size `spark.sql.shuffle.partitions` accordingly — and note AQE
  * partition coalescing merges by SERIALIZED shuffle bytes (64 MB
  * advisory), while this operator's live-heap footprint is ~8× its
  * shuffle bytes, so disable coalescing (or shrink the advisory size)
  * when running it at volume (measured: 200M rows OOM a 8g heap under
  * coalescing, run clean at 256 pinned partitions — `graft.Scale`). The production
  * default remains [[graft.ops.Sorts.globalSort]]; this operator exists for
  * algorithm-level parity and as the engine's planner-extension showcase
  * (logical node + strategy + exec, injected via [[graft.GraftExtensions]]).
  */
case class HybridSortPlan(order: Seq[SortOrder], threshold: Int,
                          global: Boolean, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): HybridSortPlan =
    copy(child = newChild)
}

/** Planner strategy: maps the logical node to its physical operator.
  * Injected cluster-wide by `graft.GraftExtensions`
  * (`injectPlannerStrategy`) or per-session via
  * `spark.experimental.extraStrategies`.
  */
object HybridSortStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case HybridSortPlan(order, threshold, global, child) =>
      HybridSortExec(order, threshold, global, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical hybrid sort: requires a range-partitioned child when `global`,
  * sorts each partition in-memory with the reference's algorithm.
  */
case class HybridSortExec(order: Seq[SortOrder], threshold: Int,
                          global: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String = "GraftHybridSort"

  override def requiredChildDistribution: Seq[Distribution] =
    if (global) OrderedDistribution(order) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // LazilyGeneratedOrdering is serializable and regenerates its codegen'd
    // comparator on each executor after deserialization.
    val ord = new LazilyGeneratedOrdering(order, child.output)
    val t = threshold
    child.execute().mapPartitions({ iter =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      // rows from the shuffle reader are reused mutable buffers — copy
      while (iter.hasNext) buf += iter.next().copy()
      val arr = buf.toArray
      if (arr.length > 1) HybridSort.sortRangeO(arr, 0, arr.length - 1, ord, t)
      arr.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): HybridSortExec =
    copy(child = newChild)
}
