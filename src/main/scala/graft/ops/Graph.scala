package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed graph primitives as declarative plans. Like
  * [[Similarity.kmeansStep]], iterative algorithms surface here as ONE
  * verifiable iteration — a driver loop composes them (each round is the
  * same plan over the previous round's output), so proving the step
  * proves the loop.
  */
object Graph {

  private val Dec = DecimalType(38, 18)

  /** One PageRank iteration from the uniform start vector over a directed
    * edge list (multi-edges count once each, the multigraph convention):
    *
    *   r1(v) = (1 − d)/N + d · Σ_{(u→v)} r0(u) / outdeg(u),  r0 = 1/N.
    *
    * Dangling nodes keep their mass (no redistribution) — documented
    * choice, mirrored by the oracle.
    *
    * Scale shape — the canonical edge-list formulation, never an
    * adjacency matrix: out-degrees are one src-keyed aggregate; each edge
    * picks up its source's contribution through a join ON THE SAME src
    * partitioning (no extra exchange); incoming mass is one dst-keyed
    * aggregate. N rides along as a broadcast 1-row table. Per-edge
    * contributions are 15-dp-quantized and summed as exact decimals so
    * the rank is independent of shuffle fold order — the float-sum trap
    * of every distributed PageRank.
    */
  def pagerankStep(edges: DataFrame, damping: Double = 0.85): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .distinct()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n"))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val contrib = edges.join(outdeg, "src")
      .crossJoin(broadcast(nRow))
      .select(col("dst"),
        round(lit(damping) * (lit(1.0d) / col("n")) / col("outdeg"), 15)
          .cast(Dec).as("c"))
    val inMass = contrib.groupBy(col("dst")).agg(sum(col("c")).as("mass"))
    nodes.crossJoin(broadcast(nRow))
      .join(inMass, col("node") === col("dst"), "left")
      .select(col("node"),
        round(coalesce(col("mass").cast("double"), lit(0.0d))
          + lit(1.0d - damping) / col("n"), 9).as("rank"))
  }
}
