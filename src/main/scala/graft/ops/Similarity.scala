package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, both fully declarative (no driver-side loops, no UDFs — the
  * dot products are Catalyst higher-order functions, codegen'd):
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is expected to
  *    be small (it is broadcast); the corpus side streams. Per query the
  *    plan is a broadcast nested-loop join + `TakeOrderedAndProject`-style
  *    windowed top-k — at 100 TB the corpus is scanned once, never shuffled,
  *    and only `k` rows per query survive the partial top-k.
  *
  *  - [[ivfTopK]]: IVF (inverted-file) ANN. A deterministic centroid subset
  *    partitions the corpus into cells ("coarse quantizer"); each query
  *    probes only its own cell, cutting the scanned fraction to ~1/nCells.
  *    Cell assignment is itself a broadcast argmin — the corpus is again
  *    never shuffled, and the cell id becomes a pre-filter that composes
  *    with partition pruning if the corpus is written bucketed by cell.
  *
  * Floating point is pinned for oracle portability: all arithmetic is done
  * in double with a left-fold accumulation (`aggregate`), matching a
  * sequential SQL `list_reduce`/`list_dot_product`, and results are rounded
  * before comparison.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Cast float embedding to double once, so all downstream arithmetic is
    * double-precision in every engine.
    */
  def asDouble(emb: Column): Column = transform(emb, x => x.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (id, embedding float array) — the big side
    * @param queries (id, embedding float array) — the small side, broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), asDouble(col(embCol)).as("c_emb"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(embCol)).as("q_emb"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("q_emb"), col("c_emb")), 6).as("cos_sim"))
    topPerKey(scored, k)
  }

  /** IVF ANN: centroids are the corpus rows whose id is divisible by
    * `centroidStride` (deterministic, engine-agnostic "training"). Every
    * vector is assigned to its nearest centroid (its *cell*); a query is
    * answered from its own cell only — approximate by construction.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              centroidStride: Int,
              idCol: String = "vec_id",
              embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("nbr_id"),
      asDouble(col(embCol)).as("c_emb"))
    val cells = assignCells(c, "nbr_id", "c_emb", centroidStride)
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      asDouble(col(embCol)).as("q_emb"))
    val qCells = assignCells(q, "query_id", "q_emb", centroidStride,
      corpusForCentroids = Some(c))
    val scored = cells.join(broadcast(qCells), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("q_emb"), col("c_emb")), 6).as("cos_sim"))
    topPerKey(scored, k)
  }

  /** Nearest-centroid (max cosine) cell id per row; ties broken by smaller
    * centroid id. Centroids are broadcast — the big side never shuffles.
    */
  private def assignCells(df: DataFrame, idName: String, embName: String,
                          stride: Int,
                          corpusForCentroids: Option[DataFrame] = None): DataFrame = {
    val base = corpusForCentroids.getOrElse(df)
    val cents = base.where(col(base.columns(0)) % stride === 0)
      .select(col(base.columns(0)).as("cent_id"), col(base.columns(1)).as("cent_emb"))
    df.crossJoin(broadcast(cents))
      .select(col(idName), col(embName),
        col("cent_id"),
        cosine(col(embName), col("cent_emb")).as("cent_sim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idName))
          .orderBy(col("cent_sim").desc, col("cent_id").asc)))
      .where(col("rn") === 1)
      .select(col(idName), col(embName), col("cent_id").as("cell"))
  }

  /** Per-query top-k by similarity (desc), deterministic tie-break on id. */
  private def topPerKey(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("nbr_id").asc)))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("cos_sim"))
}
