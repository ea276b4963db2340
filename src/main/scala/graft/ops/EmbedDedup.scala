package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SimHashUtil

/** Embedding-cosine near-duplicate detection — the vector-space sibling of
  * the text LSH in [[Dedup]].
  *
  * Pipeline (all-declarative, same scale shape as MinHash-LSH):
  *
  *  1. **Signature** (map-only): each embedding is reduced to `Bits` sign
  *     bits against a fixed set of random hyperplanes (sign-random-
  *     projection / SRP-LSH). P(bit match) = 1 - θ/π for angle θ, so
  *     near-parallel vectors share most bits.
  *  2. **Banding**: the bit string splits into `Bands` bands; vectors
  *     agreeing on ALL bits of some band become candidate pairs via a
  *     bucketed equi-join on (band, bucket) — never an all-pairs join.
  *     A `maxBucket` guard bounds the per-bucket pair blow-up, exactly as
  *     in [[Dedup.minhashPairs]].
  *  3. **Refine** (exact): candidates are joined back to their embeddings
  *     and kept iff exact cosine ≥ `minCosine`.
  *
  * At 100 TB: stage 1 is scan-speed, stage 2 shuffles 8-byte keys + ids,
  * stage 3 touches only the candidate set. No stage is quadratic in the
  * corpus.
  *
  * The hyperplanes are deterministic: component (b, i) derives from the
  * portable md5-based h60 hash, so an independent SQL engine regenerates
  * the identical planes and signatures (see SparkEntry's oracle).
  */
object EmbedDedup {

  /** 4 bands × 8 bits: 256 buckets per band. Band width must scale with
    * corpus size — with w-bit bands the expected bucket holds n/2^w
    * vectors and candidate pairs grow as n²/2^w per band; 4-bit bands
    * (16 buckets) already produce ~n²/32 pairs at n=2000, which made the
    * exact-cosine refine the whole query. 8 bits keeps buckets sparse at
    * test scale; at larger n, raise w (or bands) the same way MinHash-LSH
    * banding is tuned.
    */
  val Bits = 32
  val Bands = 4 // 8 bits per band

  /** Hyperplane component in [-1, 1] with 3 decimal digits — small exact
    * decimals so `emb * plane` products are bit-identical across engines.
    */
  def planeVal(b: Int, i: Int): Double =
    (SimHashUtil.h60(s"p:$b:$i") % 2001L - 1000L) / 1000.0d

  /** `Bits` hyperplanes for a `dim`-dimensional space. */
  def planes(dim: Int): Array[Array[Double]] =
    Array.tabulate(Bits, dim)(planeVal)

  /** (id, band, bucket) rows: one row per band per vector; bucket is the
    * band's bit-string slice of the [[graft.functions.SrpBits]] signature
    * (all `Bits` dot products in one native pass). Map-only (the explode
    * multiplies rows by `Bands`, a constant, before the join shuffle).
    */
  def srpBuckets(embs: DataFrame, dim: Int,
                 idCol: String = "vec_id",
                 embCol: String = "embedding"): DataFrame = {
    val r = Bits / Bands
    val bits = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SrpBits(
        org.apache.spark.sql.GraftColumnBridge.expression(
          Similarity.asDouble(col(embCol))),
        planes(dim)))
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        substring(col("bits"), b * r + 1, r).as("bucket"))
    }
    embs.select(col(idCol).cast("long").as("id"), bits.as("bits"))
      .select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Near-duplicate pairs by exact cosine ≥ `minCosine`, restricted to
    * SRP-LSH candidates. Output: (id_a, id_b, cos_sim) with id_a < id_b.
    */
  def nearDupPairs(embs: DataFrame, dim: Int, minCosine: Double,
                   maxBucket: Int = 1000,
                   idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame = {
    val buckets = srpBuckets(embs, dim, idCol, embCol).localCheckpoint()
    val small = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n")).where(col("n") <= maxBucket)
      .select(col("band"), col("bucket"))
    val b = buckets.join(small, Seq("band", "bucket"))
    val cand = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val e = embs.select(col(idCol).cast("long").as("id"),
        Similarity.asDouble(col(embCol)).as("e"))
      .withColumn("nrm", sqrt(Similarity.dot(col("e"), col("e"))))
      .localCheckpoint()
    cand
      .join(e.select(col("id").as("id_a"), col("e").as("e_a"), col("nrm").as("n_a")), "id_a")
      .join(e.select(col("id").as("id_b"), col("e").as("e_b"), col("nrm").as("n_b")), "id_b")
      .withColumn("cos_sim",
        round(Similarity.cosineFromNorms(
          Similarity.dot(col("e_a"), col("e_b")), col("n_a"), col("n_b")), 6))
      .where(col("cos_sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }
}
