package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic data sources — the reference's only "scan" operator.
  *
  * The reference materializes a single int column three ways (see
  * `/root/reference/SequentialQuickInsert.c:66-70` product distribution,
  * `/root/reference/quickThreshold.c:147,166-168` uniform %1e6 with fixed
  * seed 42, `/root/reference/QuickInsertionHeap.cu:142-145` uniform %5e6).
  * Spark restatement: `spark.range(n)` is an embarrassingly parallel,
  * partitioned long source — it scales linearly with executors and never
  * materializes on the driver, so the same code serves 1e3 rows and 1e12.
  */
object Gen {

  /** Uniform ints in `[0, bound)`, Spark-native RNG with a fixed seed.
    * Mirrors `rand() % bound` with `srand(42)` (`quickThreshold.c:147,167`).
    */
  def randInts(spark: SparkSession, n: Long, seed: Long = 42L,
               bound: Int = 1000000): DataFrame =
    spark.range(n).select(
      (rand(seed) * bound).cast("int").as("value"))

  /** Product-of-uniforms distribution `(rand()*rand()) % 5e6` — the
    * non-uniform variant at `SequentialQuickInsert.c:68`. Skews small.
    */
  def randIntsProduct(spark: SparkSession, n: Long, seed: Long = 42L,
                      bound: Int = 5000000): DataFrame =
    spark.range(n).select(
      ((rand(seed) * rand(seed + 1) * bound.toLong * bound.toLong)
        .cast("long") % bound).cast("int").as("value"))

  /** Deterministic multiplicative-congruential values — identical in any
    * engine with 64-bit integer arithmetic, so a DuckDB oracle can
    * regenerate the exact rows. The id is reduced mod 2^31-1 *before* the
    * Knuth multiply so the product stays under 2^63 for any id (2^31-1 ·
    * 2654435761 ≈ 5.7e18 < Long.MaxValue): no silent Spark wraparound, no
    * DuckDB i64-overflow error, at any scale. Spark's `rand` stream is
    * implementation-defined and not reproducible elsewhere — this is the
    * generator used for cross-engine sort-parity checks.
    */
  val LcgDomain = 2147483647L // 2^31 - 1: LcgDomain * 2654435761 < 2^63

  def lcgInts(spark: SparkSession, n: Long, bound: Long = 5000000L): DataFrame =
    spark.range(n).select(
      (((col("id") % LcgDomain) * 2654435761L) % bound).as("value"),
      col("id"))

  /** Knuth-style multiplicative hash as a Column, for salting/shingling.
    * Same overflow-safe domain reduction as [[lcgInts]].
    */
  def mixCol(c: Column, bound: Long): Column =
    ((c % LcgDomain) * 2654435761L) % bound
}
