package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: how a 100 TB table is physically arranged so
  * later scans prune. The reference's only layout decision is its scatter
  * (`/root/reference/QuickInsertionHeap.c:164-187` — one sort key, one
  * range split); real lakehouse tables need MULTI-dimensional locality,
  * which a single-column range sort cannot give (sorting by `a` scatters
  * `b` uniformly through every file).
  */
object Layout {

  /** Z-order (Morton) value of two non-negative dimensions: bit i of `a`
    * lands at position 2i+1, bit i of `b` at position 2i, so rows close in
    * BOTH dimensions get close z-values. Pure long shift/mask arithmetic —
    * an unrolled sum of `((x >> i) & 1) << p` terms, codegen'd by Spark and
    * replayable verbatim in any SQL engine (max position 2·bits-1 ≤ 62, no
    * overflow). Dimensions are masked to `bits` (caller buckets wider
    * domains first; 16 bits per dim already gives 65 536 file-level strips
    * per dimension, far past parquet row-group granularity at any scale).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "1..31 interleaved bits per dimension")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)): Column
    }.reduce(_ + _)
  }

  /** Z-order clustering: range-scatter + sort the table by the interleaved
    * key. Downstream, a predicate on EITHER dimension touches only the
    * files whose z-range intersects it (parquet min/max on the original
    * columns stay tight because each file covers a small z-square) —
    * the standard multi-dim skip-index layout. One shuffle, same cost
    * shape as a plain global sort; `zval` is kept in the output so the
    * write can also partition on `zval div stripSize` if file-level
    * boundaries are wanted explicitly.
    */
  def zorderCluster(df: DataFrame, dimA: Column, dimB: Column,
                    bits: Int = 16): DataFrame =
    df.withColumn("zval", zValue(dimA, dimB, bits))
      .orderBy(col("zval"))
}
