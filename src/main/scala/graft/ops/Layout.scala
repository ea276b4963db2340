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

  /** The z-order SKIP INDEX mechanic: which strips (z-value prefixes,
    * `strip = zval >> (2·bits − stripTopBits)`) can contain ANY point of
    * the query box `[aLo,aHi] × [bLo,bHi]`. A strip fixes the top
    * interleaved bits, i.e. a prefix of each dimension — so it covers an
    * axis-aligned rectangle, and the intersection test is exact. This is
    * the driver-side translation every lakehouse z-order scan does:
    * a predicate on EITHER dimension (or both) becomes a partition
    * filter on the strip column, and Spark prunes the non-qualifying
    * strip directories at PLANNING time — the pruning a plain one-column
    * sort can only give for its own sort key. O(2^stripTopBits) driver
    * work, independent of table size.
    */
  def zStrips(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
              bits: Int, stripTopBits: Int): Seq[Long] = {
    require(stripTopBits >= 1 && stripTopBits <= 2 * bits,
      "stripTopBits must cover 1..2*bits interleaved bits")
    val nb = stripTopBits
    (0L until (1L << nb)).filter { s =>
      var aPre = 0L; var bPre = 0L; var aBits = 0; var bBits = 0
      var k = 0
      while (k < nb) {
        val pos = 2 * bits - 1 - k // z bit position, high to low
        val bit = (s >> (nb - 1 - k)) & 1L
        if (pos % 2 == 1) { aPre = (aPre << 1) | bit; aBits += 1 }
        else { bPre = (bPre << 1) | bit; bBits += 1 }
        k += 1
      }
      val aMin = aPre << (bits - aBits)
      val aMax = aMin + (1L << (bits - aBits)) - 1
      val bMin = bPre << (bits - bBits)
      val bMax = bMin + (1L << (bits - bBits)) - 1
      aMax >= aLo && aMin <= aHi && bMax >= bLo && bMin <= bHi
    }
  }

  /** Write the z-clustered LAYOUT: [[zorderCluster]]'s interleave, cut
    * into `2^stripTopBits` strip directories (`zstrip` partition column),
    * one exchange on the strip, rows z-sorted inside each file. Scans
    * then combine [[zStrips]]'s strip filter (directory pruning at
    * planning time) with the original dimension predicate (row-group
    * pruning inside the surviving files) — see the `zorder_exec` query.
    */
  def zorderWrite(df: DataFrame, dimA: Column, dimB: Column, bits: Int,
                  stripTopBits: Int, outDir: String): String = {
    val shift = 2 * bits - stripTopBits
    // ONE exchange (on the strip), per-file z-sort — a global orderBy
    // would add a range exchange for ordering the strip dirs already give
    df.withColumn("zval", zValue(dimA, dimB, bits))
      .withColumn("zstrip", shiftright(col("zval"), shift))
      .repartition(col("zstrip"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").partitionBy("zstrip").parquet(outDir)
    outDir
  }

  /** Compaction PLAN: assign each partition's chunks (small files /
    * row-group slices, one row each with a byte size) to target-sized
    * output files — the planning pass behind every lakehouse OPTIMIZE /
    * rewrite job, where the small-files problem is measured in millions
    * of objects at 100 TB. Chunks are packed SEQUENTIALLY in `orderCol`
    * order (preserving any clustering the table already has — a
    * first-fit-decreasing packer would destroy z-order/sort locality):
    * file group = `(running_bytes_before_chunk) div targetBytes`, so
    * every group holds ~targetBytes (the last chunk of a group may
    * overflow it — the standard tolerance, since splitting a chunk means
    * rewriting rows, which is the EXECUTE step's job, not the plan's).
    *
    * Pure window arithmetic over the chunk MANIFEST (one row per chunk,
    * never the data): one exchange on the partition key, cost
    * O(chunks) regardless of table volume — exactly what lets the plan
    * run as a cheap scheduled pass over a million-file table. Output:
    * one row per planned output file `(partCols..., file_group,
    * n_chunks, file_bytes)`.
    */
  def compactionPlan(chunks: DataFrame, partCols: Seq[String],
                     orderCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame =
    compactionAssign(chunks, partCols, orderCol, bytesCol, targetBytes)
      .groupBy(partCols.map(col) :+ col("file_group"): _*)
      .agg(count(lit(1)).as("n_chunks"),
        sum(col(bytesCol)).cast("long").as("file_bytes"))

  /** The per-chunk half of [[compactionPlan]]: every manifest row with
    * its assigned `file_group` — what the EXECUTE step joins back to the
    * data to route rows into their planned output files. Same cost
    * shape: window arithmetic over the manifest, never the data.
    */
  def compactionAssign(chunks: DataFrame, partCols: Seq[String],
                       orderCol: String, bytesCol: String,
                       targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val gcols = partCols.map(col)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(gcols: _*).orderBy(col(orderCol))
      .rowsBetween(W.unboundedPreceding, -1)
    chunks
      .withColumn("_cp_before", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      // integer `div`, not `/`: long division must stay exact in every
      // engine (Spark's `/` on longs is a double divide)
      .withColumn("file_group", expr(s"_cp_before div ${targetBytes}L"))
      .drop("_cp_before")
  }

  /** EXECUTE the compaction plan — the write half of OPTIMIZE, matching
    * [[compactionPlan]]'s planner: route every data row to its chunk's
    * planned output file and rewrite, one physical file per planned
    * group, clustering preserved.
    *
    * Shape, by construction:
    *  - the chunk→group manifest is broadcast (O(chunks) rows — for a
    *    manifest too large to broadcast, shuffle-join on the chunk key;
    *    the kernel is unchanged);
    *  - ONE exchange, on `(partCols, file_group)` — `repartition` by the
    *    planned file key, so each output file is written by exactly one
    *    task (the small-files cure: a million source chunks leave as
    *    `ceil(bytes/target)` files);
    *  - `sortWithinPartitions(orderCol)` keeps rows clustered INSIDE
    *    each file — a per-file in-memory/spill sort, never a global
    *    sort (sequential packing already guarantees file-level order:
    *    group g's chunks all precede group g+1's in `orderCol`).
    *
    * Returns the written root; callers verify by reading back (see the
    * `compaction_exec` query, whose oracle replays the expected
    * per-file row statistics from the source table).
    */
  def compactionExec(data: DataFrame, partCols: Seq[String],
                     orderCol: String, bytesCol: String,
                     targetBytes: Long, chunks: DataFrame,
                     outDir: String): String = {
    val assign = compactionAssign(chunks, partCols, orderCol, bytesCol,
      targetBytes).select((partCols :+ orderCol :+ "file_group").map(col): _*)
    data.join(broadcast(assign), partCols :+ orderCol)
      .repartition((partCols :+ "file_group").map(col): _*)
      .sortWithinPartitions(col(orderCol))
      .write.mode("overwrite")
      .partitionBy(partCols :+ "file_group": _*)
      .parquet(outDir)
    outDir
  }
}
