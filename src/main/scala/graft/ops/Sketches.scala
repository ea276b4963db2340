package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Mergeable sketch aggregates — the cardinality / frequency summaries a
  * 100 TB pipeline keeps instead of exact state. Both sketches here are
  * pure hash-aggregates built from deterministic, engine-portable
  * arithmetic (md5-based [[graft.functions.h60]], integer shifts), so an
  * independent SQL oracle reproduces them bit-for-bit — unlike
  * `approx_count_distinct`, whose HLL++ register layout is
  * implementation-defined per engine.
  *
  * Scale shape: a sketch is a bounded set of (bucket → small int) registers
  * per group. Registers merge associatively (max for HLL, sum for CMS), so
  * Spark's partial aggregation collapses every partition's registers
  * map-side — the shuffle carries at most `m` rows per group per task no
  * matter how many raw rows streamed in. That is the whole point at 100 TB:
  * cardinality/frequency of a trillion rows in O(groups · m) memory.
  */
object Sketches {

  /** Registers per HLL sketch (power of two). 64 gives ~13% standard
    * error — a routing/monitoring-grade estimate at 64 longs per group.
    */
  val HllBuckets = 64

  /** Bits of h60 left after the bucket index (60 - log2(64)). */
  private val HllValueBits = 54

  /** alpha_m * m^2 * 2^(HllValueBits+1) for m=64 — the estimator numerator,
    * precomputed once; the oracle inlines the identical literal product in
    * the identical order.
    */
  private val HllAlpha = 0.709d

  /** HyperLogLog-style distinct-count estimate of `valCol` per `keyCol`,
    * alongside the exact count for reference.
    *
    * Register construction uses the *trailing*-zero rank of the hash
    * remainder (Flajolet–Martin style: `rho = tz(w) + 1`, `w = 0` maps to
    * the max rank) — same estimator family as leading-zero HLL, chosen
    * because `w & -w` isolates the lowest set bit as an exact power of two,
    * so `log2` of it is exact in double arithmetic in every engine.
    *
    * The harmonic mean is computed in INTEGER arithmetic: each register
    * contributes `2^(maxRank - M_j)` (a long; at most m·2^maxRank ≈ 2^60),
    * summed exactly, with empty registers contributing `2^maxRank` — one
    * double division at the very end. No float summation order anywhere.
    */
  def hllDistinct(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val exact = df.groupBy(col(keyCol).as("key"))
      .agg(count_distinct(col(valCol)).as("exact_distinct"))
    hllEstimate(hllRegisters(df, Seq(keyCol), valCol), Seq("key"))
      .join(exact, "key")
      .select(col("key"), col("exact_distinct"), col("hll_estimate"))
  }

  /** HLL registers `(groupCols..., bucket, mj)` — the persistable sketch
    * state at the given grouping granularity. First column of `groupCols`
    * comes out renamed `key`.
    */
  private[graft] def hllRegisters(df: DataFrame, groupCols: Seq[String],
                                  valCol: String): DataFrame = {
    val m = HllBuckets
    val maxRank = HllValueBits + 1 // rank when w == 0 (no set bit observed)
    val keys = col(groupCols.head).as("key") +: groupCols.tail.map(col)
    val outKeys = col("key") +: groupCols.tail.map(col)
    df.select(keys :+ h60(col(valCol).cast("string")).as("h"): _*)
      .select(outKeys :+ pmod(col("h"), lit(m.toLong)).as("bucket") :+
        expr(s"h div $m").as("w"): _*)
      .select(outKeys :+ col("bucket") :+
        when(col("w") === 0, lit(maxRank))
          .otherwise(log2(col("w").bitwiseAND(-col("w"))).cast("int") + 1)
          .as("rho"): _*)
      .groupBy(outKeys :+ col("bucket"): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** Estimate cardinality from registers, one row per `keys` group:
    * exact-integer harmonic mean, one double division, linear-counting
    * small-range correction (see [[hllDistinct]] doc). Output:
    * `(keys..., hll_estimate)`.
    */
  private[graft] def hllEstimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val m = HllBuckets
    val maxRank = HllValueBits + 1
    val z = regs.groupBy(keys.map(col): _*)
      .agg(sum(expr(s"shiftleft(cast(1 as bigint), $maxRank - mj)")).as("zp"),
        count(lit(1)).as("np"))
    val pow2MaxRank = math.pow(2.0d, maxRank) // exact: power of two
    val raw = lit(HllAlpha) * lit(m.toDouble * m) * lit(pow2MaxRank) /
      (col("zp") + (lit(m.toLong) - col("np")) * lit(pow2MaxRank.toLong))
    // Small-range (linear-counting) correction — raw HLL biases high below
    // ~2.5m; with V empty registers the occupancy estimate m·ln(m/V) is the
    // standard replacement. ln() is the one transcendental in the engine's
    // oracle surface; 2dp rounding absorbs any last-ulp libm difference.
    val empty = lit(m.toLong) - col("np")
    val est = when(raw <= lit(2.5d * m) && empty > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / empty)).otherwise(raw)
    z.select(keys.map(col) :+ round(est, 2).as("hll_estimate"): _*)
  }

  /** The property that makes sketches worth keeping at 100 TB: registers
    * built at a FINE granularity (per `sliceCol` — hour, day, file, shard)
    * merge up to any coarser rollup with `max` per bucket, without
    * re-reading the raw data. This computes per-(key, slice) sketches —
    * what a pipeline would persist as each increment lands — then derives
    * the per-key estimate purely from those registers. `max` is
    * associative/commutative and max-of-max = max over the union, so the
    * merged estimate is IDENTICAL to [[hllDistinct]] run directly on the
    * raw rows (asserted in tests), while touching only
    * O(keys · slices · m) register rows.
    *
    * Output: `(key, n_slices, exact_distinct, hll_estimate)`.
    */
  def hllMergeDistinct(df: DataFrame, keyCol: String, sliceCol: String,
                       valCol: String): DataFrame = {
    val slices = hllRegisters(df, Seq(keyCol, sliceCol), valCol)
    val nSlices = slices.groupBy(col("key"))
      .agg(count_distinct(col(sliceCol)).as("n_slices"))
    val merged = slices.groupBy(col("key"), col("bucket"))
      .agg(max(col("mj")).as("mj"))
    val exact = df.groupBy(col(keyCol).as("key"))
      .agg(count_distinct(col(valCol)).as("exact_distinct"))
    hllEstimate(merged, Seq("key"))
      .join(nSlices, "key").join(exact, "key")
      .select(col("key"), col("n_slices"), col("exact_distinct"),
        col("hll_estimate"))
  }

  /** Bloom filter geometry: m bits packed into m/32 words, k hash probes.
    * 1024 bits / 3 hashes ≈ 2% false positives at 100 keys — the
    * demonstration scale; production sizes m to the base-set cardinality
    * (the shape is unchanged, the filter stays a few KB per million keys).
    */
  val BloomBits = 1024
  val BloomHashes = 3

  /** Build a Bloom filter over `keyCol`: one row per 32-bit word (32,
    * not 64: a shift into a 64-bit sign bit is an overflow error in some
    * engines, and the oracle replays these shifts literally),
    * `bit_or`-merged. The whole filter is ≤ m/32 rows — the broadcastable
    * membership summary a 100 TB incremental-ingest pipeline ships to the
    * incoming batch instead of the full key set ([[bloomProbe]] is the
    * consumer; pairs with the exact anti-join which then runs only on the
    * maybe-dups).
    */
  def bloomBuild(keys: DataFrame, keyCol: String,
                 bits: Int = BloomBits, hashes: Int = BloomHashes): DataFrame =
    keys
      .select(col(keyCol).as("k"),
        explode(sequence(lit(0), lit(hashes - 1))).as("r"))
      .select(pmod(h60(concat(col("r").cast("string"), lit(":"), col("k"))),
        lit(bits.toLong)).as("idx"))
      .select(expr("idx div 32").as("word"),
        expr("shiftleft(cast(1 as bigint), cast(idx % 32 as int))").as("mask"))
      .groupBy(col("word"))
      .agg(bit_or(col("mask")).as("bits"))

  /** Probe the filter: a key is a MAYBE (1) iff all k probe bits are set;
    * 0 is a definite miss — no false negatives, so `bloom_maybe = 0` rows
    * can skip the exact dedup join entirely. The filter side is tiny and
    * broadcast; the probe is map-only per incoming row.
    */
  def bloomProbe(bloom: DataFrame, keys: DataFrame, idCol: String,
                 keyCol: String,
                 bits: Int = BloomBits, hashes: Int = BloomHashes): DataFrame =
    keys
      .select(col(idCol), col(keyCol).as("k"),
        explode(sequence(lit(0), lit(hashes - 1))).as("r"))
      .select(col(idCol),
        pmod(h60(concat(col("r").cast("string"), lit(":"), col("k"))),
          lit(bits.toLong)).as("idx"))
      .select(col(idCol), expr("idx div 32").as("word"),
        expr("shiftleft(cast(1 as bigint), cast(idx % 32 as int))").as("mask"))
      .join(broadcast(bloom), Seq("word"), "left")
      .select(col(idCol),
        when((coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask"))) =!= 0, 1L)
          .otherwise(0L).as("hit"))
      .groupBy(col(idCol))
      .agg(min(col("hit")).as("bloom_maybe"))

  /** Count-min sketch depth (independent hash rows) and width (slots per
    * row). 3×128 bounds the overestimate at ~2% of total mass with 3
    * chances to dodge collisions — monitoring-grade for a token stream.
    */
  val CmsDepth = 3
  val CmsWidth = 128

  /** Build a count-min sketch over the exploded `itemCol` of `df`, then
    * answer point-frequency queries for `probes`, alongside the exact
    * counts.
    *
    * Sketch = groupBy (row, slot) count, where slot = h60(row:item) mod
    * width — d·w counters total, updated by one narrow explode (factor d)
    * and one map-side-combined aggregate. The estimate for an item is the
    * MIN over its d counters (each counter only ever overcounts). Probing
    * joins the d·|probes| (row, slot) pairs against the counter table —
    * both sides tiny, the raw stream is touched exactly once.
    */
  def cmsFrequency(df: DataFrame, itemCol: String,
                   probes: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).as("item"))
    val entries = items
      .select(col("item"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("r"))
      .select(col("r"),
        pmod(h60(concat(col("r").cast("string"), lit(":"), col("item"))),
          lit(CmsWidth.toLong)).as("slot"))
    val counters = entries.groupBy(col("r"), col("slot"))
      .agg(count(lit(1)).as("c"))
    val probeSlots = probes.toDF("term")
      .select(col("term"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("r"))
      .select(col("term"), col("r"),
        pmod(h60(concat(col("r").cast("string"), lit(":"), col("term"))),
          lit(CmsWidth.toLong)).as("slot"))
    val est = probeSlots.join(counters, Seq("r", "slot"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_estimate"))
    val truth = items.groupBy(col("item").as("term"))
      .agg(count(lit(1)).as("true_count"))
    est.join(truth, Seq("term"), "left")
      .select(col("term"), col("cms_estimate"),
        coalesce(col("true_count"), lit(0L)).as("true_count"))
  }
}
