package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.h60

/** Privacy-preserving release of corpus statistics — the step between
  * "we computed per-group counts" and "we may publish them" for a
  * training-data pipeline (dataset cards, per-source composition reports,
  * public data statements).
  *
  * Two standard treatments, composable:
  *
  *  - [[dpCounts]]: ε-differentially-private counts via the Laplace
  *    mechanism (sensitivity 1 for a per-row group count). The noise is
  *    drawn by inverse-CDF from a SEEDED uniform — `h60(salt ‖ group)` /
  *    2^60 — so the release is a pure function of (salt, group): re-runs,
  *    retries and other engines reproduce the identical release, and the
  *    noise draw consumes no shared random state across executors (a
  *    `rand()`-based draw would be neither replayable nor
  *    partitioning-stable). One aggregate computes the true counts
  *    (map-side combined, shuffle O(groups × tasks)); the noise is a
  *    map-only expression over the aggregated rows, so the privacy layer
  *    adds ZERO distributed cost at any corpus size.
  *
  *  - [[suppressSmall]]: small-group suppression. WHICH column it
  *    thresholds decides what guarantee the composition keeps:
  *
  *      - on the NOISED count (`nCol = "n_released"`): a group's
  *        presence in the release is a function of noised values only —
  *        the standard "stability histogram" release for data-dependent
  *        domains, (ε, δ)-DP with δ ≤ ½·exp(−ε·(k−1)) per group (the
  *        probability that a group present only through the one
  *        differing row clears the threshold). This is what the shipped
  *        `dp_counts` / `stream_dp_counts` queries do.
  *      - on the TRUE count (`nCol = "n_true"`, the default): presence
  *        in the release is a deterministic function of the raw data —
  *        the composition is k-anonymity-style suppression ONLY, not
  *        ε-DP, however much noise rides on the published count. Use
  *        this form only when the group-key domain is public.
  *
  * Determinism/portability: the uniform is clamped away from {0, ½, 1}
  * before the two `ln` branches, the noise is rounded to an INTEGER
  * (release counts are integers), and negative releases clamp to 0 —
  * every step replays bit-for-bit in the DuckDB oracle.
  *
  * Caveat (documented, not hidden): a hash-seeded draw is pseudo-random
  * per GROUP, which is the standard determinism/testability trade for
  * data-release pipelines. The formal (ε)- and (ε, δ)-DP claims above
  * therefore hold only against an adversary who does NOT know the salt:
  * the noise is a deterministic function of (salt, group), so anyone
  * holding the salt can subtract it exactly — treat the salt as a secret
  * key, exactly like the seed of any PRNG-based mechanism. Likewise the
  * shipped frames carry `n_true` next to `n_released` for verification
  * and audit ONLY; a production release must drop `n_true` (and the
  * salt), or the mechanism releases the exact counts it was supposed to
  * protect.
  */
object Privacy {

  /** Seeded uniform in (0, 1): h60 of (salt ‖ key), scaled. */
  private def seededUniform(salt: String, key: Column): Column =
    h60(concat(lit(salt + ":"), key)).cast("double") / lit(math.pow(2.0, 60))

  /** Laplace(0, b) noise by inverse CDF from the seeded uniform —
    * -b·sgn(u−½)·ln(1−2|u−½|), with the log argument clamped to keep the
    * tail finite when u lands on an endpoint.
    */
  private def laplace(u: Column, b: Double): Column = {
    val t = greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    lit(-b) * signum(u - lit(0.5)) * log(t)
  }

  /** ε-DP per-group counts: `(groupCols…, n_true, n_released)` with
    * `n_released = max(0, n_true + round(Laplace(1/ε)))`. `n_true` rides
    * along for verification/audit; a production release would drop it.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
               salt: String): DataFrame =
    release(
      df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n_true")),
      groupCols, eps, salt)

  /** The noise layer alone, over an ALREADY-aggregated counts frame —
    * lets the same release discipline apply to counters produced by any
    * upstream (a batch groupBy, a streaming complete-mode aggregate, a
    * sketch readout). Map-only over O(groups) rows.
    */
  def release(counts: DataFrame, groupCols: Seq[String], eps: Double,
              salt: String, nCol: String = "n_true"): DataFrame = {
    require(eps > 0, "epsilon must be positive")
    val b = 1.0 / eps
    val key = concat_ws("|", groupCols.map(col): _*)
    counts
      .select((groupCols.map(col) :+
        col(nCol).as("n_true") :+
        (col(nCol) + round(laplace(seededUniform(salt, key), b), 0)
          .cast("long")).as("shifted")): _*)
      .select((groupCols.map(col) :+
        col("n_true") :+
        greatest(lit(0L), col("shifted")).as("n_released")): _*)
  }

  /** Small-group suppression: keep only groups where `nCol` ≥ k. Runs on
    * the aggregated frame — O(groups) rows — so it composes with
    * [[dpCounts]] for free. Pass `nCol = "n_released"` to threshold the
    * NOISED count (the (ε, δ)-DP stability-histogram release); the
    * default `n_true` form is k-anonymity-only — see the object docs.
    */
  def suppressSmall(counts: DataFrame, k: Long,
                    nCol: String = "n_true"): DataFrame =
    counts.where(col(nCol) >= k)
}
