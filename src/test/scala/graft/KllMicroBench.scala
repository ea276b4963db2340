package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plain-JVM throughput + state-bound check for the KLL state (no
  * Spark): a task feeds 10^6+ rows through `update`, so the per-row
  * constant (buffer append + amortized compaction sorts) must stay in
  * the tens of ns. Also pins the two resource claims the 100 TB design
  * leans on: retained items stay O(k·log(n/k)) and the certified error
  * bound stays a small fraction of n.
  */
class KllMicroBench extends AnyFunSuite {
  test("KLL state sustains >5M updates/sec; state and certificate stay bounded") {
    val k = 1024
    val st = new graft.functions.KllState(k)
    val rnd = new java.util.Random(7)
    val n = 10000000
    var i = 0
    val t0 = System.nanoTime()
    while (i < n) {
      st.update(rnd.nextDouble() * 1e12)
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val retained = st.items.length
    info(f"n=$n sec=$sec%.2f rate=${(n / sec).toLong}/s retained=$retained " +
      f"levels=${st.levels.length} errBound=${st.errBound} " +
      f"(=${100.0 * st.errBound / n}%.2f%% of n)")
    val levels = (math.log(n.toDouble / k) / math.log(2)).ceil.toInt + 2
    assert(retained <= k * levels, s"retained $retained exceeds k·log bound")
    // deterministic-compaction worst case is ~2·levels·n/k; require it
    assert(st.errBound < 4L * levels * n / k,
      s"certificate ${st.errBound} looser than the design bound")
    // Throughput is machine- and load-sensitive (a busy CI runner or a
    // debug JVM would fail despite correct code), so the rate check is a
    // hard failure only under GRAFT_PERF_ASSERT=1 (set it when running
    // the suite alone on a quiet box); otherwise it reports via info().
    val rate = n / sec
    if (sys.env.get("GRAFT_PERF_ASSERT").contains("1"))
      assert(rate > 5e6, f"KLL update throughput ${rate.toLong}/s below 5M/s")
    else if (rate <= 5e6)
      info(f"WARN: throughput ${rate.toLong}/s below the 5M/s design rate " +
        "(not failing: GRAFT_PERF_ASSERT unset)")
  }
}
