package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plain-JVM throughput check for the Misra-Gries state (no Spark): the
  * aggregate's per-row cost must be a few hundred ns, not µs — a task
  * processing 10^6+ rows lives or dies on this constant.
  */
class MisraGriesMicroBench extends AnyFunSuite {
  test("MG state sustains >1M updates/sec on a skewed stream") {
    val k = 4096
    val st = new graft.functions.MisraGriesState(k)
    val rnd = new java.util.Random(7)
    val n = 2000000
    var i = 0
    var maxHeap = 0
    val t0 = System.nanoTime()
    while (i < n) {
      val item = if (rnd.nextBoolean()) "hot" + rnd.nextInt(100)
                 else "cold" + rnd.nextInt(2000000)
      st.update(item)
      i += 1
      if ((i & 0xFFFF) == 0 && st.heapSize > maxHeap) maxHeap = st.heapSize
    }
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"n=$n sec=$sec%.2f rate=${(n / sec).toLong}/s stored=${st.stored.size()} " +
      f"maxHeapSampled=$maxHeap base=${st.base} totalDec=${st.totalDec}")
    assert(st.stored.size() <= k)
    // Load-sensitive rate check is opt-in, like KllMicroBench's.
    val rate = n / sec
    if (sys.env.get("GRAFT_PERF_ASSERT").contains("1"))
      assert(rate > 1e6, f"MG update throughput ${rate.toLong}/s below 1M/s")
    else if (rate <= 1e6)
      info(f"WARN: throughput ${rate.toLong}/s below the 1M/s design rate " +
        "(not failing: GRAFT_PERF_ASSERT unset)")
  }
}
