package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HybridSort

/** The two invariants the reference never checks (its only "verification"
  * is eyeballing printed output, /root/reference/SequentialQuickInsert.c:89-93):
  * output is non-decreasing, and output is a multiset-permutation of input.
  * Edge cases target the `high - low < threshold` boundary
  * (SequentialQuickInsert.c:43) and the Int.MaxValue sentinel collision the
  * reference's padding strategy would corrupt (quickThreshold.c:171).
  * Random-input coverage is in [[HybridSortProps]] (ScalaCheck).
  */
class HybridSortSpec extends AnyFunSuite {

  test("edge: sizes around the insertion-sort threshold boundary") {
    for (n <- Seq(0, 1, 2, 24, 25, 26, 27); t <- Seq(1, 24, 25, 26)) {
      val arr = Array.tabulate(n)(i => (i * 2654435761L % 97).toInt)
      assert(HybridSort.sorted(arr, t).sameElements(arr.sorted), s"n=$n t=$t")
    }
  }

  test("edge: all-equal, presorted, reversed, Int.MaxValue present") {
    val cases = Seq(
      Array.fill(100)(7),
      Array.tabulate(100)(identity),
      Array.tabulate(100)(99 - _),
      Array(Int.MaxValue, 5, Int.MinValue, Int.MaxValue, 0, -1),
      Array(Int.MaxValue),
    )
    for (arr <- cases) {
      assert(HybridSort.sorted(arr).sameElements(arr.sorted))
    }
  }

  test("sortRange sorts only the requested range") {
    val arr = Array(9, 8, 7, 6, 5, 4, 3, 2, 1, 0)
    HybridSort.sortRange(arr, 2, 5, 2)
    assert(arr.sameElements(Array(9, 8, 4, 5, 6, 7, 3, 2, 1, 0)))
  }

  test("deep recursion safety: 1M adversarial (presorted) input") {
    // Lomuto on presorted input is worst-case; recurse-into-smaller-side
    // keeps the stack O(log n) where the reference's plain recursion
    // (SequentialQuickInsert.c:40-52) would go O(n) deep.
    val arr = Array.tabulate(1 << 20)(identity)
    HybridSort.sortRange(arr, 0, arr.length - 1)
    assert(arr.sameElements(Array.tabulate(1 << 20)(identity)))
  }
}
