package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.HybridSort

/** ScalaCheck invariants for the hybrid sort: ascending output and
  * multiset-permutation of input, over random sizes, values (full Int/Long
  * range incl. the reference's INT_MAX sentinel value) and thresholds.
  */
object HybridSortProps extends Properties("HybridSort") {

  private val arrThresh = for {
    n <- Gen.chooseNum(0, 500)
    arr <- Gen.containerOfN[Array, Int](n, Gen.chooseNum(Int.MinValue, Int.MaxValue))
    t <- Gen.oneOf(1, 2, 24, 25, 26, 1000)
  } yield (arr, t)

  property("sorted+permutation (Int)") = forAll(arrThresh) { case (arr, t) =>
    val out = HybridSort.sorted(arr, t)
    Prop(out.sameElements(arr.sorted)) :| s"n=${arr.length} t=$t"
  }

  property("sorted+permutation (Long)") =
    forAll(Gen.containerOf[Array, Long](Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      arr => Prop(HybridSort.sortedL(arr).sameElements(arr.sorted))
    }

  property("duplicate-heavy (key space 10)") =
    forAll(Gen.containerOf[Array, Int](Gen.chooseNum(0, 9))) { arr =>
      Prop(HybridSort.sorted(arr).sameElements(arr.sorted))
    }
}
