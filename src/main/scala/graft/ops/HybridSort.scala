package graft.ops

/** The one place the reference's *algorithm* (not just its semantics)
  * survives in this engine: quicksort that hands runs shorter than a
  * threshold to insertion sort.
  *
  * Semantics follow `/root/reference/SequentialQuickInsert.c`:
  *  - insertion sort over `arr[left..right]` (`:8-18`),
  *  - Lomuto partition around `pivot = arr[high]` (`:21-37`),
  *  - recursive hybrid with `high - low < threshold` cutoff (`:40-52`,
  *    default threshold 25 per `:5`; CLI-tunable in
  *    `/root/reference/quickThreshold.c:188-191`).
  *
  * Differences by design:
  *  - iterative outer loop + recurse-into-smaller-side, so worst-case stack
  *    depth is O(log n) (the reference's CUDA variant needs a 4096-slot
  *    manual stack, `QuickInsertionHeap.cu:6,40-72`; the C variant can
  *    overflow on adversarial input);
  *  - no `INT_MAX` padding sentinel (`quickThreshold.c:171` corrupts data
  *    that legitimately contains `INT_MAX`) — arrays are sorted as-is.
  *
  * At cluster scale this code only ever sees one *run* at a time (an array
  * column value, or a partition handed to it by a custom physical operator);
  * the distributed scatter/sort/merge of the reference maps to Spark's
  * `RangePartitioning` + per-partition sort (see ops.Sorts).
  */
object HybridSort {

  val DefaultThreshold = 25

  // ---- Int ----
  def insertionSort(a: Array[Int], left: Int, right: Int): Unit = {
    var i = left + 1
    while (i <= right) {
      val key = a(i)
      var j = i - 1
      while (j >= left && a(j) > key) { a(j + 1) = a(j); j -= 1 }
      a(j + 1) = key
      i += 1
    }
  }

  private def partition(a: Array[Int], low: Int, high: Int): Int = {
    val pivot = a(high)
    var i = low - 1
    var j = low
    while (j < high) {
      if (a(j) < pivot) {
        i += 1
        val t = a(i); a(i) = a(j); a(j) = t
      }
      j += 1
    }
    val t = a(i + 1); a(i + 1) = a(high); a(high) = t
    i + 1
  }

  /** In-place hybrid sort of `a[low..high]`. */
  def sortRange(a: Array[Int], low0: Int, high0: Int,
                threshold: Int = DefaultThreshold): Unit = {
    var low = low0
    var high = high0
    while (low < high) {
      if (high - low < threshold) {
        insertionSort(a, low, high)
        low = high // done
      } else {
        val p = partition(a, low, high)
        // recurse into smaller side, loop on larger: O(log n) stack
        if (p - low < high - p) {
          sortRange(a, low, p - 1, threshold)
          low = p + 1
        } else {
          sortRange(a, p + 1, high, threshold)
          high = p - 1
        }
      }
    }
  }

  /** Pure (copying) sort. */
  def sorted(a: Array[Int], threshold: Int = DefaultThreshold): Array[Int] = {
    val c = a.clone()
    if (c.length > 1) sortRange(c, 0, c.length - 1, threshold)
    c
  }

  // ---- Long (same algorithm; duplicated to avoid boxing) ----
  def insertionSortL(a: Array[Long], left: Int, right: Int): Unit = {
    var i = left + 1
    while (i <= right) {
      val key = a(i)
      var j = i - 1
      while (j >= left && a(j) > key) { a(j + 1) = a(j); j -= 1 }
      a(j + 1) = key
      i += 1
    }
  }

  private def partitionL(a: Array[Long], low: Int, high: Int): Int = {
    val pivot = a(high)
    var i = low - 1
    var j = low
    while (j < high) {
      if (a(j) < pivot) {
        i += 1
        val t = a(i); a(i) = a(j); a(j) = t
      }
      j += 1
    }
    val t = a(i + 1); a(i + 1) = a(high); a(high) = t
    i + 1
  }

  def sortRangeL(a: Array[Long], low0: Int, high0: Int,
                 threshold: Int = DefaultThreshold): Unit = {
    var low = low0
    var high = high0
    while (low < high) {
      if (high - low < threshold) {
        insertionSortL(a, low, high)
        low = high
      } else {
        val p = partitionL(a, low, high)
        if (p - low < high - p) {
          sortRangeL(a, low, p - 1, threshold)
          low = p + 1
        } else {
          sortRangeL(a, p + 1, high, threshold)
          high = p - 1
        }
      }
    }
  }

  def sortedL(a: Array[Long], threshold: Int = DefaultThreshold): Array[Long] = {
    val c = a.clone()
    if (c.length > 1) sortRangeL(c, 0, c.length - 1, threshold)
    c
  }

  // ---- generic (Ordering-driven; the row-sort leg of the physical
  // operator graft.plans.HybridSortExec — same algorithm, comparator
  // supplied by Catalyst's generated row ordering) ----
  def insertionSortO[T](a: Array[T], left: Int, right: Int,
                        ord: Ordering[T]): Unit = {
    var i = left + 1
    while (i <= right) {
      val key = a(i)
      var j = i - 1
      while (j >= left && ord.gt(a(j), key)) { a(j + 1) = a(j); j -= 1 }
      a(j + 1) = key
      i += 1
    }
  }

  private def partitionO[T](a: Array[T], low: Int, high: Int,
                            ord: Ordering[T]): Int = {
    val pivot = a(high)
    var i = low - 1
    var j = low
    while (j < high) {
      if (ord.lt(a(j), pivot)) {
        i += 1
        val t = a(i); a(i) = a(j); a(j) = t
      }
      j += 1
    }
    val t = a(i + 1); a(i + 1) = a(high); a(high) = t
    i + 1
  }

  def sortRangeO[T](a: Array[T], low0: Int, high0: Int, ord: Ordering[T],
                    threshold: Int = DefaultThreshold): Unit = {
    var low = low0
    var high = high0
    while (low < high) {
      if (high - low < threshold) {
        insertionSortO(a, low, high, ord)
        low = high
      } else {
        val p = partitionO(a, low, high, ord)
        if (p - low < high - p) {
          sortRangeO(a, low, p - 1, ord, threshold)
          low = p + 1
        } else {
          sortRangeO(a, p + 1, high, ord, threshold)
          high = p - 1
        }
      }
    }
  }
}
