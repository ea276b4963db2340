package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sorts

/** The engine's custom physical operator (HybridSortPlan → HybridSortExec):
  * value parity with orderBy, true global output order (collected in
  * partition-index order), and plan shape — the strategy must plan our
  * exec node and EnsureRequirements must insert the range scatter.
  */
class HybridSortPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-hybrid-plan-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("hybridSortExec equals orderBy row-for-row, in order") {
    val sp = spark; import sp.implicits._
    val df = sp.range(10000).selectExpr(
      "cast(id * 2654435761 % 1000 as bigint) as k",
      "id as payload",
      "cast(id % 7 as string) as tag")
    val got = Sorts.hybridSortExec(df, 25, "k", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = df.orderBy($"k", $"payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.sameElements(want))
  }

  test("plans GraftHybridSort over a range-partitioning exchange, no SortExec") {
    val sp = spark
    val df = sp.range(1000).selectExpr("cast(id % 13 as bigint) as k", "id as v")
    val plan = Sorts.hybridSortExec(df, 25, "k", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftHybridSort"), plan)
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    assert("""\+- Sort \[""".r.findFirstIn(plan).isEmpty,
      s"built-in SortExec must not appear:\n$plan")
  }

  test("ties across a partition boundary stay a multiset permutation") {
    val sp = spark; import sp.implicits._
    // heavy duplication (the reference's regime: 4M values in a 5M space)
    val df = sp.range(5000).selectExpr("cast(id % 3 as bigint) as k")
    val got = Sorts.hybridSortExec(df, 5, "k").collect().map(_.getLong(0))
    assert(got.sameElements(got.sorted))
    assert(got.groupBy(identity).view.mapValues(_.length).toMap ==
      Map(0L -> 1667, 1L -> 1667, 2L -> 1666))
  }

  test("threshold extremes: pure insertion sort and pure quicksort agree") {
    val sp = spark
    val df = sp.range(2000).selectExpr("cast(id * 48271 % 997 as bigint) as k")
    val a = Sorts.hybridSortExec(df, 1, "k").collect().map(_.getLong(0))
    val b = Sorts.hybridSortExec(df, 1000000, "k").collect().map(_.getLong(0))
    assert(a.sameElements(b) && a.sameElements(a.sorted))
  }

  private def findHybridExec(p: org.apache.spark.sql.execution.SparkPlan)
      : Option[graft.plans.HybridSortExec] = p match {
    case h: graft.plans.HybridSortExec => Some(h)
    case other => other.children.view.flatMap(findHybridExec).headOption
  }

  test("partitions past the run budget spill sorted runs and heap-merge back to exact order") {
    val sp = spark
    // Drive every partition far past a tiny run budget: 60k rows over 4
    // partitions with a 1000-row budget → ≥14 spilled runs per task. The
    // non-adaptive plan keeps HybridSortExec findable for metric checks.
    sp.conf.set("spark.graft.hybridSort.spillRows", "1000")
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = sp.range(60000).selectExpr(
        "cast(id * 2654435761 % 50000 as bigint) as k",
        "id as payload",
        "repeat(cast(id % 97 as string), 3) as tag")
      val q = Sorts.hybridSortExec(df, 25, "k", "payload")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val want = df.orderBy(org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.col("payload"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.sameElements(want),
        "external (spilling) hybrid sort must equal orderBy row-for-row")
      val exec = findHybridExec(q.queryExecution.executedPlan)
      assert(exec.isDefined, q.queryExecution.executedPlan.toString)
      val runs = exec.get.metrics("spillRuns").value
      val bytes = exec.get.metrics("spillBytes").value
      assert(runs >= 4 * 14,
        s"expected every task to spill many runs, got spillRuns=$runs")
      assert(bytes > 0, "spillBytes metric must record the spilled volume")
    } finally {
      sp.conf.unset("spark.graft.hybridSort.spillRows")
      sp.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("byte budget alone also triggers spill; in-budget partitions never spill") {
    val sp = spark
    sp.conf.set("spark.graft.hybridSort.spillBytes", "8192")
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = sp.range(20000).selectExpr(
        "cast(id * 48271 % 7919 as bigint) as k",
        "repeat('x', 40) as pad")
      val q = Sorts.hybridSortExec(df, 25, "k")
      val got = q.collect().map(_.getLong(0))
      assert(got.sameElements(got.sorted))
      val exec = findHybridExec(q.queryExecution.executedPlan).get
      assert(exec.metrics("spillRuns").value > 0,
        "a 40-byte pad over an 8 KiB byte budget must spill")
    } finally {
      sp.conf.unset("spark.graft.hybridSort.spillBytes")
    }
    // and with default budgets the same data never spills
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = sp.range(20000).selectExpr(
        "cast(id * 48271 % 7919 as bigint) as k", "repeat('x', 40) as pad")
      val q = Sorts.hybridSortExec(df, 25, "k")
      q.collect()
      val exec = findHybridExec(q.queryExecution.executedPlan).get
      assert(exec.metrics("spillRuns").value == 0,
        "in-budget partitions must take the zero-IO fast path")
    } finally sp.conf.unset("spark.sql.adaptive.enabled")
  }

  test("early-stopping consumer: spill files are closed and deleted at task end") {
    val sp = spark
    // Tiny budget → many spilled runs per task; a LIMIT far below the
    // partition size stops the merge mid-run, so every run file is still
    // open when the task finishes. The completion listener must close
    // them BEFORE deleting (the close-then-delete contract) — asserted by
    // the executor local dir holding zero graft spill files afterwards.
    sp.conf.set("spark.graft.hybridSort.spillRows", "500")
    sp.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = sp.range(40000).selectExpr(
        "cast(id * 2654435761 % 50000 as bigint) as k")
      val got = Sorts.hybridSortExec(df, 25, "k").limit(5)
        .collect().map(_.getLong(0))
      assert(got.length == 5 && got.sameElements(got.sorted))
      val probe = org.apache.spark.sql.GraftSpillUtil.newSpillFile("probe-")
      val localDir = new java.io.File(probe.getParent)
      probe.delete()
      val leaked = localDir.listFiles()
        .filter(_.getName.startsWith("graft-hybrid-sort-"))
      assert(leaked.isEmpty,
        s"early-stopped merge leaked spill files: ${leaked.map(_.getName).toSeq}")
    } finally {
      sp.conf.unset("spark.graft.hybridSort.spillRows")
      sp.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
