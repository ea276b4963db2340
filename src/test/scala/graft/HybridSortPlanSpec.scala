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
}
