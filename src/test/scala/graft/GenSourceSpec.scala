package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GenSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-gensource-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def gen(n: Long) =
    spark.read.format("graft-gen").option("n", n).load()

  test("graft-gen: row count, deterministic values, partitioned generation") {
    val df = gen(10000L)
    assert(df.count() == 10000L)
    assert(df.rdd.getNumPartitions == 8)
    val row = df.where(org.apache.spark.sql.functions.col("id") === 5432L).collect().head
    assert(row.getAs[Long]("value") == ((5432L % 2147483647L) * 2654435761L) % 5000000L)
    // two reads produce identical data (engine-agnostic determinism)
    assert(gen(1000L).collect().toSeq == gen(1000L).collect().toSeq)
  }

  test("graft-gen: column pruning reaches the reader") {
    val df = gen(100L).select("value")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("value") && !scan.contains("id,"),
      s"expected value-only ReadSchema in:\n$scan")
    assert(df.collect().length == 100)
  }

  test("graft-gen: empty and single-row edges") {
    assert(gen(0L).count() == 0L)
    assert(gen(1L).collect().map(_.getAs[Long]("id")).toSeq == Seq(0L))
  }
}
