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

  test("graft-gen: id-range filters prune the generated range") {
    import org.apache.spark.sql.functions._
    val df = gen(1000000L).where(col("id") >= 250000L && col("id") < 250010L)
    // the pruned range is visible in the scan description...
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-gen-scan[250000,250010)"),
      s"expected pruned scan range in:\n$plan")
    // ...and the values are the correct ones for those ids
    val rows = df.orderBy("id").collect()
    assert(rows.length == 10)
    assert(rows.head.getAs[Long]("id") == 250000L)
    assert(rows.forall(r => r.getAs[Long]("value") ==
      ((r.getAs[Long]("id") % 2147483647L) * 2654435761L) % 5000000L))
    // equality pins a single id; unsupported predicates stay residual
    val one = gen(1000L).where(col("id") === 77L)
    assert(one.queryExecution.executedPlan.toString.contains("graft-gen-scan[77,78)"))
    assert(one.collect().map(_.getAs[Long]("id")).toSeq == Seq(77L))
    val res = gen(1000L).where(col("value") > 100L) // value filter: residual
    assert(res.queryExecution.executedPlan.toString.contains("graft-gen-scan[0,1000)"))
    // contradictory bounds produce an empty (not negative) range
    assert(gen(1000L).where(col("id") > 500L && col("id") < 100L).count() == 0L)
  }

  test("graft-gen: empty and single-row edges") {
    assert(gen(0L).count() == 0L)
    assert(gen(1L).collect().map(_.getAs[Long]("id")).toSeq == Seq(0L))
  }

  test("graft-digest sink: task xors combine to the exact corpus digest") {
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val vals = Seq(3L, 5L, 9L, 3L, 1024L, -7L)
    val path = java.nio.file.Files.createTempDirectory("digest_test").toString
    vals.toDF("digest").repartition(3) // several tasks → several commit msgs
      .write.format("graft-digest").option("path", path)
      .mode("overwrite").save()
    val row = graft.sources.DigestSink.result(sp, path).collect().head
    assert(row.getAs[Long]("n_rows") == vals.length.toLong)
    assert(row.getAs[Long]("xor_digest") == vals.reduce(_ ^ _))
    // rerun overwrites atomically with the same result
    vals.toDF("digest").write.format("graft-digest").option("path", path)
      .mode("overwrite").save()
    assert(graft.sources.DigestSink.result(sp, path).collect().head
      .getAs[Long]("xor_digest") == vals.reduce(_ ^ _))
    // input contract: exactly one LongType column
    intercept[Exception] {
      Seq((1L, 2L)).toDF("a", "b").write.format("graft-digest")
        .option("path", path).mode("overwrite").save()
    }
  }
}
