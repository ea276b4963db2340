package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: the reference pipeline (generate → globally sort) far past
  * the reference's largest published test (4,000,000 elements,
  * `/root/reference/README.md:17`). Generation comes from the `graft-gen`
  * V2 source (partitioned, O(1) state per task) and the sort is the
  * engine's `global_sort` (range scatter + per-partition sort), driven to
  * a noop sink so the FULL sort executes with zero sink cost.
  *
  *   sbt "runMain graft.Scale [nRows]"      (default 200,000,000)
  *
  * Prints one JSON line: seconds for global_sort and top_k at n rows —
  * local-mode evidence that the plan shapes hold orders of magnitude past
  * the reference's ceiling; on a real cluster the same plans scale out by
  * partition count.
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gen = spark.read.format("graft-gen")
      .option("n", n).option("bound", 5000000L)
      .option("numPartitions", cpus.toInt * 2).load()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm-up: JVM + codegen init off the clock
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()

    val sortSec = time {
      ops.Sorts.globalSort(gen.select("value"), col("value"))
        .write.format("noop").mode("overwrite").save()
    }
    val topkSec = time {
      ops.Sorts.topK(gen, 100, col("value").desc, col("id"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"n_rows":$n,"global_sort_sec":$sortSec%.1f,"top_k_sec":$topkSec%.1f,"cpus":$cpus}""")
    spark.stop()
  }
}
