package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of one or more
  * `SparkEntry.queries` entries without executing them.
  *
  *   sbt "runMain graft.Explain <sfDir> <query>[,<query>...]"
  *
  * Used to review every operator's plan shape after it goes green: filters
  * pushed to the scan, broadcasts where a side is small, no nested-loop
  * joins, no unexpected exchanges. (Streaming queries execute on
  * construction, so explain them via their batch twins instead.)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.filterNot(_.startsWith("stream_")).toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events reader prerequisite - see Tables.NanosAsLongConf
      .config(graft.ops.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
