package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet scans of the driver-generated corpus (see /root/repo/TESTDATA.md).
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning
  * freedom — every filter and projection in the queries below reaches the
  * parquet reader (`PushedFilters` / `ReadSchema` in explain output).
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * by default ([PARQUET_TYPE_ILLEGAL]). Read nanos as a long and convert
    * to a µs timestamp (Spark's native precision) — truncation below µs is
    * irrelevant to hour/day windowing and matches what any Spark pipeline
    * ingesting ns data does.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    // `div`, not `/`: Column `/` is double division, and ns epochs (~1.7e18)
    // exceed double's 2^53 exact range — `/ 1000` would drift ±1µs on ~12%
    // of rows, flipping formatted seconds / as-of boundaries on unlucky data.
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
