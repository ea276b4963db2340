package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-schema canary: opens every driver-generated parquet with the
  * engine's own readers ([[graft.ops.Tables]]) and asserts (a) the read is
  * accepted end-to-end (analyzer + first batch, not just footer schema),
  * (b) the columns the queries depend on are present, and (c) the one
  * column with an engine-side normalization contract — `events.ts` — lands
  * as exactly the type every events query and oracle was written against.
  *
  * The corpus is regenerated between rounds and its physical schemas have
  * drifted before (round 4: `events.ts` silently changed from nanos-as-long
  * to TIMESTAMP(MICROS), failing 7 suites with cryptic analyzer errors and
  * darkening 25 driver queries). This suite turns the NEXT such drift into
  * one failure that names the drifted table/column.
  */
class TestdataCanarySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-canary-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      // events reader prerequisite - see Tables.NanosAsLongConf
      .config(graft.ops.Tables.NanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def accepts(table: String, df: DataFrame, cols: String*): Unit = {
    cols.foreach { c =>
      assert(df.schema.fieldNames.contains(c),
        s"$table: column '$c' missing — corpus schema drifted. " +
          s"Observed:\n${df.schema.treeString}")
    }
    // Force a real read: analyzer errors and physical-type rejections
    // (e.g. [PARQUET_TYPE_ILLEGAL]) only surface on execution.
    try df.limit(1).collect()
    catch { case e: Throwable =>
      fail(s"$table: engine reader no longer accepts the corpus file " +
        s"(schema:\n${df.schema.treeString})\n${e.getMessage}")
    }
  }

  test("all 10 corpus tables open via the engine readers with expected columns") {
    import graft.ops.Tables._
    accepts("lineitem", lineitem(spark, sfDir), "l_orderkey", "l_partkey",
      "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate")
    accepts("orders", orders(spark, sfDir), "o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    accepts("customer", customer(spark, sfDir), "c_custkey", "c_name",
      "c_nationkey", "c_acctbal", "c_mktsegment")
    accepts("supplier", supplier(spark, sfDir), "s_suppkey", "s_name",
      "s_nationkey", "s_acctbal")
    accepts("part", part(spark, sfDir), "p_partkey", "p_name", "p_brand",
      "p_type", "p_size", "p_retailprice")
    accepts("nation", nation(spark, sfDir), "n_nationkey", "n_name",
      "n_regionkey")
    accepts("region", region(spark, sfDir), "r_regionkey", "r_name")
    accepts("documents", documents(spark, sfDir), "doc_id", "text", "lang",
      "source", "n_chars")
    accepts("embeddings", embeddings(spark, sfDir), "vec_id", "embedding",
      "label")
    accepts("events", events(spark, sfDir), "event_id", "ts", "user_id",
      "event_type", "value", "props")
  }

  test("events reader normalizes ts to session-TZ TimestampType (reader contract)") {
    // Whatever the corpus generation stores (nanos-as-long or
    // TIMESTAMP(MICROS)/NTZ), the engine-facing type must be the µs
    // session-TZ timestamp every events query and oracle assumes.
    val ev = graft.ops.Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts: expected TimestampType after normalization, got " +
        s"${ev.schema("ts").dataType} — corpus encoding drifted past " +
        "Tables.normalizeTs; add the new branch there")
    // And the streaming reader must agree with the batch reader.
    val st = graft.streaming.StreamOps.eventsStream(spark, sfDir)
    assert(st.schema("ts").dataType == TimestampType,
      s"eventsStream ts: expected TimestampType, got ${st.schema("ts").dataType}")
  }

  test("normalizeTs handles all three ts encodings") {
    val s = spark
    import s.implicits._
    // nanos-as-long corpus: exact floor-division to µs (the 2^53
    // double-drift guard — see Tables.normalizeTs).
    val fromLong = graft.ops.Tables.normalizeTs(
      Seq(1700000000123456789L).toDF("ts"))
    assert(fromLong.schema("ts").dataType == TimestampType)
    val micros = fromLong
      .select(org.apache.spark.sql.functions.unix_micros($"ts")).as[Long].head()
    assert(micros == 1700000000123456L)

    // TIMESTAMP(MICROS) isAdjustedToUTC=false corpus → TimestampNTZ in,
    // value-preserving under the UTC session.
    val ntz = Seq("2023-11-14T22:13:20.123456").toDF("s")
      .selectExpr("cast(s as timestamp_ntz) as ts")
    val fromNtz = graft.ops.Tables.normalizeTs(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    val v = fromNtz
      .select(org.apache.spark.sql.functions.unix_micros($"ts")).as[Long].head()
    assert(v == 1700000000123456L)

    // Already-TimestampType input passes through untouched.
    val tz = Seq(1700000000123456L).toDF("us")
      .selectExpr("timestamp_micros(us) as ts")
    assert(graft.ops.Tables.normalizeTs(tz).schema("ts").dataType == TimestampType)
  }

  test("normalizeTs NTZ branch is independent of spark.sql.session.timeZone") {
    // A library caller does NOT necessarily run UTC sessions. The NTZ
    // wall time is the UTC rendering of the instant; the UTC-anchored
    // convert_timezone + cast must recover the same instant under any
    // session zone (a bare cast(NTZ as timestamp) shifts by the zone
    // offset — the bug class this pins down).
    val s = spark
    import s.implicits._
    def instantUnder(zone: String): Long = {
      val key = "spark.sql.session.timeZone"
      val prev = s.conf.get(key)
      s.conf.set(key, zone)
      try {
        val ntz = Seq("2023-11-14T22:13:20.123456").toDF("str")
          .selectExpr("cast(str as timestamp_ntz) as ts")
        graft.ops.Tables.normalizeTs(ntz)
          .select(org.apache.spark.sql.functions.unix_micros($"ts"))
          .as[Long].head()
      } finally s.conf.set(key, prev)
    }
    val utc = instantUnder("UTC")
    assert(utc == 1700000000123456L)
    assert(instantUnder("America/New_York") == utc)
    assert(instantUnder("Asia/Kolkata") == utc) // half-hour offset zone
  }

  test("embeddings: dimension is uniform and matches the engine's EmbDim=64 contract") {
    // PQ sub-space slicing, SRP planes, and the per-dim oracles all bake
    // in the 64-dim contract (SparkEntry.EmbDim, divisible by PqSubs=8).
    // A corpus regeneration that changes the dim must fail HERE with a
    // name, not as NULL-slice garbage inside pq_encode.
    val dims = graft.ops.Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding")).as("d"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(64),
      s"embeddings.embedding dims drifted to $dims — update EmbDim and " +
        "the PqSubs divisibility in SparkEntry + the per-dim oracles")
  }

  test("docs truth-sync: README query count matches SparkEntry, every query has an oracle") {
    val n = SparkEntry.queries.size
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      "every queries entry needs an oracleSql twin (and no orphan oracles): " +
        s"missing=${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet} " +
        s"orphans=${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(readme.contains(s"$n queries"),
      s"README.md must state the real query count ('$n queries') — " +
        "update the docs when the map grows, this assertion keeps them honest")
  }
}
