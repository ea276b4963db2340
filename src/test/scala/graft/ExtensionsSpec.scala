package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-installation path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must resolve every engine
  * function from plain SQL with no imperative registration call.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // ensure a genuinely fresh session so the extensions config applies
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("all engine functions resolve from SQL without register()") {
    val row = spark.sql(
      """SELECT h60('abc') AS h,
        |  minhash31(array('a b c', 'b c d'), 3) AS mh,
        |  simhash60(array('a', 'b')) AS sh,
        |  hybrid_sort_array(array(3, 1, 2)) AS srt
        |""".stripMargin).collect().head
    assert(row.getAs[Long]("h") == graft.functions.SimHashUtil.h60("abc"))
    assert(row.getSeq[Long](row.fieldIndex("mh")).length == 3)
    assert(row.getSeq[Int](row.fieldIndex("srt")).toSeq == Seq(1, 2, 3))
    val agg = spark.sql(
      """SELECT k, topk_by_score(s, i, 2) AS top FROM VALUES
        |  (1, 0.5d, 10L), (1, 0.9d, 11L), (1, 0.1d, 12L) AS t(k, s, i)
        |GROUP BY k""".stripMargin).collect().head
    assert(agg.getSeq[org.apache.spark.sql.Row](agg.fieldIndex("top"))
      .map(_.getAs[Long]("nbr_id")).toSeq == Seq(11L, 10L))
    val mg = spark.sql(
      """SELECT misra_gries(item, 2) AS s FROM VALUES
        |  ('a'), ('a'), ('a'), ('b'), ('c') AS t(item)""".stripMargin)
      .collect().head
    val mgRows = mg.getSeq[org.apache.spark.sql.Row](mg.fieldIndex("s"))
    assert(mgRows.nonEmpty && mgRows.length <= 2)
    assert(mgRows.head.getAs[String]("item") == "a")
  }

  test("integral-literal args: out-of-Int-range and non-integral k are analysis errors, not truncations") {
    // misra_gries(term, 8000000000) used to silently intValue()-truncate
    // into a small/negative k; now every such arg must be an in-range
    // integral literal, rejected with the offending value at analysis time
    def analysisFails(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(fragment)),
        s"expected '$fragment' in ${msgs(e)}")
    }
    analysisFails(
      "SELECT misra_gries(item, 8000000000) FROM VALUES ('a') AS t(item)",
      "outside Int range")
    analysisFails(
      "SELECT misra_gries(item, 2.5) FROM VALUES ('a') AS t(item)",
      "integer literal")
    analysisFails(
      "SELECT hybrid_sort_array(array(3,1), 8000000000) ",
      "outside Int range")
    // in-range LONG literal still resolves (no behavior change)
    assert(spark.sql("SELECT misra_gries(item, 2L) AS s " +
      "FROM VALUES ('a'), ('a') AS t(item)").collect().nonEmpty)
  }

  test("RangeJoinBucketize: naive BETWEEN join plans as hash join, same rows") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    val iv = Seq(
      (1L, "2020-01-01 12:00:00", "2020-01-03 06:00:00"),
      (2L, "2020-01-02 00:00:00", "2020-01-02 00:00:00"),
      (9L, "2020-02-02 00:00:00", "2020-02-01 00:00:00") // malformed lo>hi
    ).toDF("interval_id", "lo_s", "hi_s")
      .select(col("interval_id"), to_timestamp(col("lo_s")).as("lo"),
        to_timestamp(col("hi_s")).as("hi"))
    val pts = Seq(
      (10L, "2020-01-01 11:59:59"), (11L, "2020-01-01 12:00:00"),
      (12L, "2020-01-02 00:00:00"), (13L, "2020-01-03 06:00:00"),
      (14L, "2020-02-01 12:00:00")
    ).toDF("pt_id", "ts_s")
      .select(col("pt_id"), to_timestamp(col("ts_s")).as("ts"))
    // the NAIVE range join — no equi key, would be a nested loop
    val joined = pts.join(iv, col("ts") >= col("lo") && col("ts") <= col("hi"))
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"),
      s"rule did not fire:\n$phys")
    assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"),
      s"no equi join in:\n$phys")
    val got = joined.select(col("pt_id"), col("interval_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((11L, 1L), (12L, 1L), (12L, 2L), (13L, 1L)))
    // schema unchanged by the rewrite
    assert(joined.columns.toSeq ==
      Seq("pt_id", "ts", "interval_id", "lo", "hi"))
  }

  test("RangeJoinBucketize fires on TIMESTAMP_NTZ (the parquet-corpus flavor)") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    val iv = Seq((1L, "2020-01-01 12:00:00", "2020-01-03 06:00:00"))
      .toDF("interval_id", "lo_s", "hi_s")
      .select(col("interval_id"),
        expr("CAST(lo_s AS TIMESTAMP_NTZ)").as("lo"),
        expr("CAST(hi_s AS TIMESTAMP_NTZ)").as("hi"))
    val pts = Seq((10L, "2020-01-02 00:00:00"), (11L, "2020-01-04 00:00:00"))
      .toDF("pt_id", "ts_s")
      .select(col("pt_id"), expr("CAST(ts_s AS TIMESTAMP_NTZ)").as("ts"))
    val joined = pts.join(iv, col("ts") >= col("lo") && col("ts") <= col("hi"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("_graft_"),
      "rule did not fire on NTZ")
    assert(joined.select(col("pt_id")).collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("RangeJoinBucketize fires on DATE operands (the TPC-H flavor)") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    val iv = Seq((1L, "2020-01-01", "2020-01-03"),
                 (2L, "2020-01-02", "2020-01-02"),
                 (9L, "2020-02-02", "2020-02-01")) // malformed lo>hi
      .toDF("interval_id", "lo_s", "hi_s")
      .select(col("interval_id"), col("lo_s").cast("date").as("lo"),
        col("hi_s").cast("date").as("hi"))
    val pts = Seq((10L, "2019-12-31"), (11L, "2020-01-01"),
                  (12L, "2020-01-02"), (13L, "2020-01-03"),
                  (14L, "2020-02-01"))
      .toDF("pt_id", "d_s")
      .select(col("pt_id"), col("d_s").cast("date").as("d"))
    val joined = pts.join(iv, col("d") >= col("lo") && col("d") <= col("hi"))
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"),
      s"rule did not fire on DATE:\n$phys")
    val got = joined.select(col("pt_id"), col("interval_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((11L, 1L), (12L, 1L), (12L, 2L), (13L, 1L)))
  }

  test("RangeJoinBucketize pushes COUNT/SUM below the fan-out when the range join feeds an Aggregate") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    val ivSeq = Seq((1L, "2020-01-01 12:00:00", "2020-01-06 06:00:00"),
                    (2L, "2020-01-02 00:00:00", "2020-01-02 23:00:00"),
                    (3L, "2020-03-01 00:00:00", "2020-03-04 00:00:00"),
                    (9L, "2020-02-02 00:00:00", "2020-02-01 00:00:00"))
      // iv3 matches no points; iv9 is malformed (lo > hi) → zero rows
    val ptSeq = (0 until 240).map(h =>
      (h.toLong, f"2020-01-${1 + h / 24}%02d ${h % 24}%02d:30:00", h * 1.5))
    val iv = ivSeq.toDF("interval_id", "lo_s", "hi_s")
      .select(col("interval_id"), to_timestamp(col("lo_s")).as("lo"),
        to_timestamp(col("hi_s")).as("hi"))
    val pts = ptSeq.toDF("pt_id", "ts_s", "qty")
      .select(col("pt_id"), to_timestamp(col("ts_s")).as("ts"), col("qty"))
    val agg = pts.join(iv, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).cast("double").as("s"))
    val opt = agg.queryExecution.optimizedPlan.toString
    assert(opt.contains("_graft_rj_p0"),
      s"aggregate pushdown did not fire:\n$opt")
    val phys = agg.queryExecution.executedPlan.toString
    assert(!phys.contains("NestedLoop") && !phys.contains("Cartesian"))
    // ground truth replayed in plain Scala (qty values are exact halves,
    // so double sums are order-independent here)
    def t(s: String) = java.sql.Timestamp.valueOf(s).getTime
    def matches(extra: ((Long, String, Double), Long) => Boolean) =
      ivSeq.flatMap { case (id, lo, hi) =>
        ptSeq.filter(p => t(p._2) >= t(lo) && t(p._2) <= t(hi) &&
          extra(p, id)).map(p => (id, p._3))
      }.groupBy(_._1).map { case (id, xs) =>
        (id, xs.size.toLong, xs.map(_._2).sum) }.toSet
    val expect = matches((_, _) => true)
    val got = agg.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, s"pushdown changed the result: $got vs $expect")
    // an extra join conjunct invalidates wholesale interior inclusion —
    // the pushdown must bail (the plain day-bucket rewrite still fires)
    val guarded = pts.join(iv,
        col("ts") >= col("lo") && col("ts") <= col("hi") &&
          col("pt_id") =!= col("interval_id"))
      .groupBy(col("interval_id")).agg(count(lit(1)).as("n"))
    assert(!guarded.queryExecution.optimizedPlan.toString
      .contains("_graft_rj_p0"))
    val gPhys = guarded.queryExecution.executedPlan.toString
    assert(!gPhys.contains("NestedLoop") && !gPhys.contains("Cartesian"))
    val gExpect = matches((p, id) => p._1 != id)
      .map(x => (x._1, x._2))
    assert(guarded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      gExpect)
  }

  test("RangeJoinBucketize leaves equi and non-range joins alone") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "va")
    val b = Seq((1L, 100L), (3L, 300L)).toDF("k2", "vb")
    val equi = a.join(b, col("k") === col("k2"))
    assert(!equi.queryExecution.optimizedPlan.toString.contains("_graft_"))
    assert(equi.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // non-timestamp range: not our pattern, untouched (stays nested loop)
    val rng = a.join(b, col("va") >= col("k2") && col("va") <= col("vb"))
    assert(!rng.queryExecution.optimizedPlan.toString.contains("_graft_"))
    assert(rng.collect().length == 4) // both va fall in both [k2, vb] ranges
  }
}
