package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.ops.Gen

/** Spark-level tests for the engine's native expressions and helpers:
  * hybrid_sort_array (incl. nulls + threshold validation), simhash60 vs the
  * portable h60 column hash, the bounded top-k aggregate vs a window-function
  * reference implementation, and lcgInts overflow behavior at large ids.
  */
class SparkFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("hybrid_sort_array matches sort_array on int/long arrays") {
    val rows = spark.sql(
      """SELECT hybrid_sort_array(a) AS h, sort_array(a) AS s FROM VALUES
        |(array(3, 1, 2)), (array()), (array(5)),
        |(array(2147483647, -2147483648, 0, 2147483647))
        |AS t(a)""".stripMargin).collect()
    rows.foreach(r => assert(r.get(0) == r.get(1)))
  }

  test("hybrid_sort_array: null elements first, like sort_array and list_sort") {
    val rows = spark.sql(
      "SELECT hybrid_sort_array(array(3, NULL, 1, NULL, 2)) AS h," +
        " sort_array(array(3, NULL, 1, NULL, 2)) AS s").collect()
    assert(rows.head.get(0) == rows.head.get(1))
  }

  test("hybrid_sort_array: custom threshold literal works; junk threshold fails cleanly") {
    val r = spark.sql("SELECT hybrid_sort_array(array(9L, 7L, 8L), 2) AS h").collect()
    assert(r.head.getSeq[Long](0) == Seq(7L, 8L, 9L))
    val e = intercept[Exception] {
      spark.sql("SELECT hybrid_sort_array(array(1), 'x')").collect()
    }
    assert(e.getMessage.contains("threshold must be an integer literal"))
  }

  test("SimHashUtil.h60 matches the portable column h60 (DuckDB-verified value)") {
    // 648541476951500027 == CAST('0x'||substr(md5('abc'),1,15) AS BIGINT) in DuckDB
    assert(SimHashUtil.h60("abc") == 648541476951500027L)
    val fromCol = spark.range(1).select(h60(lit("abc"))).head.getLong(0)
    assert(fromCol == 648541476951500027L)
  }

  test("simhash60 expression: empty array is 0; single token equals its h60 bits") {
    val r = spark.sql(
      "SELECT simhash60(CAST(array() AS array<string>)) AS e," +
        " simhash60(array('abc')) AS one").head()
    assert(r.getLong(0) == 0L)
    // with one token every bit vote follows that token's hash exactly
    assert(r.getLong(1) == SimHashUtil.h60("abc"))
  }

  test("topk_by_score matches window-function top-k on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(2000) { i =>
      (rnd.nextInt(5).toLong, math.rint(rnd.nextDouble() * 1e6) / 1e6, i.toLong)
    }.toDF("query_id", "cos_sim", "nbr_id")
    val viaAgg = rows.groupBy(col("query_id"))
      .agg(expr("topk_by_score(cos_sim, nbr_id, 7)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.nbr_id"), col("col.cos_sim"))
      .orderBy(col("query_id"), col("rank")).collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("nbr_id").asc)
    val viaWindow = rows.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 7)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank")).collect()
    assert(viaAgg.length == viaWindow.length)
    viaAgg.zip(viaWindow).foreach { case (a, b) => assert(a == b) }
  }

  test("topk_by_score: fewer rows than k, and tie-break on smaller id") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0.5, 10L), (1L, 0.5, 3L), (1L, 0.9, 7L))
      .toDF("query_id", "cos_sim", "nbr_id")
    val out = df.groupBy(col("query_id"))
      .agg(expr("topk_by_score(cos_sim, nbr_id, 5)").as("top"))
      .select(posexplode(col("top"))).select(col("col.nbr_id")).as[Long].collect()
    assert(out.toSeq == Seq(7L, 3L, 10L))
  }

  test("tokens + shingles: boundary sizes") {
    val r = spark.range(1).select(
      shingles(tokens(lit("A b, c")), 3).as("s3"),
      shingles(tokens(lit("a b")), 3).as("s_short"),
      tokens(lit("  ")).as("t_blank"))
      .head()
    assert(r.getSeq[String](0) == Seq("a b c"))
    assert(r.getSeq[String](1) == Seq())
    assert(r.getSeq[String](2) == Seq())
  }

  test("lcgInts: non-negative values even for ids beyond 2^31") {
    val big = spark.range(4000000000L, 4000000100L)
      .select((((col("id") % Gen.LcgDomain) * 2654435761L) % 5000000L).as("value"))
    val vals = big.collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0 && v < 5000000L))
  }

  test("fingerprint fold stays in positive i64 domain (overflow guard)") {
    // worst-case intermediate: (FpMod-1)*31 + 1000002 must fit a Long
    val worst = (graft.ops.TextStats.FpMod - 1)
    assert(worst <= Long.MaxValue / 31 - 1000002)
  }

  test("saltedEquiJoin equals the plain equi-join (salt never leaks)") {
    val s = spark
    import s.implicits._
    // skewed: key 0 holds half the fact rows
    val fact = Seq.tabulate(500)(i => (if (i % 2 == 0) 0L else i % 7L, i.toLong))
      .toDF("k", "payload")
    val dim = Seq.tabulate(7)(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val salted = graft.ops.SkewJoin
      .saltedEquiJoin(fact, dim, "k", "dk", xxhash64(col("payload")), 8)
    assert(salted.columns.toSeq == Seq("k", "payload", "dk", "name"))
    val got = salted.orderBy("k", "payload").collect().toSeq
    val plain = fact.join(dim, col("k") === col("dk"))
      .orderBy("k", "payload").collect().toSeq
    assert(got == plain)
  }

  test("bucketed tables join without an exchange") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_bspec").toString
    Seq.tabulate(100)(i => (i.toLong, i * 2L)).toDF("k", "v").write
      .mode("overwrite").format("parquet").option("path", s"$base/a")
      .bucketBy(4, "k").sortBy("k").saveAsTable("t_bspec_a")
    Seq.tabulate(100)(i => (i.toLong, i * 3L)).toDF("k2", "w").write
      .mode("overwrite").format("parquet").option("path", s"$base/b")
      .bucketBy(4, "k2").sortBy("k2").saveAsTable("t_bspec_b")
    val joined = spark.table("t_bspec_a").hint("merge")
      .join(spark.table("t_bspec_b"), col("k") === col("k2"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 100)
  }

  test("partition filter prunes non-matching directories from the scan") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_pspec").toString
    spark.range(300).select(col("id"), (col("id") % 3).as("p"))
      .write.mode("overwrite").partitionBy("p").parquet(base)
    val pruned = spark.read.parquet(base).where(col("p") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // the filter must reach the partition layer, not sit in a post-scan Filter
    assert(!plan.contains("PartitionFilters: []"), plan)
    assert(pruned.count() == 100)
  }

  test("printSink renders without error and returns the printed head (reference O14)") {
    val printed = graft.ops.Sorts.printSink(spark.range(10).toDF(), 3)
    assert(printed.count() == 3)
  }

  test("printSink head is computed once: repeated materializations return identical rows") {
    // Without the internal checkpoint, limit-over-unordered input may pick
    // different rows per execution — the printed rows and the returned
    // frame could silently disagree. The checkpoint pins one head.
    val noOrder = spark.range(0, 1000, 1, 8).toDF()
      .selectExpr("id", "xxhash64(id) as h")
    val head = graft.ops.Sorts.printSink(noOrder, 5)
    val first = head.collect().map(_.toSeq).toSeq
    val second = head.collect().map(_.toSeq).toSeq
    assert(first.size == 5 && first == second)
  }

  test("chunk: window count, overlap, and short-tail behavior") {
    val s = spark
    import s.implicits._
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "one two"), (3L, "")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.chunk(df, 8, 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 3 has no tokens -> no chunks; doc 2 -> one short chunk
    assert(out.count(_._1 == 3L) == 0)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2L, "one two")))
    // doc 1: stride 6 over 100 tokens -> 17 windows, tail holds 4 tokens
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 17)
    assert(d1.head._4.startsWith("t1 t2"))
    assert(d1.last == ((1L, 16L, 4L, "t97 t98 t99 t100")))
    // consecutive full windows share exactly the 2-token overlap
    val w0 = d1(0)._4.split(" ")
    val w1 = d1(1)._4.split(" ")
    assert(w0.takeRight(2).toSeq == w1.take(2).toSeq)
  }

  test("tfidf: rare terms outrank ubiquitous ones; k bounds output") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "common rare common xyz"),
      (2L, "common common other"),
      (3L, "common thing")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.tfidfTopTerms(df, 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.count(_._1 == 1L) == 2)
    // doc 1's top terms are its unique words, never the everywhere-word
    val top1 = out.filter(_._1 == 1L).map(_._3).toSet
    assert(top1 == Set("rare", "xyz"))
    // "common" appears in all docs -> idf = ln(1) = 0 -> never rank 1
    assert(!out.filter(_._2 == 1L).map(_._3).contains("common"))
  }
}
