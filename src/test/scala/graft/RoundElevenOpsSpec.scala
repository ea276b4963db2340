package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Layout, ModelStore, Similarity}

/** Round-11 additions: n-dimensional z-order (exact strip covers at
  * n=3), the self-applying strip-prune optimizer rule (pruning as a
  * property of the table), the non-broadcast compaction route
  * (byte-identical output past the broadcast threshold), and the
  * partitioned-artifact fix in the ModelStore's durable verification
  * (`_SUCCESS` at the write root, parts in partition subdirs).
  */
class RoundElevenOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-round11-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- n-dimensional z-order ----------------------------------------------

  test("zStripsN is exact at n=3: exhaustive 16^3 brute force; 2-dim wrappers unchanged") {
    // brute force: enumerate EVERY point of the 16^3 domain, compute its
    // strip from the z-value directly, compare strip sets for a mix of
    // boxes (corner, slab, single point, thin shell, full domain)
    def zOf(ds: Seq[Long], bits: Int): Long = {
      val n = ds.size
      (0 until bits).flatMap { i =>
        ds.zipWithIndex.map { case (d, j) =>
          ((d >> i) & 1L) << (i * n + (n - 1 - j))
        }
      }.sum
    }
    val bits = 4
    for {
      stb <- Seq(3, 6)
      box <- Seq(
        Seq((0L, 7L), (0L, 15L), (8L, 15L)),
        Seq((0L, 15L), (0L, 15L), (0L, 15L)),
        Seq((5L, 5L), (11L, 11L), (2L, 2L)),
        Seq((3L, 12L), (0L, 2L), (14L, 15L)),
        Seq((15L, 15L), (0L, 0L), (7L, 8L)))
    } {
      val brute = (for {
        a <- box(0)._1 to box(0)._2
        b <- box(1)._1 to box(1)._2
        c <- box(2)._1 to box(2)._2
      } yield zOf(Seq(a, b, c), bits) >> (3 * bits - stb)).distinct.sorted
      val fast = Layout.zStripsN(box, bits, stb)
      assert(fast == brute,
        s"zStripsN mismatch for box $box stripTopBits=$stb: $fast vs $brute")
    }
    // the 2-dim wrappers delegate without behavior change
    assert(Layout.zStrips(0, 7, 0, 15, 4, 2) == Seq(0L, 1L))
    assert(Layout.zStrips(8, 15, 8, 15, 4, 2) == Seq(3L))
  }

  test("zorderWriteN rejects out-of-domain dimension values at write time") {
    val sp = spark; import sp.implicits._
    val bad = Seq((1L, 3L, 99L), (2L, 40L, 5L)) // 40 and 99 exceed 2^5=32
    val df = bad.toDF("id", "a", "b")
    val e = intercept[Exception] {
      Layout.zorderWriteN(df, Seq("a", "b"), 5, 4, tmp("t_zbad"))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("z-order dimension out of")),
      s"expected domain failure, got: $e")
  }

  // ---- self-applying strip pruning ------------------------------------------

  private def zLayout3(out: String): Unit = {
    val sp = spark; import sp.implicits._
    // 3 independent 16-domains, 4096 rows — every cell populated
    val df = (0 until 4096).map { i =>
      (i.toLong, (i % 16).toLong, ((i / 16) % 16).toLong,
        ((i / 256) % 16).toLong)
    }.toDF("id", "a", "b", "c")
    Layout.zorderWriteN(df, Seq("a", "b", "c"), 4, 6, out): Unit
  }

  private def withRule[T](body: => T): T = {
    val had = spark.experimental.extraOptimizations
      .contains(graft.plans.ZOrderStripPrune)
    if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.ZOrderStripPrune
    try body
    finally if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.ZOrderStripPrune)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get

  private def countParts(f: java.io.File): Int = {
    val cs = Option(f.listFiles()).getOrElse(Array.empty)
    cs.count(c => c.isFile && c.getName.startsWith("part-")) +
      cs.filter(_.isDirectory).map(countParts).sum
  }

  test("ZOrderStripPrune injects the implied strip filter: same rows, fewer files") {
    val out = tmp("t_zauto")
    zLayout3(out)
    withRule {
      // the query a user writes: dimension predicates ONLY
      val auto = spark.read.parquet(out).where(col("a") < 4 && col("c") >= 8)
      val plain = spark.read.parquet(out).where(col("a") < 4 && col("c") >= 8)
        .collect().map(_.getLong(0)).sorted // same session, rule also fires
      auto.collect()
      val scan = scanOf(auto)
      val total = countParts(new java.io.File(out))
      val read = scan.metrics("numFiles").value
      assert(read < total,
        s"rule must prune strip dirs at planning: read $read of $total")
      // the injected filter is on the PARTITION column
      assert(scan.partitionFilters.exists(_.references.exists(
        _.name == "zstrip")), s"no zstrip partition filter in ${scan.partitionFilters}")
      // zero rows lost vs the unpruned evaluation of the same predicate
      val noRule = {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations
            .filterNot(_ == graft.plans.ZOrderStripPrune)
        try spark.read.parquet(out).where(col("a") < 4 && col("c") >= 8)
          .collect().map(_.getLong(0)).sorted
        finally spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.ZOrderStripPrune
      }
      assert(auto.collect().map(_.getLong(0)).sorted.toSeq == noRule.toSeq)
      assert(plain.toSeq == noRule.toSeq)
    }
  }

  test("ZOrderStripPrune respects hand-written strip filters and plain tables") {
    val out = tmp("t_zresp")
    zLayout3(out)
    withRule {
      // a hand-written zstrip predicate disables injection (idempotence
      // guard) — the plan keeps exactly the user's strip set
      val hand = spark.read.parquet(out)
        .where(col("zstrip") === 0 && col("a") < 4)
      hand.collect()
      val inPlan = scanOf(hand).partitionFilters
        .filter(_.references.exists(_.name == "zstrip"))
      assert(inPlan.nonEmpty && !inPlan.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.In]),
        s"hand filter must survive un-augmented: $inPlan")

      // a parquet dir WITHOUT the descriptor is never touched
      val sp = spark; import sp.implicits._
      val plainOut = tmp("t_zplain")
      (0 until 64).map(i => (i.toLong, (i % 16).toLong)).toDF("id", "a")
        .write.mode("overwrite").parquet(plainOut)
      val plain = spark.read.parquet(plainOut).where(col("a") < 4)
      assert(plain.count() == 16)
      assert(scanOf(plain).partitionFilters.isEmpty)
    }
  }

  // ---- non-broadcast compaction route ---------------------------------------

  test("compactionExec past the broadcast threshold: shuffle join, identical output") {
    val sp = spark; import sp.implicits._
    val data = (0 until 120).map { i =>
      (if (i % 2 == 0) "a" else "b", (i / 10).toLong, i.toLong)
    }.toDF("pt", "chunk", "id")
    val chunks = data.groupBy(col("pt"), col("chunk"))
      .agg((count(lit(1)) * 4).as("bytes"))

    val outB = tmp("t_cb")
    Layout.compactionExec(data, Seq("pt"), "chunk", "bytes", 100L, chunks, outB)

    // force the non-broadcast route (threshold 0 chunks) and keep Spark
    // from auto-broadcasting the small fixture manifest — at real scale
    // the GB manifest exceeds the auto threshold on its own
    val outS = tmp("t_cs")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try Layout.compactionExec(data, Seq("pt"), "chunk", "bytes", 100L, chunks,
      outS, maxBroadcastChunks = 0L)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)

    // identical rows, identical file-group routing, identical file layout
    val readB = spark.read.parquet(outB)
      .select("pt", "file_group", "chunk", "id")
      .collect().map(_.toSeq).sortBy(_.toString)
    val readS = spark.read.parquet(outS)
      .select("pt", "file_group", "chunk", "id")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(readB.toSeq == readS.toSeq)
    assert(countParts(new java.io.File(outB)) ==
      countParts(new java.io.File(outS)))

    // and the shuffle route genuinely planned a non-broadcast join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val planStr =
      try {
        val assign = Layout.compactionAssign(chunks, Seq("pt"), "chunk",
          "bytes", 100L).select(col("pt"), col("chunk"), col("file_group"))
        data.join(assign, Seq("pt", "chunk"))
          .queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    assert(!planStr.contains("BroadcastHashJoin"),
      s"expected a shuffle join route:\n$planStr")
    assert(planStr.contains("SortMergeJoin") ||
      planStr.contains("ShuffledHashJoin"), s"no shuffle join in:\n$planStr")
  }

  // ---- residual PQ ----------------------------------------------------------

  test("residual IVF-PQ beats raw-vector codes on clustered data at identical bytes") {
    val sp = spark; import sp.implicits._
    // clustered corpus — residual PQ's regime: 8 well-separated centers,
    // small deterministic within-cluster noise. (On an ISOTROPIC corpus
    // — the driver fixture — the coarse cells explain ~nothing and the
    // shipped ann_recall_ivfpq_res probe correctly prices the gain at
    // ~zero; this test pins the claim where the structure exists.)
    val dim = 64
    def center(c: Int, j: Int): Double = math.sin(c * 37.0 + j * 13.0)
    val corpus = (0 until 400).map { i =>
      val c = i % 8
      (i.toLong, (0 until dim).map(j =>
        center(c, j) + 0.15 * math.sin(i * 101.0 + j * 29.0)).toArray)
    }.toDF("vec_id", "embedding")

    // coarse quantizer: the engine's own Lloyd loop (16 cells, 3 rounds)
    val centRows = Similarity.kmeansTrain(corpus, 16, 3).collect()
    val byCell = centRows.groupBy(_.getLong(0)).toArray.sortBy(_._1)
    val ids = byCell.map(_._1)
    val embs = byCell.map { case (_, rs) =>
      rs.sortBy(_.getLong(1)).map(_.getDouble(3)) }

    // identical bytes: same sample size, same subs, same nprobe
    val rawCb = Similarity.pqCodebook(corpus, 16)
    val resCb = Similarity.pqResCodebook(corpus, 16, ids, embs)
    val queries = corpus.where(col("vec_id") < 8)
    val rec = Similarity.annRecallIvfPqRes(corpus, queries, 5, ids, embs,
      8, rawCb, resCb, 2).collect()
    val rawAvg = rec.map(_.getAs[Double]("recall_raw")).sum / rec.length
    val resAvg = rec.map(_.getAs[Double]("recall_res")).sum / rec.length
    assert(rec.exists(_.getAs[Double]("recall_raw") < 1.0),
      "probe must not be vacuous: raw recall saturated on every query")
    assert(resAvg > rawAvg,
      s"residual codes must WIN on clustered data: res=$resAvg raw=$rawAvg")
  }

  // ---- partitioned durable artifacts ----------------------------------------

  test("durable fit verifies partitionBy artifacts (_SUCCESS at root, parts in subdirs)") {
    val sp = spark; import sp.implicits._
    val root = tmp("t_store_part")
    ModelStore.reset()
    // a partitionBy write: _SUCCESS lands at the artifact root only,
    // parts under pt=a/, pt=b/ — pre-fix verification threw and the
    // artifact could never publish under a durable root
    val path = ModelStore.fitAt(root, "partitioned|fixture", "t_part") { p =>
      Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("pt", "v")
        .write.mode("overwrite").partitionBy("pt").parquet(p)
    }
    assert(new java.io.File(path, "_graft_fit_done").isFile,
      "partitioned artifact must publish")
    assert(spark.read.parquet(path).count() == 3)
    // loads from a fresh process-memo state hit the published artifact
    ModelStore.reset()
    var retrained = false
    val again = ModelStore.fitAt(root, "partitioned|fixture", "t_part") { _ =>
      retrained = true
    }
    assert(again == path && !retrained, "second fit must LOAD, not retrain")
  }
}
