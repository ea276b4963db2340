package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Layout, ModelStore, Similarity, TextStats}

/** Round-10 additions: top-m PCA by deflation (pinned to the
  * 1-component loop and to orthogonality), the shipped-quantizer
  * multi-probe path (nprobe=1 identity + recall monotone in nprobe),
  * content fingerprinting + atomic durable publication in the
  * ModelStore, df-pruned sparse retrieval, and the compaction EXECUTE
  * step (rows land per plan, clustering preserved).
  */
class RoundTenOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-round10-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def embDf(n: Int, dim: Int) = {
    val sp = spark; import sp.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j =>
        math.sin(i * 31 + j * 7) * 2.0 + (if (j == 0) i * 0.05 else 0.0)).toArray)
    }.toDF("vec_id", "embedding")
  }

  // ---- top-m PCA --------------------------------------------------------

  test("pcaTopMLoop(m=1) reproduces pcaPowerLoop bit-for-bit") {
    val e = embDf(50, 8)
    val (mu1, v1, eig1, n1) = Similarity.pcaPowerLoop(e, 2, 8)
    val (muM, vM, eigM, nM) = Similarity.pcaTopMLoop(e, 2, 8, 1)
    assert(mu1.toSeq == muM.toSeq && v1.toSeq == vM(0).toSeq)
    assert(eig1 == eigM(0) && n1 == nM)
  }

  test("top-m components are unit and mutually orthogonal after deflation") {
    val e = embDf(60, 8)
    val (_, comps, eigs, _) = Similarity.pcaTopMLoop(e, 5, 8, 3)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    comps.foreach { v =>
      assert(math.abs(dot(v, v) - 1.0) < 1e-4, "components must be unit")
    }
    for (i <- comps.indices; j <- 0 until i)
      assert(math.abs(dot(comps(i), comps(j))) < 1e-3,
        s"components $i,$j must be orthogonal after deflation")
    // NOTE: eigenvalue monotonicity is a CONVERGENCE property, not an
    // invariant at a fixed round count — an unconverged component 1 can
    // report a smaller Rayleigh estimate than the deflated component 2.
    // The loop is round-exact by design (oracle-replayable), so only
    // positivity is asserted here.
    eigs.foreach(ev => assert(ev > 0.0, s"eigenvalues must be positive: ${eigs.toSeq}"))
  }

  test("pcaProjectMWith pc1 equals pcaProjectWith pc1; artifact roundtrips") {
    val e = embDf(40, 8)
    val (mu, comps, eigs, n) = Similarity.pcaTopMLoop(e, 2, 8, 2)
    val one = Similarity.pcaProjectWith(e, mu, comps(0))
      .select(col("vec_id"), col("pc1")).orderBy("vec_id").collect()
    val many = Similarity.pcaProjectMWith(e, mu, comps)
      .select(col("vec_id"), col("pc1")).orderBy("vec_id").collect()
    assert(one.toSeq == many.toSeq)

    val p = ModelStore.scratchDir("t_pcam")
    ModelStore.savePcaM(spark, mu, comps, eigs, n, p)
    val (m2, c2, e2, n2) = ModelStore.loadPcaM(spark, p)
    assert(m2.toSeq == mu.toSeq && n2 == n)
    assert(c2.length == 2 && c2(0).toSeq == comps(0).toSeq &&
      c2(1).toSeq == comps(1).toSeq)
    assert(e2.toSeq == eigs.toSeq)
  }

  // ---- shipped-quantizer multi-probe ------------------------------------

  test("ivfTopKProbeWith(nprobe=1) equals ivfTopKWith; recall monotone in nprobe") {
    val e = embDf(80, 8)
    val q = e.where(col("vec_id") < 4)
    val cents = Similarity.kmeansTrain(e, 6, 2)
    val p = ModelStore.scratchDir("t_ivfp")
    ModelStore.saveCentroids(cents, p)
    val (ids, embs) = ModelStore.centroidArrays(spark, p)

    val a = Similarity.ivfTopKWith(e, q, 5, ids, embs)
      .orderBy("query_id", "rank").collect()
    val b = Similarity.ivfTopKProbeWith(e, q, 5, ids, embs, 1)
      .orderBy("query_id", "rank").collect()
    assert(a.toSeq == b.toSeq, "nprobe=1 must reproduce the single-cell path")

    val rec = Similarity.annRecallTrained(e, q, 5, ids, embs, 2).collect()
    assert(rec.nonEmpty)
    rec.foreach { r =>
      val (p1, p2) = (r.getAs[Double]("recall_p1"), r.getAs[Double]("recall_p2"))
      assert(p2 >= p1, s"recall must be monotone in nprobe: p1=$p1 p2=$p2")
      assert(p1 >= 0.0 && p2 <= 1.0)
    }
  }

  test("ivfPqTopK probing ALL cells reduces to plain PQ-ADC (pqTopKWith)") {
    val e = embDf(60, 8)
    val q = e.where(col("vec_id") < 3)
    val cents = Similarity.kmeansTrain(e, 4, 2)
    val p = ModelStore.scratchDir("t_ivfpq")
    ModelStore.saveCentroids(cents, p)
    val (ids, embs) = ModelStore.centroidArrays(spark, p)
    val codebook = Similarity.pqCodebook(e, 4)
    val full = Similarity.pqTopKWith(e, q, 5, 2, codebook)
      .orderBy("query_id", "rank").collect()
    val ivfpq = Similarity.ivfPqTopK(e, q, 5, ids, embs, 2, codebook,
        nprobe = ids.length)
      .orderBy("query_id", "rank").collect()
    assert(ivfpq.toSeq == full.toSeq,
      "nprobe=K must score every candidate exactly like the unrouted ADC")
    // nprobe=1 returns a (possibly shorter) per-query subset ranked the
    // same way — every hit it does return must appear in the full
    // ranking with an identical distance
    val one = Similarity.ivfPqTopK(e, q, 5, ids, embs, 2, codebook, 1)
      .select("query_id", "nbr_id", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fullAdc = Similarity.pqTopKWith(e, q, 60, 2, codebook)
      .select("query_id", "nbr_id", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    one.foreach { case (k, d) =>
      assert(fullAdc(k) == d, s"probed candidate $k must carry the exact ADC")
    }
  }

  // ---- ModelStore: fingerprint + atomic durable publish ------------------

  test("fingerprint changes when a file under the dir is rewritten") {
    val d = java.nio.file.Files.createTempDirectory("t_fp")
    val f = d.resolve("data.bin")
    java.nio.file.Files.write(f, "aaaa".getBytes)
    val fp1 = ModelStore.fingerprint(d.toString)
    assert(fp1 == ModelStore.fingerprint(d.toString), "fingerprint must be stable")
    // same-size rewrite: mtime still moves the fingerprint
    java.nio.file.Files.write(f, "bbbb".getBytes)
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(f).toMillis + 2000))
    assert(ModelStore.fingerprint(d.toString) != fp1,
      "regenerated content must change the fingerprint")
    // different file set too
    java.nio.file.Files.write(d.resolve("extra.bin"), "x".getBytes)
    assert(ModelStore.fingerprint(d.toString) != fp1)
  }

  test("fingerprint-keyed fit retrains after an in-place corpus rewrite") {
    val root = java.nio.file.Files.createTempDirectory("t_fp_store").toString
    val corpus = java.nio.file.Files.createTempDirectory("t_fp_corpus")
    java.nio.file.Files.write(corpus.resolve("t.parquet"), "v1".getBytes)
    var trained = 0
    def fitOnce() = ModelStore.fitAt(root,
      s"demo|${ModelStore.fingerprint(corpus.toString)}", "t_fpfit") { p =>
      trained += 1
      ModelStore.saveWeights(spark, Seq("a"), Array(trained.toDouble), p)
    }
    fitOnce(); fitOnce()
    assert(trained == 1, "unchanged corpus must reuse the artifact")
    // rewrite the corpus in place under the SAME path
    java.nio.file.Files.write(corpus.resolve("t.parquet"), "v2-longer".getBytes)
    fitOnce()
    assert(trained == 2, "rewritten corpus must retrain, never serve stale state")
  }

  test("durable publish is atomic: pre-rename debris is replaced, a complete artifact wins") {
    val root = java.nio.file.Files.createTempDirectory("t_pub").toString
    ModelStore.reset()
    var trained = 0
    def fitOnce() = ModelStore.fitAt(root, "pub-k1", "t_pub") { p =>
      trained += 1
      ModelStore.saveWeights(spark, Seq("a"), Array(7.5), p)
    }
    val p1 = fitOnce()
    assert(trained == 1)
    val marker = new java.io.File(p1, "_graft_fit_done")
    assert(marker.isFile, "publish must end with the completion marker")
    // a complete artifact is loaded by a "new process" (memo cleared)
    ModelStore.reset()
    assert(fitOnce() == p1 && trained == 1)
    // simulate a crashed pre-rename writer: marker gone = debris; the
    // next fit must replace the directory wholesale and re-publish
    ModelStore.reset()
    assert(marker.delete())
    val p3 = fitOnce()
    assert(p3 == p1 && trained == 2, "debris without a marker must be retrained")
    assert(new java.io.File(p3, "_graft_fit_done").isFile)
    assert(ModelStore.loadWeights(spark, Seq("a"), p3).toSeq == Seq(7.5))
    // no temp build dirs left behind under the root
    val leftovers = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith(".t_pub_fit_"))
    assert(leftovers.isEmpty, s"temp build dirs must not leak: ${leftovers.toSeq}")
  }

  test("a torn parquet part fails verification and nothing is published") {
    val root = java.nio.file.Files.createTempDirectory("t_torn").toString
    ModelStore.reset()
    intercept[IllegalArgumentException] {
      ModelStore.fitAt(root, "torn-k1", "t_torn") { p =>
        // hand-write a fake "part" with no PAR1 footer and no _SUCCESS
        new java.io.File(p).mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p, "part-00000.parquet"),
          "not a parquet file".getBytes)
      }
    }
    val dirs = new java.io.File(root).listFiles().filterNot(_.getName.startsWith("."))
    assert(dirs.forall(d => !new java.io.File(d, "_graft_fit_done").isFile),
      "a failed verification must never publish a marker")
  }

  // ---- df-pruned sparse retrieval ----------------------------------------

  test("sparse recall: frac=1 keeps everything (recall 1); pruning drops hot terms") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta common"), (2L, "alpha common common"),
      (3L, "beta gamma common"), (4L, "gamma common delta"),
      (5L, "delta common alpha")).toDF("doc_id", "text")
    val tk = docs.select(col("doc_id"),
      graft.functions.tokens(col("text")).as("tk"))
    val qs = Seq((0L, "alpha common"))
    val full = TextStats.sparseRecallTk(tk, qs, 3, 1.0).collect()
    assert(full.length == 1 && full.head.getAs[Double]("recall") == 1.0,
      "an unpruned index must agree with itself")
    // 'common' appears in 5/5 docs; cap at 90% prunes exactly it
    val pruned = TextStats.sparseKnnTk(tk, qs, 3, Some(0.9))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = TextStats.sparseKnnTk(tk, qs, 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pruned.nonEmpty, "query term 'alpha' survives the cap")
    // ranking may legitimately differ once 'common' is gone
    val rec = TextStats.sparseRecallTk(tk, qs, 3, 0.9).collect().head
    assert(rec.getAs[Long]("n_exact") == exact.size)
    assert(rec.getAs[Long]("n_hit") == (exact intersect pruned).size)
  }

  // ---- z-order skip index --------------------------------------------------

  test("zStrips is exact on quadrant boxes; zorderWrite scans prune strips at planning time") {
    // bits=4, stripTopBits=2: strip bits are (a3, b3) — the top bit of
    // each dimension — so the strip grid is the 2×2 quadrant split
    assert(Layout.zStrips(0, 15, 0, 15, 4, 2) == Seq(0L, 1L, 2L, 3L))
    assert(Layout.zStrips(0, 7, 0, 15, 4, 2) == Seq(0L, 1L), "a<8 fixes a3=0")
    assert(Layout.zStrips(0, 15, 0, 7, 4, 2) == Seq(0L, 2L), "b<8 fixes b3=0")
    assert(Layout.zStrips(8, 15, 8, 15, 4, 2) == Seq(3L))

    // exhaustive cross-check against brute force: a strip qualifies iff
    // SOME point of the box lands in it — enumerate every (a, b) of the
    // 32×32 domain, compute its strip from the z-value directly, and
    // compare the resulting strip sets for a mix of boxes
    def zOf(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i + 1)) |
        (((b >> i) & 1L) << (2 * i))).sum
    for ((aLo, aHi, bLo, bHi) <- Seq((0L, 7L, 0L, 31L), (5L, 11L, 17L, 23L),
        (31L, 31L, 0L, 0L), (0L, 31L, 9L, 9L), (13L, 29L, 2L, 30L))) {
      val brute = (for {
        a <- aLo to aHi; b <- bLo to bHi
      } yield zOf(a, b, 5) >> (2 * 5 - 4)).distinct.sorted
      val fast = Layout.zStrips(aLo, aHi, bLo, bHi, 5, 4)
      assert(fast == brute,
        s"zStrips mismatch for box [$aLo,$aHi]x[$bLo,$bHi]: $fast vs $brute")
    }

    val sp = spark; import sp.implicits._
    val df = (0 until 1024).map(i =>
      (i.toLong, (i % 32).toLong, ((i / 32) % 32).toLong)).toDF("id", "a", "b")
    val out = java.nio.file.Files.createTempDirectory("t_zw").toString
    Layout.zorderWrite(df, "a", "b", 5, 4, out)
    val strips = Layout.zStrips(0, 7, 0, 31, 5, 4)
    assert(strips.length == 4, s"a<8 must qualify 4 of 16 strips: $strips")
    val pruned = spark.read.parquet(out)
      .where(col("zstrip").isin(strips: _*) && col("a") < 8)
    val full = spark.read.parquet(out).where(col("a") < 8)
    // the strip filter is implied by the predicate: zero rows lost
    assert(pruned.orderBy("id").collect().toSeq ==
      full.orderBy("id").collect().toSeq)
    // and it prunes at planning time: the scan reads only the
    // qualifying strip directories' files
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    def countParts(f: java.io.File): Int = {
      val cs = Option(f.listFiles()).getOrElse(Array.empty)
      cs.count(c => c.isFile && c.getName.startsWith("part-")) +
        cs.filter(_.isDirectory).map(countParts).sum
    }
    val totalFiles = countParts(new java.io.File(out))
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles < totalFiles,
      s"strip filter must prune files at planning: read $readFiles of $totalFiles")
  }

  // ---- compaction execute -------------------------------------------------

  test("compactionExec writes one file per planned group, rows routed per plan, clustering preserved") {
    val sp = spark; import sp.implicits._
    // 2 partitions × 12 chunks of 20 "bytes" (5 rows × 4): target 100 →
    // sequential packing gives 5 chunks per full group (cum-before
    // 0..80 → g0, 100..180 → g1, 200/220 → g2 with the 2 leftovers)
    val data = (0 until 120).map { i =>
      (if (i % 2 == 0) "a" else "b", (i / 10).toLong, i.toLong)
    }.toDF("pt", "chunk", "id")
    val chunks = data.groupBy(col("pt"), col("chunk"))
      .agg((count(lit(1)) * 4).as("bytes"))
    val plan = Layout.compactionPlan(chunks, Seq("pt"), "chunk", "bytes", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(plan(("a", 0L)) == ((5L, 100L)) && plan(("a", 1L)) == ((5L, 100L))
      && plan(("a", 2L)) == ((2L, 40L)), s"unexpected plan: $plan")

    val out = java.nio.file.Files.createTempDirectory("t_compact").toString
    Layout.compactionExec(data, Seq("pt"), "chunk", "bytes", 100L, chunks, out)
    val back = spark.read.parquet(out)
    // every (pt, file_group) dir holds exactly ONE data file
    val groups = back.select(col("pt"), col("file_group").cast("long"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    groups.foreach { case (pt, g) =>
      val dir = new java.io.File(s"$out/pt=$pt/file_group=$g")
      val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length == 1, s"group $pt/$g must be ONE packed file")
    }
    // row routing matches the plan's chunk→group map; chunk ranges of
    // consecutive groups are disjoint and ordered (clustering preserved)
    val stats = back.groupBy(col("pt"), col("file_group").cast("long").as("g"))
      .agg(count(lit(1)).as("n"), min("chunk").as("mn"), max("chunk").as("mx"))
      .orderBy(col("pt"), col("g")).collect()
    assert(stats.map(_.getAs[Long]("n")).sum == 120)
    stats.groupBy(_.getString(0)).foreach { case (_, rows) =>
      rows.sortBy(_.getAs[Long]("g")).sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo.getAs[Long]("mx") < hi.getAs[Long]("mn"),
            "file groups must cover disjoint, ordered chunk ranges")
        case _ =>
      }
    }
  }
}
