package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Learn, ModelStore, Similarity}

/** Fitted-state persistence: every save/load pair must round-trip
  * bit-exact (doubles survive parquet unchanged), the fit memo must
  * train once per key, and an apply-from-artifact pass must equal the
  * train-then-apply pass it replaces — the contract the `*_store` /
  * apply queries stake their correctness rows on.
  */
class ModelStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-modelstore-test")
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
        math.sin(i * 31 + j * 7) * 2.0).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("weights round-trip bit-exact and reject missing features") {
    val p = ModelStore.scratchDir("t_w")
    val w = Array(0.123456, -9.87, 0.0)
    ModelStore.saveWeights(spark, Learn.featureNames, w, p)
    val back = ModelStore.loadWeights(spark, Learn.featureNames, p)
    assert(back.toSeq == w.toSeq)
    intercept[RuntimeException] {
      ModelStore.loadWeights(spark, Seq("x0", "nope"), p)
    }
  }

  test("PCA state round-trips (mu, v, eigval, n) bit-exact") {
    val p = ModelStore.scratchDir("t_pca")
    val mu = Array(1.5, -2.25, 0.000001)
    val v = Array(0.6, -0.64, 0.48)
    ModelStore.savePca(spark, mu, v, 3.14159, 42L, p)
    val (m2, v2, e2, n2) = ModelStore.loadPca(spark, p)
    assert(m2.toSeq == mu.toSeq && v2.toSeq == v.toSeq)
    assert(e2 == 3.14159 && n2 == 42L)
  }

  test("SQ bounds and PQ codebook round-trip bit-exact") {
    val p1 = ModelStore.scratchDir("t_sq")
    val mns = Array(-1.5, 0.25); val mxs = Array(2.5, 0.25)
    ModelStore.saveSqBounds(spark, mns, mxs, p1)
    val (m, x) = ModelStore.loadSqBounds(spark, p1)
    assert(m.toSeq == mns.toSeq && x.toSeq == mxs.toSeq)

    val p2 = ModelStore.scratchDir("t_pq")
    val cents = Array(Array(1.0, 2.0, 3.0, 4.0), Array(-1.0, 0.5, 0.25, 8.0))
    ModelStore.savePqCodebook(spark, cents, p2)
    val back = ModelStore.loadPqCodebook(spark, p2)
    assert(back.length == 2)
    assert(back(0).toSeq == cents(0).toSeq && back(1).toSeq == cents(1).toSeq)
  }

  test("fit memo trains once per key, distinct keys train separately") {
    ModelStore.reset()
    var trained = 0
    def path(key: String) = ModelStore.fit(key, "t_fit") { p =>
      trained += 1
      ModelStore.saveWeights(spark, Seq("a"), Array(1.0), p)
    }
    val p1 = path("k1"); val p2 = path("k1"); val p3 = path("k2")
    assert(p1 == p2, "same key must reuse the artifact")
    assert(p1 != p3, "different key must not share state")
    assert(trained == 2, s"expected 2 trainings, got $trained")
    ModelStore.reset()
  }

  test("durable store root: a second process loads instead of retraining") {
    val root = java.nio.file.Files.createTempDirectory("t_store_root").toString
    System.setProperty("graft.store.dir", root)
    try {
      ModelStore.reset()
      var trained = 0
      def fitOnce() = ModelStore.fit("durable-k1", "t_dur") { p =>
        trained += 1
        ModelStore.saveWeights(spark, Seq("a"), Array(2.5), p)
      }
      val p1 = fitOnce()
      assert(trained == 1)
      assert(new java.io.File(p1, "_graft_fit_done").isFile,
        "completion marker must exist after training")
      // simulate a NEW process: the in-memory memo is gone, the durable
      // artifact is not — fit must load, not retrain
      ModelStore.reset()
      val p2 = fitOnce()
      assert(p2 == p1, "same key must resolve to the same durable dir")
      assert(trained == 1, s"second process must not retrain, got $trained")
      assert(ModelStore.loadWeights(spark, Seq("a"), p2).toSeq == Seq(2.5))
      // a half-written artifact (no marker) is retrained into place
      ModelStore.reset()
      assert(new java.io.File(p1, "_graft_fit_done").delete())
      fitOnce()
      assert(trained == 2, "missing marker must force a retrain")
      assert(ModelStore.loadWeights(spark, Seq("a"), p1).toSeq == Seq(2.5))
    } finally {
      System.clearProperty("graft.store.dir")
      ModelStore.reset()
    }
  }

  test("apply-from-artifact equals train-then-apply (logreg + PCA + SQ + PQ)") {
    val sp = spark; import sp.implicits._
    val docsDf = (1 to 60).map { i =>
      (i.toLong, if (i % 3 == 0) "en" else "fr",
        (i * 37 % 900 + 100).toLong,
        Seq.fill(i % 7 + 1)("word").mkString(" "))
    }.toDF("doc_id", "lang", "n_chars", "text")

    // logreg: score via trained weights vs artifact-loaded weights
    val feats = Learn.docFeatures(docsDf)
    val w = Learn.trainWeights(feats, Learn.featureNames, 2, 0.5)
    val p = ModelStore.scratchDir("t_lr")
    ModelStore.saveWeights(spark, Learn.featureNames, w, p)
    val direct = Learn.aucOfWeights(docsDf, w).head()
    val loaded = Learn.aucOfWeights(docsDf,
      ModelStore.loadWeights(spark, Learn.featureNames, p)).head()
    assert(direct == loaded)

    // PCA: projectWith(loaded) ≡ pcaProject(train-inline)
    val e = embDf(40, 8)
    val (mu, v, eig, n) = Similarity.pcaPowerLoop(e, 2, 8)
    val pp = ModelStore.scratchDir("t_pca2")
    ModelStore.savePca(spark, mu, v, eig, n, pp)
    val (m2, v2, _, _) = ModelStore.loadPca(spark, pp)
    val a = Similarity.pcaProject(e, 2, 8).orderBy("vec_id").collect()
    val b = Similarity.pcaProjectWith(e, m2, v2).orderBy("vec_id").collect()
    assert(a.toSeq == b.toSeq)

    // SQ: encodeWith(loaded bounds) ≡ sqEncode(in-plan bounds)
    val (mns, mxs) = Similarity.sqBoundsArrays(e, 8)
    val ps = ModelStore.scratchDir("t_sq2")
    ModelStore.saveSqBounds(spark, mns, mxs, ps)
    val (lm, lx) = ModelStore.loadSqBounds(spark, ps)
    val sa = Similarity.sqEncode(e, 8).orderBy("vec_id").collect()
    val sb = Similarity.sqEncodeWith(e, 8, lm, lx).orderBy("vec_id").collect()
    assert(sa.toSeq == sb.toSeq)

    // PQ: encodeWith(loaded codebook) ≡ pqEncode(sample-inline)
    val cents = Similarity.pqCodebook(e, 4)
    val pq = ModelStore.scratchDir("t_pq2")
    ModelStore.savePqCodebook(spark, cents, pq)
    val qa = Similarity.pqEncode(e, 2, 4).orderBy("vec_id").collect()
    val qb = Similarity.pqEncodeWith(e, 2,
      ModelStore.loadPqCodebook(spark, pq)).orderBy("vec_id").collect()
    assert(qa.toSeq == qb.toSeq)
  }

  test("sq_encode/knn_sq literal-bounds plans are map-only on the encode leg") {
    val e = embDf(40, 8)
    val (mns, mxs) = Similarity.sqBoundsArrays(e, 8)
    val plan = Similarity.sqEncodeWith(e, 8, mns, mxs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"literal-bounds encode must not join the bounds row:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"literal-bounds encode must not recompute the bounds aggregate:\n$plan")
  }
}
