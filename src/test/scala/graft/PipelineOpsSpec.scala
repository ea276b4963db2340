package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Decontaminate, Dedup, Events, Reconcile, Sorts, TextStats}

/** Round-4 pipeline operators: decontamination, chunk dedup, global row
  * indexing, BM25, event transitions / JSON stats / z-score, and epoch
  * up-sampling.
  */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pipeline-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("decontaminate: flags exactly the docs sharing an n-gram with the benchmark") {
    val sp = spark; import sp.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx alpha beta gamma delta yy"), // contains the bench 4-gram
      (2L, "alpha beta gamma other words here"), // only a 3-gram overlap
      (3L, "totally unrelated content right here")
    ).toDF("doc_id", "text")
    val out = Decontaminate.flagOverlap(corpus, bench, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L))
  }

  test("chunkDedup keeps the earliest (doc_id, chunk_id) per distinct chunk body") {
    val sp = spark; import sp.implicits._
    val chunks = Seq(
      (1L, 0L, "shared boilerplate"), (1L, 1L, "unique one"),
      (2L, 0L, "shared boilerplate"), (3L, 5L, "shared boilerplate"),
      (3L, 6L, "unique two")
    ).toDF("doc_id", "chunk_id", "chunk_text")
    val out = Dedup.chunkDedup(chunks).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out == Map((1L, 0L) -> 3L, (1L, 1L) -> 1L, (3L, 6L) -> 1L))
  }

  test("groupCap keeps at most k docs per source, best quality first, id tie-break") {
    val sp = spark; import sp.implicits._
    // srcA: 3 docs, identical quality for 1 and 2 (same text) — the cap
    // of 2 must keep the smaller ids; srcB under the cap keeps everything
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank today", "srcA"),
      (2L, "The quick brown fox jumps over the lazy dog near the river bank today", "srcA"),
      (3L, "x", "srcA"),
      (4L, "Some reasonable sentence with several alphabetic words inside it", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = TextStats.groupCap(docs, 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "srcA", 2L -> "srcA", 4L -> "srcB"))
  }

  test("dupClusters equals union-find components on random pair sets") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(404)
    (1 to 3).foreach { _ =>
      val edges = List.fill(50) {
        val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // naive union-find reference: component label = smallest member id
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val out = Dedup.dupClusters(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == expected, s"components differ for edges $edges")
    }
  }

  test("dupClusters propagates across a long path graph (worst-case diameter)") {
    val sp = spark; import sp.implicits._
    // a 31-node chain: diameter 30, far beyond the near-clique shapes LSH
    // emits — exercises the multi-hop iteration bound
    val edges = (0L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (0L to 30L).map(_ -> 0L).toMap)
  }

  test("globalIndex assigns the contiguous 0-based rank of the total key order") {
    val sp = spark; import sp.implicits._
    val n = 10000
    // duplicate-heavy primary key + unique tiebreaker, scattered partitions
    val df = (0 until n).map(i => ((i * 7919) % 97, i.toLong))
      .toDF("k", "id").repartition(7)
    val out = Sorts.globalIndex(df, col("k"), col("id"))
      .orderBy("idx").collect()
    val expected = (0 until n).map(i => ((i * 7919) % 97, i.toLong))
      .sortBy(t => (t._1, t._2))
    assert(out.length == n)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i.toLong)
      assert((r.getInt(1), r.getLong(2)) == expected(i))
    }
  }

  test("bm25: more matches rank higher; docs without query terms are dropped") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "sort sort sort filler filler"),
      (2L, "sort filler filler filler filler"),
      (3L, "no relevant words at all")
    ).toDF("doc_id", "text")
    val out = TextStats.bm25(docs, Seq("sort"), 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 dropped
    assert(out(0).getDouble(1) > out(1).getDouble(1))
  }

  test("transitions counts consecutive per-user event-type pairs") {
    val sp = spark; import sp.implicits._
    val ev = Seq(
      (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"), (3L, 30L, 1L, "a"),
      (4L, 10L, 2L, "a"), (5L, 20L, 2L, "b")
    ).toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Events.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("propsStats parses typed JSON and counts missing fields") {
    val sp = spark; import sp.implicits._
    val ev = Seq(
      ("x", """{"k": 5}"""), ("x", """{"k": 7}"""), ("x", """{"other": 1}""")
    ).toDF("event_type", "props")
    val r = Events.propsStats(ev).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      == ((3L, 2L, 12L, 5L, 7L)))
  }

  test("valueZscore standardizes within each event type") {
    val sp = spark; import sp.implicits._
    val ev = Seq(
      (1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0), // mean 2, var 2/3
      (4L, "y", 5.0) // single row: zero variance -> z = 0
    ).toDF("event_id", "event_type", "value")
    val out = Events.valueZscore(ev).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sd = math.sqrt(2.0 / 3.0)
    assert(math.abs(out(1L) - (-1.0 / sd)) < 1e-3)
    assert(out(2L) == 0.0 && out(4L) == 0.0)
    assert(math.abs(out(3L) - 1.0 / sd) < 1e-3)
  }

  test("decontaminate plans the benchmark side as a broadcast semi-join") {
    val sp = spark; import sp.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq((1L, "xx alpha beta gamma delta yy")).toDF("doc_id", "text")
    val plan = Decontaminate.flagOverlap(corpus, bench, 4)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark grams must broadcast (corpus never shuffles on grams):\n$plan")
  }

  test("bm25 top-k plans as TakeOrderedAndProject, never a global sort") {
    val sp = spark; import sp.implicits._
    // Needs more input rows than k: with maxRows <= k Catalyst correctly
    // eliminates the Sort and Limit and no top-k operator remains to assert.
    val docs = (1L to 20L).map(i => (i, s"sort merge $i"))
      .toDF("doc_id", "text")
    val plan = TextStats.bm25(docs, Seq("sort"), 5)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("seqPack: contiguous fill in doc_id order within a shard") {
    val sp = spark; import sp.implicits._
    // one shard so the fill sequence is fully deterministic here
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"))
      .toDF("doc_id", "text")
    val out = TextStats.seqPack(docs, 4L, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // token counts 3,2,4,1 → preceding cum 0,3,5,9 → seq 0,0,1,2 at cap 4
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("tableDiff classifies only_a / only_b / differs and hides equal rows") {
    val sp = spark; import sp.implicits._
    val a = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30))
      .toDF("k", "name", "v")
    val b = Seq((2L, "y", 20), (3L, "zz", 30), (4L, "w", 40))
      .toDF("k", "name", "v")
    val out = Reconcile.tableDiff(a, b, "k", Seq("name", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "only_a", 3L -> "differs", 4L -> "only_b"))
  }

  test("scd2 assigns versions in effective order with adjacent validity") {
    val sp = spark; import sp.implicits._
    val base = Seq((1L, "a", 5), (2L, "b", 6)).toDF("k", "name", "v")
    val upd = Seq((1L, "a2", 5, 100L), (1L, "a3", 5, 200L))
      .toDF("k", "name", "v", "eff")
    val out = Reconcile.scd2(base, upd, "k", "eff", Seq("name", "v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) ->
        (r.getString(1), r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5)))
      .toMap
    assert(out((1L, 0L)) == (("a", 0L, 100L)))
    assert(out((1L, 1L)) == (("a2", 100L, 200L)))
    assert(out((1L, 2L)) == (("a3", 200L, -1L))) // open-ended
    assert(out((2L, 0L)) == (("b", 0L, -1L)))
  }

  test("zValue interleaves bits: a at odd positions, b at even") {
    val sp = spark; import sp.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))).sum
    val cases = Seq((5L, 3L), (0L, 0L), (1023L, 0L), (0L, 1023L),
      (682L, 341L), (1L, 1L))
    val df = cases.toDF("a", "b")
    val got = ops.Layout.zorderCluster(df, col("a"), col("b"), bits = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((a, b) <- cases)
      assert(got((a, b)) == ref(a, b, 10), s"z($a,$b)")
    assert(ref(5L, 3L, 3) == 39L) // hand-checked: 101 ⋈ 011 = 100111
  }

  test("epochUpsample repeats each row its stratum's epoch count") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "en"), (2L, "de"), (3L, "fr")).toDF("doc_id", "lang")
    val out = TextStats.epochUpsample(docs, "lang", Seq("en" -> 3, "de" -> 2), 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.count(_._1 == 1L) == 3 && out.count(_._1 == 2L) == 2
      && out.count(_._1 == 3L) == 1)
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("semanticDecontaminate flags planted matches, honors tau, breaks ties to larger bench id") {
    val sp = spark; import sp.implicits._
    def v(xs: Float*): Array[Float] = xs.toArray
    // bench 100 = (1,0), bench 101 = (0,1); corpus: exact copy of 100,
    // a 45-degree vector (cos ~0.707 to BOTH benches -> tie), and an
    // orthogonal-to-100 vector that matches 101 exactly
    val corpus = Seq(
      (1L, v(2f, 0f)),   // cos 1.0 with bench 100
      (2L, v(1f, 1f)),   // cos 0.707107 with both -> tie, keep bench 101
      (3L, v(0f, 3f)),   // cos 1.0 with bench 101
      (4L, v(1f, -1f))   // cos 0.707 with 100, -0.707 with 101
    ).toDF("vec_id", "embedding")
    val bench = Seq((100L, v(1f, 0f)), (101L, v(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.semanticDecontaminate(corpus, bench, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 100L, 1.0), (3L, 101L, 1.0)))
    val loose = graft.ops.Similarity.semanticDecontaminate(corpus, bench, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(loose.keySet == Set(1L, 2L, 3L, 4L))
    assert(loose(2L) == 101L) // equal cosines -> struct max picks larger id
    assert(loose(4L) == 100L) // the -0.707 side never wins
  }
}
