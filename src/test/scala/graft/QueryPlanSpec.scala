package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the shipped queries' scale
  * invariants — the properties that make the plans survive a 100× data
  * scale-up, asserted on the REAL `SparkEntry.queries` entries over the
  * sf0.001 fixture. Fixture-size-dependent choices (e.g. which side
  * broadcasts at tiny SF) are deliberately NOT asserted; only the
  * invariants that must hold at any scale are:
  *
  *  - no BroadcastNestedLoopJoin / CartesianProduct anywhere (the
  *    O(n·m) cliff — a range predicate that misses its equi-key
  *    restatement would plan one silently);
  *  - selective predicates reach the parquet scan as PushedFilters;
  *  - top-k queries plan the bounded-heap TakeOrderedAndProject, never
  *    a global sort + limit;
  *  - single-partitioning shapes (as-of join) stay join-free.
  */
class QueryPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-plan-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // formatted mode: scan metadata (PushedFilters, ReadSchema) untruncated
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def assertNoLoopJoin(name: String): Unit = {
    val p = plan(name)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"$name plans a nested-loop join — O(n*m) at scale:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"$name plans a cartesian product:\n$p")
  }

  test("q1_pricing: column pruning — only the 5 needed columns are read") {
    val p = plan("q1_pricing")
    assert(p.contains("ReadSchema") && !p.contains("l_shipdate"),
      s"q1 must not read columns it does not use:\n$p")
  }

  test("q6_forecast: every predicate is pushed to the parquet scan") {
    val p = plan("q6_forecast")
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThan(l_quantity").foreach { f =>
      assert(p.contains(f), s"q6 predicate $f must reach the scan:\n$p")
    }
  }

  test("q3_top_revenue: bounded-heap top-k, no global sort+limit") {
    val p = plan("q3_top_revenue")
    assert(p.contains("TakeOrderedAndProject"),
      s"q3 top-10 must be TakeOrderedAndProject:\n$p")
    assertNoLoopJoin("q3_top_revenue")
  }

  test("q5_local_supplier: all joins are hash joins, region filter pushed") {
    assertNoLoopJoin("q5_local_supplier")
    val p = plan("q5_local_supplier")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      s"region filter must reach the region scan:\n$p")
  }

  test("q19_disjunctive: OR-of-ANDs join stays a hash equi-join") {
    assertNoLoopJoin("q19_disjunctive")
  }

  test("q9_profit: part name filter is pushed to the part scan; all joins hashed") {
    assertNoLoopJoin("q9_profit")
    val p = plan("q9_profit")
    assert(p.contains("StringContains(p_name,red)"),
      s"q9's name LIKE filter must reach the part scan:\n$p")
  }

  test("q20_dominant_supplier: fact scanned once (checkpointed aggregate), joins hashed") {
    assertNoLoopJoin("q20_dominant_supplier")
    // The per-(part,supplier) aggregate is checkpointed, so the visible
    // plan reads it as an in-memory scan; the only parquet scans left are
    // the two dimension tables — the fact is provably not re-scanned.
    // (executedPlan.toString prints each node once, unlike formatted mode
    // whose detail section would double-count.)
    val p = SparkEntry.queries("q20_dominant_supplier")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"q20 should scan only supplier+nation after the checkpoint, got $scans:\n$p")
  }

  test("range_join: bucketized restatement plans no nested-loop join") {
    assertNoLoopJoin("range_join")
  }

  test("range_join_auto: the optimizer rule rewrites the raw BETWEEN join") {
    // the query itself installs RangeJoinBucketize in the session
    assertNoLoopJoin("range_join_auto")
  }

  test("knn_bruteforce: corpus is never sort-merge shuffled; top-k is a partial aggregate") {
    val p = plan("knn_bruteforce")
    assert(!p.contains("SortMergeJoin"),
      s"kNN must broadcast the query side, never shuffle the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), s"kNN cartesian:\n$p")
    assert(p.contains("topk_by_score"),
      s"kNN must reduce via the bounded-heap topk_by_score aggregate:\n$p")
  }

  test("minhash_pairs: LSH candidate generation is an equi-join") {
    assertNoLoopJoin("minhash_pairs")
  }

  test("asof_join: union + ordered window, no join operator at all") {
    val p = plan("asof_join")
    assert(!p.contains("Join"), s"as-of must stay join-free:\n$p")
  }

  test("corpus-wide sweep: no cartesian products; nested-loop joins only against bounded broadcasts") {
    // Queries where a BroadcastNestedLoopJoin is the DESIGNED plan: the
    // build side is a bounded broadcast — a 1-row global-stats aggregate
    // (bm25/tfidf/surprisal/PMI totals, q22's scalar average, PageRank's
    // node count), the fixed k-row query set (kNN), or a calendar-bounded
    // dimension axis (gap_fill's hour grid). Anything else planning a
    // BNLJ (or any query planning a CartesianProduct) is a scale
    // regression.
    val boundedBnlj = Set("bm25_search", "knn_bruteforce", "pmi_bigrams",
      "q22_idle_customers", "tfidf_top", "unigram_surprisal",
      "pagerank_step", "gap_fill", "rrf_fusion" /* bm25 leg's stats row */,
      "ann_recall" /* brute-force leg broadcasts the fixed query set */,
      "q11_important_stock" /* 1-row threshold broadcast */,
      "triangle_count" /* 1-row mean-degree threshold + 1-row × 1-row output join */,
      "ndcg_eval" /* bm25 leg's 1-row stats broadcast + final 1-row dcg × 1-row idcg cross */)
    val names = SparkEntry.queries.keys.filterNot(_.startsWith("stream_")).toSeq.sorted
    val offenders = names.flatMap { n =>
      val p = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
      val cart = p.contains("CartesianProduct")
      val bnlj = p.contains("BroadcastNestedLoopJoin") && !boundedBnlj(n)
      if (cart || bnlj) Some(s"$n${if (cart) " [cartesian]" else " [unlisted BNLJ]"}")
      else None
    }
    assert(offenders.isEmpty, s"scale-unsafe join plans: $offenders")
  }

  test("heavy hitters: candidate join broadcasts, corpus never sort-merge shuffled") {
    Seq("heavy_hitters", "domain_heavy_hitters").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q pass-2 must broadcast the <=k candidates:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q must never shuffle-sort the token stream for the candidate join:\n$p")
      assert(p.contains("ObjectHashAggregate"),
        s"$q pass-1 must run the misra_gries TypedImperativeAggregate " +
          s"(ObjectHashAggregate), partial then final:\n$p")
    }
  }

  test("sessions: exactly one user-keyed exchange feeds windows and aggregate") {
    val p = plan("sessions")
    assert(!p.contains("Join"), s"sessions must not join:\n$p")
    val shuffles = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(shuffles == 1,
      s"sessions must reuse ONE user_id partitioning, got $shuffles:\n$p")
  }
}
