package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Layout, RangeJoin, Similarity, TextStats}

/** Round-8 additions: BPE training (the iterative merge loop whose count
  * phase `bpe_pairs` verifies) pinned to a pure-Scala greedy-BPE
  * reference, and the incremental near-dup path (signature store +
  * batch probe) pinned to the batch LSH pipeline it must agree with.
  */
class RoundEightOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-round8-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference greedy BPE: count-weighted adjacent pair frequencies over
    * the vocabulary, argmax with (count desc, "l r" asc) tie-break,
    * left-to-right non-overlapping merge application.
    */
  private def refBpe(vocab: Map[String, Long],
                     merges: Int): Seq[(Long, String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      vocab.toSeq.map { case (t, n) => t.map(_.toString).toVector -> n }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var stop = false
    while (r < merges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.indices.dropRight(1).foreach { i =>
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, rr), c) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, s"$a $b") }
        r += 1
        out += ((r.toLong, l, rr, c))
        words = words.map { case (syms, n) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              merged += (l + rr); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.result(), n)
        }
      }
    }
    out.toSeq
  }

  test("bpeLearn equals the reference greedy BPE, including multi-char merges") {
    val sp = spark; import sp.implicits._
    // 'lo' dominates (low lower lowest all carry it), then merged symbols
    // must themselves merge further ('lo'+'w' → 'low')
    val docs = Seq(
      (1L, "low low low low low lower lower lowest"),
      (2L, "newer newer newer wider wider low"),
      (3L, "low lowest newer wide wide")
    ).toDF("doc_id", "text")
    val vocab = Map[String, Long](
      "low" -> 7, "lower" -> 2, "lowest" -> 2, "newer" -> 4,
      "wider" -> 2, "wide" -> 2)
    val expected = refBpe(vocab, 8)
    val got = TextStats.bpeLearn(docs, 8)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"got $got\nwant $expected")
    // a learned merge must eventually be multi-char on at least one side
    // (the loop is feeding merged symbols back in, not re-counting chars)
    assert(got.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 },
      s"8 rounds over this vocab must produce a multi-char merge: $got")
  }

  test("bpeLearn: early stop when no pairs remain; no cached state leaks") {
    val sp = spark; import sp.implicits._
    val single = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val out = TextStats.bpeLearn(single, 5).collect()
    assert(out.isEmpty, "single-char tokens have no pairs to merge")
    // a corpus that exhausts before the budget stops short
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out2 = TextStats.bpeLearn(tiny, 5)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out2.toSeq == Seq(("a", "b", 2L)),
      s"'ab'×2 merges once (count-weighted) then exhausts: ${out2.toSeq}")
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore,
      "bpeLearn must unpersist every round's vocab checkpoint")
  }

  test("bpeFertility: per-source subword/token ratio from the trained segmentation") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "low lower", "a"), (2L, "low newer", "b"))
      .toDF("doc_id", "text", "source")
    // vocab {low:2, lower:1, newer:1}; round 1 pair counts lo=3, ow=3,
    // we=2, er=2, ne=1, ew=1 → tie lo/ow broken to 'l o' → merge (l,o);
    // round 2: 'lo w'=3 wins → low=[low], lower=[low,e,r], newer
    // untouched=[n,e,w,e,r] → lengths 1 / 3 / 5.
    val out = TextStats.bpeFertility(docs, merges = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      "a" -> ((2L, 4L, 2.0)),   // low(1) + lower(3)
      "b" -> ((2L, 6L, 3.0))),  // low(1) + newer(5)
      s"got $out")
  }

  test("ivfTopKProbe: nprobe=1 equals ivfTopK, nprobe=K equals brute force, recall monotone") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 80L).map(i => (i, Seq.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") < 6)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val k = 5; val cells = 8
    val p1 = rows(Similarity.ivfTopKProbe(corpus, queries, k, cells, 1))
    val base = rows(Similarity.ivfTopK(corpus, queries, k, cells))
    assert(p1 == base, "nprobe=1 must reproduce the single-cell IVF exactly")
    val pAll = rows(Similarity.ivfTopKProbe(corpus, queries, k, cells, cells))
    val brute = rows(Similarity.bruteForceTopK(corpus, queries, k))
    assert(pAll == brute, "probing every cell must equal exact brute force")
    // recall against brute force can only improve with more probes
    def hits(s: Set[(Long, Long, Long, Double)]) =
      s.map(t => (t._1, t._3)).intersect(brute.map(t => (t._1, t._3))).size
    val p2 = rows(Similarity.ivfTopKProbe(corpus, queries, k, cells, 2))
    assert(hits(p2) >= hits(p1) && hits(pAll) >= hits(p2),
      s"recall must be monotone in nprobe: ${hits(p1)} / ${hits(p2)} / ${hits(pAll)}")
  }

  test("compactionPlan: sequential packing equals the reference fold, totals preserved") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(41)
    val chunks = (1 to 400).map { i =>
      (s"p${i % 3}", i.toLong, 1000L + rnd.nextInt(50000).toLong)
    }
    val target = 100000L
    val got = Layout.compactionPlan(chunks.toDF("part", "ord", "bytes")
        .repartition(4), Seq("part"), "ord", "bytes", target)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // reference: sequential fold in ord order per partition
    val want = chunks.groupBy(_._1).flatMap { case (p, cs) =>
      var before = 0L
      cs.sortBy(_._2).map { case (_, _, b) =>
        val grp = before / target; before += b; (p, grp, b)
      }.groupBy { case (_, g, _) => g }.map { case (g, rs) =>
        (p, g) -> (rs.size.toLong, rs.map(_._3).sum)
      }
    }.toMap
    assert(got == want, s"got $got\nwant $want")
    // totals preserved; group overflow bounded by one chunk
    chunks.groupBy(_._1).foreach { case (p, cs) =>
      val planned = got.collect { case ((`p`, _), (_, b)) => b }
      assert(planned.sum == cs.map(_._3).sum)
      val maxChunk = cs.map(_._3).max
      planned.foreach(b => assert(b < target + maxChunk,
        s"group in $p exceeds target by more than one chunk: $b"))
    }
  }

  test("overlapPairs equals the brute-force overlap definition, incl. sub-day residual") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(31)
    val base = java.sql.Timestamp.valueOf("2026-03-01 00:00:00").getTime
    // random intervals over ~10 days, spans 0–3 days with sub-day offsets
    // (same-truncated-day NON-overlaps must be filtered by the residual)
    val iv = (1 to 300).map { i =>
      val key = rnd.nextInt(5).toLong
      val lo = base + rnd.nextInt(10 * 24) * 3600000L + rnd.nextInt(3600000)
      val hi = lo + rnd.nextInt(3 * 24) * 3600000L + rnd.nextInt(3600000)
      (key, i.toLong, new java.sql.Timestamp(lo), new java.sql.Timestamp(hi))
    }
    val df = iv.toDF("key", "id", "lo", "hi").repartition(4)
    val got = RangeJoin.overlapPairs(df, "key", "id", "lo", "hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      a <- iv; b <- iv
      if a._1 == b._1 && a._2 < b._2 &&
        !a._3.after(b._4) && !b._3.after(a._4)
    } yield (a._1, a._2, b._2)).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)} " +
        s"(${brute.size} brute pairs)")
    assert(brute.nonEmpty, "test corpus must actually produce overlaps")
  }

  test("incrNearDup equals batch minhashPairs restricted to base×incoming") {
    val sp = spark; import sp.implicits._
    // near-dup clusters spanning the base/incoming split (id < 100 = base)
    val mk = (id: Long, t: String) => (id, t)
    val docs = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog tonight"),
      mk(2L, "the quick brown fox jumps over the lazy dog today"),
      mk(3L, "entirely different text about distributed sorting engines"),
      mk(101L, "the quick brown fox jumps over the lazy dog tonight"),
      mk(102L, "another unrelated document about spark physical plans"),
      mk(103L, "entirely different text about distributed sorting engines")
    ).toDF("doc_id", "text")
    val base = docs.where(col("doc_id") < 100)
    val incoming = docs.where(col("doc_id") >= 100)
    val store = Dedup.signatureStore(base, 6, 3, 3)
    val got = Dedup.incrNearDup(store, incoming, 6, 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch pipeline over the union, keeping only base↔incoming pairs
    val batch = Dedup.minhashPairs(docs, 6, 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < 100 && b >= 100 }
      .map { case (a, b) => (b, a) }.toSet
    assert(got == batch, s"got $got want $batch")
    assert(got.contains((101L, 1L)) && got.contains((103L, 3L)),
      s"exact-duplicate cross-split pairs must surface: $got")
  }

  test("incrNearDup: hot base buckets are dropped via the store's own bkt_n") {
    val sp = spark; import sp.implicits._
    // 5 identical base docs → every band bucket has 5 members
    val base = (1L to 5L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val incoming = Seq((101L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val store = Dedup.signatureStore(base, 6, 3, 3)
    val loose = Dedup.incrNearDup(store, incoming, 6, 3, 3, maxBucket = 10)
      .collect()
    assert(loose.length == 5, s"all 5 base copies are candidates: ${loose.length}")
    val tight = Dedup.incrNearDup(store, incoming, 6, 3, 3, maxBucket = 4)
      .collect()
    assert(tight.isEmpty,
      "buckets over maxBucket must be dropped by the scan filter alone")
  }

  test("incrNearDup plan: base store streams map-side — batch broadcasts, no shuffle of the store") {
    val sp = spark; import sp.implicits._
    val base = (1L to 50L)
      .map(i => (i, s"document number $i about topic ${i % 7} with shared words"))
      .toDF("doc_id", "text")
    val incoming = Seq((101L, "document number 3 about topic 3 with shared words"))
      .toDF("doc_id", "text")
    // the persisted-store contract: probe a MATERIALIZED store frame, as
    // a nightly batch would read it back from a table
    val store = Dedup.signatureStore(base, 6, 3, 3).localCheckpoint()
    val plan = Dedup.incrNearDup(store, incoming, 6, 3, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"incoming batch must broadcast into the store scan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the base store must never be shuffled for the probe:\n$plan")
  }

  test("sqEncode: affine uint8 codes against per-dim corpus bounds") {
    val sp = spark; import sp.implicits._
    // dim bounds: [0,10] and [10,30]; third dim constant → code 0
    val corpus = Seq(
      (1L, Array(0f, 10f, 7f)),
      (2L, Array(5f, 20f, 7f)),
      (3L, Array(10f, 30f, 7f))).toDF("vec_id", "embedding")
    val r = ops.Similarity.sqEncode(corpus, 3)
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    // 5 of [0,10] → floor(127.5 + 0.5) = 128 (the +0.5 tips the half)
    assert(r == Map(1L -> "0,0,0", 2L -> "128,128,0", 3L -> "255,255,0"),
      s"codes: $r")
  }

  test("sqTopK: ranks by reconstruction distance with smaller-id ties") {
    val sp = spark; import sp.implicits._
    // 1-D line: reconstructions are exact (codes 0/128/255 → 0/~5.02/10),
    // so distances order as the raw values do from the query at 0
    val corpus = Seq(
      (0L, Array(0f)), (1L, Array(5f)), (2L, Array(10f)), (3L, Array(5f)))
      .toDF("vec_id", "embedding")
    val got = ops.Similarity.sqTopK(corpus,
        corpus.where($"vec_id" === 0), topK = 3, dim = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // vec 1 and 3 share the code (128) hence the distance — tie to id 1
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L), s"order: ${got.toSeq}")
    assert(got(0)._3 == got(1)._3, s"equal codes must tie: ${got.toSeq}")
    val expected = math.pow(128.0 * 10.0 / 255.0, 2)
    assert(math.abs(got(0)._3 - expected) < 1e-6,
      s"distance must be vs the RECONSTRUCTION (${got(0)._3} vs $expected)")
  }

  test("temperatureMix: quarter-power weights, epoch counts, and boost") {
    val sp = spark; import sp.implicits._
    // 16 and 81 docs: n^0.25 = 2 and 3 exactly → weights 2/5 and 3/5
    val docs = ((1 to 16).map(i => (i.toLong, "x", "small")) ++
      (1 to 81).map(i => (100L + i, "x", "big")))
      .toDF("doc_id", "text", "source")
    val r = ops.TextStats.temperatureMix(docs, epochDocs = 100L)
      .collect().map(x => (x.getString(0),
        (x.getLong(1), x.getDouble(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r("small") == ((16L, 0.4, 40L, 2.5)),
      s"small source must get weight 2/5 and 2.5x boost: $r")
    assert(r("big") == ((81L, 0.6, 60L, 0.7407)), s"big: $r")
    // weights renormalize to 1 and expected docs sum to the epoch budget
    assert(r.values.map(_._2).sum == 1.0 && r.values.map(_._3).sum == 100L)
  }

  test("temperatureMix plan: one corpus scan, reduced-row windows only") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "a", "s")).toDF("doc_id", "text", "source")
    val plan = ops.TextStats.temperatureMix(docs, 10L)
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size <= 1,
      s"corpus must be scanned once:\n$plan")
  }

  test("sparseKnn equals a plain-Scala tf-idf cosine reference") {
    val sp = spark; import sp.implicits._
    val corpus = Seq(
      (1L, "sort merge sort quick"),
      (2L, "merge join hash join join"),
      (3L, "window stream stream"),
      (4L, "sort stream window hash"),
      (5L, "quick quick quick"))
    val docsDf = corpus.toDF("doc_id", "text")
    val queries = Seq((0L, "sort merge"), (1L, "stream hash quick"))
    val got = ops.TextStats.sparseKnn(docsDf, queries, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    // reference: same 6dp-round-then-exact-sum discipline
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = corpus.map { case (id, t) =>
      id -> t.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq }.toMap
    val n = toks.size.toDouble
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val idf = df.map { case (t, d) => t -> r6(math.log(n / d)) }
    val w = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, xs) =>
        t -> BigDecimal(r6(xs.size * idf(t))) } }
    val dnorm = w.map { case (id, m) =>
      id -> r6(math.sqrt((m.values.map(x => x * x).sum).toDouble)) }
    val expected = queries.flatMap { case (qid, qtext) =>
      val qts = qtext.split(" ").distinct.filter(idf.contains).toSeq
      val wq = qts.map(t => t -> BigDecimal(r6(idf(t)))).toMap
      val qn = r6(math.sqrt(wq.values.map(x => x * x).sum.toDouble))
      val scoresAll = toks.keys.toSeq.map { d =>
        val dot = qts.map(t => w(d).getOrElse(t, BigDecimal(0)) * wq(t)).sum
        d -> r6(dot.toDouble / (dnorm(d) * qn))
      }.filter { case (d, _) => qts.exists(w(d).contains) }
      scoresAll.sortBy { case (d, s) => (-s, d) }.take(3).zipWithIndex
        .map { case ((d, s), i) => (qid, (i + 1).toLong, d, s) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected,
      s"got ${got.toSeq}\nexpected $expected")
  }

  test("sparseKnn plan: bounded-heap top-k, no corpus-sized window") {
    val sp = spark; import sp.implicits._
    val docsDf = Seq((1L, "sort merge")).toDF("doc_id", "text")
    val plan = ops.TextStats.sparseKnn(docsDf, Seq((0L, "sort")), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topk_by_score"), s"must use the bounded heap:\n$plan")
    assert(!plan.contains("Window"), s"no window top-k at scale:\n$plan")
  }

  test("shuffleShard: exact partition into contiguous ranks, stable order") {
    val sp = spark; import sp.implicits._
    val docsDf = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val rows = ops.TextStats.shuffleShard(docsDf, "doc_id", "s1", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq == (1L to 200L), "every key exactly once")
    rows.groupBy(_._2).foreach { case (shard, xs) =>
      assert(xs.map(_._3).sorted.toSeq == (1L to xs.length.toLong),
        s"shard $shard positions must be contiguous from 1")
    }
    // pure function of (salt, key): same assignment on a re-run,
    // different salt reshuffles
    val again = ops.TextStats.shuffleShard(docsDf, "doc_id", "s1", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sorted.toSeq == again.sorted.toSeq, "determinism across runs")
    val other = ops.TextStats.shuffleShard(docsDf, "doc_id", "s2", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sorted.toSeq != other.sorted.toSeq, "salt must reshuffle")
  }

  test("aucEval: exact tie-aware rank AUC on hand-computed cases") {
    val sp = spark; import sp.implicits._
    // perfect separation
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
      .toDF("score", "y")
    assert(ops.Learn.aucEval(perfect).head().getDouble(2) == 1.0)
    // anti-separation
    val anti = Seq((0.1, 1.0), (0.9, 0.0)).toDF("score", "y")
    assert(ops.Learn.aucEval(anti).head().getDouble(2) == 0.0)
    // all scores tied → avgrank equal → AUC exactly 0.5
    val tied = Seq((0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0))
      .toDF("score", "y")
    assert(ops.Learn.aucEval(tied).head().getDouble(2) == 0.5)
    // mixed with a tie straddling classes: scores (.3:neg, .5:pos, .5:neg, .7:pos)
    // ranks: .3→1, .5→avg 2.5, .7→4; R_pos = 2.5+4 = 6.5; P=2,N=2
    // AUC = (6.5 - 3) / 4 = 0.875
    val mixed = Seq((0.3, 0.0), (0.5, 1.0), (0.5, 0.0), (0.7, 1.0))
      .toDF("score", "y")
    val row = ops.Learn.aucEval(mixed).head()
    assert(row.getLong(0) == 4 && row.getLong(1) == 2)
    assert(row.getDouble(2) == 0.875, s"got ${row.getDouble(2)}")
    // single-class corpora have no rank AUC: the guarded denominator
    // must yield NULL, not a divide-by-zero NaN/Inf
    val allPos = Seq((0.9, 1.0), (0.1, 1.0)).toDF("score", "y")
    assert(ops.Learn.aucEval(allPos).head().isNullAt(2))
    val allNeg = Seq((0.9, 0.0), (0.1, 0.0)).toDF("score", "y")
    assert(ops.Learn.aucEval(allNeg).head().isNullAt(2))
  }

  test("logreg trainWeights: learns a separable direction, deterministic replay") {
    val sp = spark; import sp.implicits._
    // y = 1 iff x1 > 0, cleanly separable on the x1 axis
    val feats = (1 to 80).map { i =>
      val x1 = if (i % 2 == 0) 1.0 + (i % 5) * 0.1 else -1.0 - (i % 5) * 0.1
      (if (x1 > 0) 1.0 else 0.0, 1.0, x1)
    }.toDF("y", "x0", "x1")
    val w = ops.Learn.trainWeights(feats, Seq("x0", "x1"), rounds = 5, lr = 2.0)
    assert(w(1) > 0.5, s"x1 weight must go positive, got ${w.toSeq}")
    // training separates: AUC of the fitted scores is 1 on this data
    val z = col("x0") * lit(w(0)) + col("x1") * lit(w(1))
    val auc = ops.Learn
      .aucEval(feats.select(round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"), col("y")))
      .head().getDouble(2)
    assert(auc == 1.0, s"separable data must reach AUC 1, got $auc")
    val w2 = ops.Learn.trainWeights(feats, Seq("x0", "x1"), rounds = 5, lr = 2.0)
    assert(w.toSeq == w2.toSeq, "bit-identical weights on a re-run")
  }

  test("aucEval plan: bucket-level window only — no per-row global rank") {
    val sp = spark; import sp.implicits._
    val scored = Seq((0.5, 1.0), (0.4, 0.0)).toDF("score", "y")
    val plan = ops.Learn.aucEval(scored).queryExecution.optimizedPlan.toString
    // the window must sit ABOVE the score-bucket aggregate in the plan
    // (rank work is O(buckets)): Window's child chain contains Aggregate
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window must rank pre-bucketed rows, not the corpus:\n$plan")
  }

  test("dpCounts: replayable seeded noise, zero-noise at huge epsilon, clamp + suppression") {
    val sp = spark; import sp.implicits._
    val df = (1 to 100).map { i =>
      (i.toLong, s"g${i % 7}") }.toDF("id", "grp")
    // eps → ∞ means b → 0: every release equals the true count
    val exact = ops.Privacy.dpCounts(df, Seq("grp"), eps = 1e9, salt = "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    exact.foreach { case (g, t, rel) => assert(t == rel, s"$g: $t vs $rel") }
    assert(exact.map(_._2).sum == 100)
    // pure function of (salt, group): re-run identical, salt change not
    val a = ops.Privacy.dpCounts(df, Seq("grp"), 0.3, "s1").collect().map(_.toSeq)
    val b = ops.Privacy.dpCounts(df, Seq("grp"), 0.3, "s1").collect().map(_.toSeq)
    val c = ops.Privacy.dpCounts(df, Seq("grp"), 0.3, "s2").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "identical release on a re-run")
    assert(a.toSeq != c.toSeq, "different salt must redraw the noise")
    // releases never negative even at tiny epsilon (huge noise)
    val noisy = ops.Privacy.dpCounts(df, Seq("grp"), 0.01, "s3")
      .collect().map(_.getLong(2))
    assert(noisy.forall(_ >= 0L), "clamped at zero")
    // suppression drops small groups on the TRUE count
    val small = (1 to 9).map(i => (i.toLong, if (i <= 2) "rare" else "big"))
      .toDF("id", "grp")
    val kept = ops.Privacy.suppressSmall(
      ops.Privacy.dpCounts(small, Seq("grp"), 1e9, "s"), 3)
      .collect().map(_.getString(0))
    assert(kept.toSeq == Seq("big"), s"got ${kept.toSeq}")
    // the DP-preserving form thresholds the NOISED count: at eps → ∞ the
    // noised count equals the true count, so the same groups survive —
    // but the filter column is n_released (presence decided by noised
    // values only; the shipped dp_counts query uses this form)
    val keptNoised = ops.Privacy.suppressSmall(
      ops.Privacy.dpCounts(small, Seq("grp"), 1e9, "s"), 3,
      nCol = "n_released")
      .collect().map(_.getString(0))
    assert(keptNoised.toSeq == Seq("big"), s"got ${keptNoised.toSeq}")
    // release over pre-aggregated counts ≡ dpCounts over the raw rows —
    // the contract that lets a streaming complete-mode counter reuse the
    // exact batch release (stream_dp_counts)
    val pre = df.groupBy(col("grp")).agg(count(lit(1)).as("n_true"))
    val viaRelease = ops.Privacy.release(pre, Seq("grp"), 0.3, "s1")
      .collect().map(_.toSeq)
    assert(viaRelease.toSeq.sortBy(_.toString) == a.toSeq.sortBy(_.toString),
      "release(counts) must equal dpCounts(raw)")
  }

  test("pcaPower: recovers a planted dominant direction, unit + sign-fixed") {
    val sp = spark; import sp.implicits._
    val dim = 8
    // Planted top direction along dim 1: big variance on axis 0, small
    // deterministic "noise" elsewhere.
    val corpus = (0 until 48).map { i =>
      val a = (i % 7) - 3.0 // mean 0, spread ±3
      val v = Array.tabulate(dim) { j =>
        val noise = (((i * 31 + j * 17) % 11) - 5) / 50.0f
        if (j == 0) (3.0 * a).toFloat + noise else noise
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val got = Similarity.pcaPower(corpus, rounds = 3, dim = dim)
      .orderBy(col("dim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (1L to dim), "one row per dimension")
    val loadings = got.map(_._2)
    val norm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"unit eigenvector, got norm $norm")
    // planted axis dominates, and the sign convention makes it positive
    assert(math.abs(loadings(0)) > 0.99, s"dim-1 loading ${loadings(0)}")
    assert(loadings(0) > 0, "largest-|u| component must be positive")
    val ev = got.map(_._3).distinct
    assert(ev.length == 1 && ev.head > 0, s"constant positive eigval: ${ev.toSeq}")
    // eigval ≈ variance along the planted axis (9 * Var(a) ≈ 36)
    assert(ev.head > 20 && ev.head < 50, s"Rayleigh estimate off: ${ev.head}")
  }

  test("sourceDivergence: zero for an undiverged source, symmetric, bounded by ln 2") {
    val sp = spark; import sp.implicits._
    // single source ⇒ P = Q ⇒ JS exactly 0
    val one = Seq((1L, "aaa bbb ccc", "s0"), (2L, "aaa bbb", "s0"))
      .toDF("doc_id", "text", "source")
    val z = ops.TextStats.sourceDivergence(one).collect()
    assert(z.length == 1 && z.head.getDouble(2) == 0.0, s"got ${z.toSeq}")
    // two equal-size sources with DISJOINT vocabularies: both diverge
    // identically; JS(δ, 50/50 mix) = ln 2 − (1/2)ln(3/2) − ... ≈ 0.2158,
    // well inside (0, ln 2)
    val disjoint = Seq(
      (1L, "aaa aaa aaa aaa", "sa"), (2L, "bbb bbb bbb bbb", "sb"))
      .toDF("doc_id", "text", "source")
    val d = ops.TextStats.sourceDivergence(disjoint)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(d.map(_._1).toSeq == Seq("sa", "sb"))
    assert(d(0)._3 == d(1)._3, "symmetric construction ⇒ equal divergence")
    assert(d(0)._3 > 0.2 && d(0)._3 < 0.22, s"got ${d(0)._3}")
    assert(d.forall(_._3 < math.log(2.0)), "JS is bounded by ln 2")
  }

  test("docPerplexity: repetition scores low, token soup scores high, gate flags the tail") {
    val sp = spark; import sp.implicits._
    // many templated docs (predictable bigrams) + one shuffled-soup doc
    // over the same vocabulary
    val template = "alpha beta gamma delta epsilon zeta"
    val soup = "zeta gamma alpha epsilon beta delta gamma zeta delta alpha"
    val docsDf = ((1 to 12).map(i => (i.toLong, template)) :+ (99L, soup))
      .toDF("doc_id", "text")
    val rows = ops.TextStats.docPerplexity(docsDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length == 13)
    val byId = rows.map(t => t._1 -> t).toMap
    val tmplPpl = byId(1L)._3
    val soupPpl = byId(99L)._3
    assert(rows.forall(_._3 > 0), "perplexity is positive")
    assert(soupPpl > 2 * tmplPpl,
      s"soup must be high-perplexity: $soupPpl vs template $tmplPpl")
    assert(byId(99L)._4, "the soup doc must be flagged by the mean+2sigma gate")
    assert((1 to 12).forall(i => !byId(i.toLong)._4), "templated docs unflagged")
    // deterministic replay
    val again = ops.TextStats.docPerplexity(docsDf)
      .collect().map(_.toSeq)
    assert(rows.map(t => Seq(t._1, t._2, t._3, t._4)).toSeq == again.toSeq)
  }

  test("mrrAt: first same-label hit ranks, zero for missed queries, exact mean") {
    val sp = spark; import sp.implicits._
    // 2-d embeddings: two tight clusters on opposite axes; labels pick
    // which cluster is "relevant" per query.
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f), 1),  // query: cluster A, label 1
      (1L, Seq(0.9f, 0.1f), 2),  // nearest to q0 but WRONG label
      (2L, Seq(0.8f, 0.2f), 1),  // first same-label hit for q0 → rank 2
      (3L, Seq(0.0f, 1.0f), 9),  // query: isolated label 9 → no hit
      (4L, Seq(0.1f, 0.9f), 2)).toDF("vec_id", "embedding", "label")
    val queries = corpus.where(col("vec_id") === 0L || col("vec_id") === 3L)
    val rows = ops.Similarity.mrrAt(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0L, 2L, 0.5), (3L, 0L, 0.0)), s"got ${rows.toSeq}")
    // mrr = (0.5 + 0.0) / 2, constant on every row
    assert(rows.forall(_._4 == 0.25), s"got ${rows.map(_._4).toSeq}")
  }

  test("mapAt: hand-computed average precision, zero for missed queries, exact mean") {
    val sp = spark; import sp.implicits._
    // same fixture as mrrAt: q0's top-3 is (v1 wrong, v2 RIGHT, v4 wrong)
    // → AP = P@2 / 1 = 0.5; q3 (label 9) has no relevant → AP = 0.
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.9f, 0.1f), 2),
      (2L, Seq(0.8f, 0.2f), 1),
      (3L, Seq(0.0f, 1.0f), 9),
      (4L, Seq(0.1f, 0.9f), 2)).toDF("vec_id", "embedding", "label")
    val queries = corpus.where(col("vec_id") === 0L || col("vec_id") === 3L)
    val rows = ops.Similarity.mapAt(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0L, 1L, 0.5), (3L, 0L, 0.0)), s"got ${rows.toSeq}")
    assert(rows.forall(_._4 == 0.25), s"got ${rows.map(_._4).toSeq}")

    // multi-relevant prefix sums: ranks 1 and 3 relevant →
    // AP = (1/1 + 2/3) / 2 = 0.8333335 → 0.833334 at 6-dp HALF_UP
    val corpus2 = Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.99f, 0.01f), 1),   // rank 1, relevant
      (2L, Seq(0.9f, 0.1f), 2),     // rank 2, wrong
      (3L, Seq(0.8f, 0.2f), 1)      // rank 3, relevant
    ).toDF("vec_id", "embedding", "label")
    val r2 = ops.Similarity.mapAt(corpus2,
        corpus2.where(col("vec_id") === 0L), k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(r2.toSeq == Seq((2L, 0.833334, 0.833334)), s"got ${r2.toSeq}")
  }

  test("pcaProject: pc1 + residual decompose the centered norm; planted axis projects clean") {
    val sp = spark; import sp.implicits._
    val dim = 8
    val corpus = (0 until 48).map { i =>
      val a = (i % 7) - 3.0
      val v = Array.tabulate(dim) { j =>
        val noise = (((i * 31 + j * 17) % 11) - 5) / 50.0f
        if (j == 0) (3.0 * a).toFloat + noise else noise
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.pcaProject(corpus, 3, dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 48)
    // pythagoras: pc1² + resid² ≈ ‖x − μ‖² — the residual never exceeds
    // the noise scale on this data (planted axis carries the variance)
    rows.foreach { case (id, pc1, resid) =>
      assert(resid >= 0 && resid < 0.5, s"vec $id residual $resid too big")
    }
    // pc1 tracks the planted coefficient ordering
    val byId = rows.sortBy(_._1).map(_._2)
    val coeff = (0 until 48).map(i => 3.0 * ((i % 7) - 3.0))
    val ord = byId.zip(coeff).sortBy(_._2).map(_._1)
    assert(ord.sliding(2).forall(p => p(0) <= p(1) + 0.2),
      "pc1 must be monotone in the planted coefficient")
  }

  test("calibrationOfTrained: bins partition the corpus, rates and means in range") {
    val sp = spark; import sp.implicits._
    val docsDf = (1 to 60).map { i =>
      (i.toLong, ("word " * (i % 20 + 1)).trim,
        if (i % 3 == 0) "en" else "de", s"s${i % 4}", (i % 20 + 1) * 5L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val bins = ops.Learn.calibrationOfTrained(docsDf, 3, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(bins.map(_._2).sum == 60, "bins must partition the corpus")
    bins.foreach { case (b, n, ms, fp) =>
      assert(b >= 0 && b <= 99 && n > 0)
      assert(ms >= b / 100.0 - 1e-6 && ms < (b + 1) / 100.0 + 1e-6,
        s"bin $b mean score $ms outside its bounds")
      assert(fp >= 0.0 && fp <= 1.0)
    }
  }

  test("pcaPower rounds are replayable: rounds=1 state feeds rounds=2") {
    val sp = spark; import sp.implicits._
    val corpus = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(6)(j => ((i * 13 + j * 7) % 9 - 4) / 3.0f).toSeq)
    }.toDF("vec_id", "embedding")
    // determinism across runs (the loop is a pure function of the corpus)
    val a = Similarity.pcaPower(corpus, 2, 6).collect().map(_.toSeq)
    val b = Similarity.pcaPower(corpus, 2, 6).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "bit-identical re-run")
    // more rounds move the estimate (not a fixed point after round 1)
    val r1 = Similarity.pcaPower(corpus, 1, 6).collect().map(_.getDouble(1)).toSeq
    val r3 = Similarity.pcaPower(corpus, 3, 6).collect().map(_.getDouble(1)).toSeq
    assert(r1 != r3, "power iteration must actually iterate")
  }
}
