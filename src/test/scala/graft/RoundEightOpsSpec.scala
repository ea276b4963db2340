package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TextStats}

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
}
