package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: the reference pipeline (generate → globally sort) far past
  * the reference's largest published test (4,000,000 elements,
  * `/root/reference/README.md:17`). Generation comes from the `graft-gen`
  * V2 source (partitioned, O(1) state per task) and the sort is the
  * engine's `global_sort` (range scatter + per-partition sort), driven to
  * a noop sink so the FULL sort executes with zero sink cost.
  *
  *   sbt "runMain graft.Scale [nRows]"        (default 200,000,000)
  *   sbt "runMain graft.Scale dedup [nDocs]"  (default 5,000,000)
  *
  * `dedup` mode drives the MinHash-LSH near-dup pipeline (the same
  * operators as the `minhash_pairs` query, same k/bands) over synthetic
  * documents with a planted 5% near-duplicate rate — each planted doc
  * copies its base's 12 tokens with exactly one perturbed, so candidate
  * recall is testable and the hashing/banding/self-join cost is real.
  *
  * Prints one JSON line — local-mode evidence that the plan shapes hold
  * orders of magnitude past the reference's ceiling; on a real cluster
  * the same plans scale out by partition count.
  */
object Scale {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("dedup")) return dedupMain(args.drop(1))
    if (args.headOption.contains("events")) return eventsMain(args.drop(1))
    if (args.headOption.contains("ann")) return annMain(args.drop(1))
    val n = if (args.nonEmpty) args(0).toLong else 200000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gen = spark.read.format("graft-gen")
      .option("n", n).option("bound", 5000000L)
      .option("numPartitions", cpus.toInt * 2).load()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm-up: JVM + codegen init off the clock
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()

    val sortSec = time {
      ops.Sorts.globalSort(gen.select("value"), col("value"))
        .write.format("noop").mode("overwrite").save()
    }
    val topkSec = time {
      ops.Sorts.topK(gen, 100, col("value").desc, col("id"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"n_rows":$n,"global_sort_sec":$sortSec%.1f,"top_k_sec":$topkSec%.1f,"cpus":$cpus}""")
    spark.stop()
  }

  /** Event-analytics family at volume: gap sessionization, the ordered
    * conversion funnel, and cohort retention over synthetic events
    * (~200 events/user across a 30-day span). All three are user-keyed
    * shapes — windows and aggregates partition on `user_id`, so per-task
    * state is bounded by one user's history no matter the corpus size.
    *
    * Generation is overflow-safe integer mixing only (multipliers chosen
    * so id × k < 2^63 for id ≤ 1e9 — the same discipline as
    * [[graft.ops.Gen]]); each timed query regenerates the frame, so the
    * per-query cost comparison is apples-to-apples.
    */
  private def eventsMain(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val users = math.max(1L, n / 200)
    val spanSec = 30L * 24 * 3600
    val baseUs = 1767225600000000L // 2026-01-01 UTC
    val mix1 = pmod(col("id") * 2654435761L, lit(1048573L))
    def events = spark.range(n)
      .repartition(cpus.toInt * 2)
      .select(
        col("id").as("event_id"),
        pmod(col("id") * 2654435761L, lit(users)).as("user_id"),
        timestamp_micros(lit(baseUs) +
          pmod(col("id") * 2654435761L, lit(spanSec)) * 1000000L +
          pmod(mix1 * 48271L, lit(1000000L))).as("ts"),
        when(pmod(mix1 * 16807L, lit(10L)) < 6, "view")
          .when(pmod(mix1 * 16807L, lit(10L)) < 9, "click")
          .otherwise("purchase").as("event_type"),
        (pmod(mix1 * 69621L, lit(10000L)) / lit(100.0)).as("value"))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val sessionsSec = time(noop(ops.Events.sessionize(events, 30)))
    val funnelSec = time(noop(ops.Events.funnel(events,
      Seq("view", "click", "purchase"))))
    val cohortSec = time(noop(ops.Events.cohortRetention(events)))
    println(f"""{"mode":"events","n_rows":$n,"n_users":$users,"sessions_sec":$sessionsSec%.1f,"funnel_sec":$funnelSec%.1f,"cohort_sec":$cohortSec%.1f,"cpus":$cpus}""")
    spark.stop()
  }

  /** Similarity family at volume: brute-force kNN (8 queries), SemDeDup
    * semantic dedup (cells scaled with n), and PQ encoding over synthetic
    * 64-dim embeddings. Vectors with id % 50 == 1 are PLANTED near-dups
    * (copy of id-1 with one component shifted by 0.01 — cosine ≈ 0.9999),
    * so the semantic-dedup count is checkable: nearly every planted pair
    * should land in its base's cell and clear the 0.9 floor, and almost
    * nothing else should.
    *
    * Components are md5-hash-derived uniforms in [-1, 1]: a linear
    * congruential mix (id·k1 + j·k2 mod p) leaves affine structure —
    * (x+c) mod p is piecewise-linear in x, so ~20% of vector pairs
    * exceed |cos| 0.4 and the dedup count explodes (measured: 133M
    * "pairs" at 200k vectors). Hashing (id, j) kills the correlation;
    * unrelated 64-dim cosines concentrate at N(0, 1/64) and the only
    * pairs above the floor are the planted ones.
    */
  private def annMain(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val dim = 64
    // cells scale with n (bounded cell size is what makes SemDeDup's
    // within-cell compare tractable); capped so the literal-centroid
    // argmax stays O(1k·dim) per row
    val cells = math.max(256, math.min(1024, (n / 1000).toInt))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val planted = pmod(col("id"), lit(50L)) === 1
    val base = when(planted, col("id") - 1).otherwise(col("id"))
    val comp = transform(sequence(lit(0), lit(dim - 1)), j =>
      ((pmod(graft.functions.h60(
          concat(base.cast("string"), lit("_"), j.cast("string"))),
        lit(2000003L)) - 1000000L) / lit(1000000.0) +
        when(planted && j === pmod(col("id"), lit(dim.toLong)), 0.01)
          .otherwise(0.0)).cast("float"))
    def embs = spark.range(n)
      .repartition(cpus.toInt * 2)
      .select(col("id").as("vec_id"), comp.as("embedding"))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val knnSec = time(noop(ops.Similarity.bruteForceTopK(
      embs, embs.where(col("vec_id") < 8), k = 10)))
    var pairs = 0L
    // 0.9 floor: same-cell conditioning lifts random-pair cosines well
    // above the population N(0, 1/dim), so a production-grade floor is
    // what separates planted dups (cos ≈ 0.9999) from cell noise
    val semSec = time {
      pairs = ops.Similarity.semanticDedup(embs, cells, minCosine = 0.9).count()
    }
    val pqSec = time(noop(ops.Similarity.pqEncode(embs, subs = 8, k = 16)))
    val plantedPairs = n / 50
    println(f"""{"mode":"ann","n_vectors":$n,"dim":$dim,"knn8_sec":$knnSec%.1f,"semdedup_sec":$semSec%.1f,"semdedup_pairs":$pairs,"planted_neardups":$plantedPairs,"pq_encode_sec":$pqSec%.1f,"cells":$cells,"cpus":$cpus}""")
    spark.stop()
  }

  private def dedupMain(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Synthetic corpus: 12 tokens per doc from hash arithmetic. Docs with
    // id % 20 == 1 are PLANTED near-dups: they copy doc id-1's token base
    // and perturb exactly one position, leaving shingle Jaccard ≈ 0.5-0.7.
    val nTok = 12
    val base = when(pmod(col("id"), lit(20L)) === 1, col("id") - 1)
      .otherwise(col("id"))
    // md5-derived tokens: affine formulas (base*a + j*b mod p) leave
    // shift-structure — doc pairs whose id difference maps one token
    // sequence onto another share most shingles and flood the LSH with
    // systematic twins. Hashing (base, j) kills the linear structure.
    val toks = (0 until nTok).map { j =>
      when(pmod(col("id"), lit(20L)) === 1 && pmod(col("id"), lit(nTok.toLong)) === j,
        concat(lit("z"), pmod(col("id"), lit(997L)).cast("string")))
        .otherwise(concat(lit("w"),
          substring(md5(concat(base.cast("string"), lit(s"_$j"))), 1, 8)))
    }
    def docs = spark.range(n)
      .repartition(cpus.toInt * 2)
      .select(col("id").as("doc_id"), concat_ws(" ", toks: _*).as("text"))

    // warm-up off the clock
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()

    val t0 = System.nanoTime()
    // same operators and parameters as the verified minhash_pairs query
    val pairs = ops.Dedup.minhashPairs(docs, k = 6, bands = 3, shingleN = 3)
    val found = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val planted = n / 20
    println(f"""{"mode":"dedup","n_docs":$n,"planted_neardups":$planted,"lsh_pairs_found":$found,"seconds":$sec%.1f,"docs_per_sec":${n / sec}%.0f,"cpus":$cpus}""")
    spark.stop()
  }
}
