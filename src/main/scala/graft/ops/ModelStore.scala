package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet persistence for FITTED STATE — the "train once, apply many"
  * artifact path the training-loop family was missing.
  *
  * Every trainer in the engine ([[Learn.trainWeights]] logreg weights,
  * [[Similarity.kmeansTrainLoop]] centroids, [[Similarity.pcaPowerLoop]]
  * (μ, v), the SQ bounds / PQ codebook samples) produces state that is
  * O(features)/O(K·dim)/O(dim) — small enough to collect by construction.
  * A production pipeline trains that state ONCE, writes it as an
  * artifact, and every downstream apply-pass (scoring, projection,
  * quantized search) LOADS it instead of re-running the training loop.
  * This object is that artifact layer:
  *
  *  - `save*`/`load*` pairs: tiny parquet files, one row per state
  *    component (weights: `(feature, weight)`; PCA: `(dim, mu, v)` plus
  *    constant `eigval`/`n`; centroids: the `(cell, dim, n_members,
  *    mean_val)` frame k-means emits; SQ bounds: `(dim, mn, mx)`; PQ
  *    codebook: `(code, dim, v)`). Doubles round-trip bit-exact through
  *    parquet, so apply-from-artifact ≡ train-then-apply — the
  *    correctness gate proves it, because every apply query's oracle
  *    *computes* train-then-apply while the engine loads.
  *
  *  - [[fit]]: a train-once-per-JVM memo. The first query that needs an
  *    artifact trains and writes it; every later query (and every later
  *    invocation of the same query — the bench runs each twice) loads
  *    the existing file. Keyed by (kind | input dir | hyper-params), so
  *    different scale factors or settings never share state.
  *
  * Scale shape: artifacts are O(state) rows — KB at any corpus size —
  * and loading is a driver-side read of exactly that state, mirroring
  * how a real cluster ships fitted state to executors (as broadcast
  * literals, not joins). The store directory lives for the JVM (see
  * [[scratchDir]]); a production deployment would point the same
  * save/load calls at a durable path.
  */
object ModelStore {

  /** Scratch directory removed at JVM exit — artifacts must outlive the
    * (lazy) frames built over them and stay for every later apply-pass
    * in the run, so process exit is the earliest safe cleanup point.
    */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }

  private val fitted = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Durable store root: when `GRAFT_STORE_DIR` (env) or `graft.store.dir`
    * (system property) is set, artifacts live at
    * `<root>/<prefix>_<md5(key)>` and survive the process — a later run
    * with the same key LOADS instead of retraining (train-once, ever:
    * the production contract). A `_graft_fit_done` marker written after
    * `train` completes makes a crashed half-written artifact invisible;
    * without the marker the next run retrains into the same directory.
    * Unset (the default, and what the test harness uses), artifacts are
    * process-scoped scratch dirs.
    *
    * Caveat: keys embed the input DIRECTORY and hyper-parameters, not
    * the corpus content — regenerating data in place under the same path
    * would serve a stale durable artifact. Production keys should fold
    * in a corpus version (snapshot id, table version); delete the
    * artifact dir (or its marker) to force a retrain.
    */
  private def storeRoot: Option[String] =
    sys.env.get("GRAFT_STORE_DIR").orElse(sys.props.get("graft.store.dir"))

  private def keyHash(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Train-once: the first caller for `key` runs `train` against an
    * artifact path and every caller gets that path back — per process by
    * default, across processes under a durable [[storeRoot]]. A rare
    * concurrent first-call may train twice (both runs are deterministic,
    * last path wins) — never wrong, at worst one redundant training.
    */
  def fit(key: String, prefix: String)(train: String => Unit): String =
    fitted.getOrElseUpdate(key, storeRoot match {
      case Some(root) =>
        val dir = new java.io.File(root, s"${prefix}_${keyHash(key)}")
        val marker = new java.io.File(dir, "_graft_fit_done")
        if (!marker.isFile) {
          dir.mkdirs()
          train(dir.toString)
          java.nio.file.Files.write(marker.toPath,
            key.getBytes("UTF-8")): Unit
        }
        dir.toString
      case None =>
        val p = scratchDir(prefix)
        train(p)
        p
    })

  /** Test hook: forget every fitted artifact (files stay until JVM exit). */
  def reset(): Unit = fitted.clear()

  // ---- logistic-regression weights: rows (feature, weight) ------------

  def saveWeights(spark: SparkSession, names: Seq[String], w: Array[Double],
                  path: String): Unit = {
    import spark.implicits._
    names.zip(w).toSeq.toDF("feature", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadWeights(spark: SparkSession, names: Seq[String],
                  path: String): Array[Double] = {
    val m = spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    names.map(n => m.getOrElse(n,
      sys.error(s"weights artifact $path missing feature $n"))).toArray
  }

  // ---- PCA state: rows (dim, mu, v), constant (eigval, n) -------------

  def savePca(spark: SparkSession, mu: Array[Double], v: Array[Double],
              eigval: Double, n: Long, path: String): Unit = {
    import spark.implicits._
    require(mu.length == v.length, "mu/v length mismatch")
    mu.indices.map(j => ((j + 1).toLong, mu(j), v(j), eigval, n)).toSeq
      .toDF("dim", "mu", "v", "eigval", "n")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPca(spark: SparkSession, path: String)
      : (Array[Double], Array[Double], Double, Long) = {
    val rows = spark.read.parquet(path).collect().sortBy(_.getLong(0))
    require(rows.nonEmpty, s"empty PCA artifact at $path")
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)),
      rows.head.getDouble(3), rows.head.getLong(4))
  }

  // ---- k-means centroids: the (cell, dim, n_members, mean_val) frame --

  def saveCentroids(centroids: DataFrame, path: String): Unit =
    centroids.coalesce(1).write.mode("overwrite").parquet(path)

  def loadCentroids(spark: SparkSession, path: String): DataFrame =
    loadFrame(spark, path)

  /** Any artifact read back as the frame it was saved as — the generic
    * "dump the store" surface behind the `*_store` queries. */
  def loadFrame(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The centroid artifact as driver arrays `(cell ids, mean vectors)` —
    * the literal table [[Similarity.assignCellsWith]] embeds. O(K·dim)
    * rows by the k-means loop's own bound.
    */
  def centroidArrays(spark: SparkSession, path: String)
      : (Array[Long], Array[Array[Double]]) = {
    val rows = loadFrame(spark, path).collect()
    require(rows.nonEmpty, s"empty centroid artifact at $path")
    val byCell = rows.groupBy(_.getLong(0)).toArray.sortBy(_._1)
    (byCell.map(_._1),
      byCell.map { case (_, rs) => rs.sortBy(_.getLong(1)).map(_.getDouble(3)) })
  }

  // ---- SQ per-dim bounds: rows (dim, mn, mx) ---------------------------

  def saveSqBounds(spark: SparkSession, mns: Array[Double],
                   mxs: Array[Double], path: String): Unit = {
    import spark.implicits._
    require(mns.length == mxs.length, "mns/mxs length mismatch")
    mns.indices.map(j => ((j + 1).toLong, mns(j), mxs(j))).toSeq
      .toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadSqBounds(spark: SparkSession, path: String)
      : (Array[Double], Array[Double]) = {
    val rows = spark.read.parquet(path).collect().sortBy(_.getLong(0))
    require(rows.nonEmpty, s"empty SQ-bounds artifact at $path")
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  // ---- PQ codebook: rows (code, dim, v) — full sampled vectors, split
  //      into sub-spaces at APPLY time so one artifact serves any `subs`
  //      that divides the dimension ---------------------------------------

  def savePqCodebook(spark: SparkSession, cents: Array[Array[Double]],
                     path: String): Unit = {
    import spark.implicits._
    val rows = for {
      (c, i) <- cents.zipWithIndex
      (x, j) <- c.zipWithIndex
    } yield (i.toLong, (j + 1).toLong, x)
    rows.toSeq.toDF("code", "dim", "v")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPqCodebook(spark: SparkSession, path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty, s"empty PQ-codebook artifact at $path")
    rows.groupBy(_.getLong(0)).toArray.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getLong(1)).map(_.getDouble(2))
    }
  }
}
