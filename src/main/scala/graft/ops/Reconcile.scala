package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-evolution operators: applying updates to a 100 TB table and
  * proving two copies of one agree — the maintenance half of a data
  * platform that the analytics queries assume already happened.
  */
object Reconcile {

  /** Symmetric difference of two tables by key, with a digest over the
    * compared payload columns so "present in both but DIFFERENT" is one
    * integer comparison, not a column-by-column diff. Full outer join on
    * the key only — payloads reduce to a 60-bit digest per row map-side,
    * so the shuffle carries (key, digest), never the rows. Output is the
    * disagreement set: `only_a` / `only_b` / `differs` per key; equal rows
    * (the overwhelming majority in any real reconciliation) never leave
    * the join.
    */
  def tableDiff(a: DataFrame, b: DataFrame, keyCol: String,
                payload: Seq[String]): DataFrame = {
    def digested(df: DataFrame) = {
      val concatenated = concat_ws("",
        payload.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
      df.select(col(keyCol).as("key"),
        graft.functions.h60(concatenated).as("dig"))
    }
    digested(a).withColumnRenamed("dig", "dig_a")
      .join(digested(b).withColumnRenamed("dig", "dig_b"), Seq("key"), "full_outer")
      .select(col("key"),
        when(col("dig_b").isNull, "only_a")
          .when(col("dig_a").isNull, "only_b")
          .otherwise("differs").as("status"))
      .where(col("dig_a").isNull || col("dig_b").isNull ||
        col("dig_a") =!= col("dig_b"))
  }

  /** Collapse a CDC change batch to the LATEST change per key — the
    * standard pre-merge step when a batch carries several versions of one
    * row (a replication log replays every intermediate state; only the
    * last one matters to the target). One shuffle on the key; each key's
    * group is ordered by `seqCol` (change-log sequence number / LSN) with
    * the caller's `tieBreak` columns making the winner deterministic when
    * a source emits equal sequence numbers. Window `row_number`, so the
    * per-key state is O(1) — never a per-key collect.
    */
  def cdcLatest(changes: DataFrame, keyCol: String, seqCol: String,
                tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc +: tieBreak: _*)
    changes.withColumn("_cdc_rn", row_number().over(w))
      .where(col("_cdc_rn") === 1).drop("_cdc_rn")
  }

  /** `MERGE INTO target USING changes ON key` — the apply half of CDC:
    * every change row either UPSERTS (replaces the target row of its key,
    * or inserts if absent) or DELETES its key, per `opCol` (`"delete"`
    * deletes; anything else upserts). Changes must already be collapsed
    * to one row per key ([[cdcLatest]]); `changes` columns minus `opCol`
    * must match the target schema.
    *
    * Shape: target LEFT ANTI join the change keys (untouched rows pass
    * through — and AQE broadcasts the key side when the batch is small,
    * so the 100 TB common case is a broadcast anti join, no target
    * shuffle), unioned with the batch's upsert rows. Deletes cost
    * nothing beyond their key's presence in the anti join.
    */
  def mergeApply(target: DataFrame, changes: DataFrame, keyCol: String,
                 opCol: String): DataFrame = {
    val kept = target.join(changes.select(col(keyCol)), Seq(keyCol), "left_anti")
    val upserts = changes.where(col(opCol) =!= lit("delete")).drop(opCol)
    kept.unionByName(upserts.select(target.columns.map(col).toSeq: _*))
  }

  /** [[mergeApply]] against a PARTITIONED parquet layout, rewriting ONLY
    * the partitions the change batch touches — the property that makes
    * MERGE affordable at 100 TB: cost scales with the batch's partition
    * footprint, never the table. This is the `replaceWhere`/
    * copy-on-write merge every lakehouse format implements; here it is
    * three explicit moves:
    *
    *  1. the touched partition set = `changes.select(partCol).distinct`
    *     (collected — bounded by the batch's partition count, never rows);
    *  2. the target is read WITH a partition filter on that set, so
    *     planning-time directory pruning means untouched partitions are
    *     never even scanned;
    *  3. the merged slice is written with DYNAMIC partition overwrite —
    *     only the partitions present in the output are replaced; every
    *     other directory keeps its exact bytes (spec-asserted by file
    *     identity). A touched partition whose rows are ALL deleted never
    *     appears in the output, so dynamic overwrite would leave its old
    *     files behind — those are enumerated up front (touched minus
    *     surviving, one extra aggregate over the touched slice only) and
    *     their directories removed after the write commits.
    *
    * Returns the touched partition values (diagnostics / audit log).
    *
    * Isolation caveat: this mutates the layout IN PLACE — a reader
    * planning a scan mid-merge can see a touched partition half-replaced
    * (dynamic overwrite swaps per-partition, not per-table). Where
    * readers and merges overlap, run the same rewrite under the snapshot
    * format instead: write the merged slice as new files and publish a
    * REPLACE commit ([[graft.ops.Snapshots]] — pinned readers never see
    * a partial state), or take the merge-on-read route
    * ([[graft.ops.Snapshots.commitChanges]]) and skip the rewrite
    * entirely.
    */
  def mergeTouched(spark: org.apache.spark.sql.SparkSession,
                   targetDir: String, changes: DataFrame, keyCol: String,
                   opCol: String, partCol: String): Seq[Any] = {
    val touched = changes.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return Seq.empty // empty batch: nothing to rewrite
    // NULL is a legal partition value (__HIVE_DEFAULT_PARTITION__ on
    // disk) but `isin` never matches it — filter it explicitly, or a
    // touched null partition's surviving rows would be invisible to the
    // merge and then deleted by the stale-dir cleanup below.
    val (nullTouched, valTouched) = touched.partition(_ == null)
    val partFilter = (
      (if (valTouched.nonEmpty) Seq(col(partCol).isin(valTouched: _*))
       else Seq.empty) ++
      (if (nullTouched.nonEmpty) Seq(col(partCol).isNull) else Seq.empty)
    ).reduce(_ || _)
    val target = spark.read.parquet(targetDir).where(partFilter)
    // column order may differ between batch and target; mergeApply aligns
    // the upsert rows to the target schema by name.
    val merged = mergeApply(target, changes, keyCol, opCol)
    val surviving = merged.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSet
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(targetDir)
    touched.filterNot(surviving).foreach { p =>
      // Spark escapes partition values on disk (URL-encoding for special
      // characters, __HIVE_DEFAULT_PARTITION__ for null) — deleting the
      // RAW value's path would miss the real directory and the deleted
      // rows would silently resurface on the next read. Build the dir
      // name through the same escaping the write used.
      val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(partCol, Option(p).map(_.toString).orNull)
      val dir = new java.io.File(targetDir, dirName)
      if (dir.isDirectory) {
        dir.listFiles().foreach(f => f.delete(): Unit)
        dir.delete(): Unit
      }
    }
    touched
  }

  /** Slowly-changing-dimension type 2: fold a batch of updates into a
    * versioned dimension. Input: current rows (`version 0`) unioned with
    * updates carrying an effective timestamp; output: one row per
    * (key, version) with `valid_from`/`valid_to` ranges, newest version
    * open-ended (NULL). One shuffle on the key; each key's history is
    * ordered by a window bounded by its own version count (dimension
    * histories are short by construction — this is never a corpus-wide
    * sort). This is the semantics of `MERGE INTO … WHEN MATCHED` for
    * history-keeping tables, expressed engine-neutrally.
    *
    * @param base    current dimension rows
    * @param updates new values, same schema plus `effCol`
    * @param keyCol  business key
    * @param effCol  effective timestamp of each update row (base rows get
    *                the epoch as their effective time)
    */
  def scd2(base: DataFrame, updates: DataFrame, keyCol: String,
           effCol: String, payload: Seq[String]): DataFrame = {
    val cols = col(keyCol) +: payload.map(col)
    val baseV = base.select(cols: _*)
      .withColumn("valid_from", lit(0L))
    val updV = updates.select((cols :+ col(effCol).cast("long").as("valid_from")): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    baseV.unionByName(updV)
      .withColumn("version", (row_number().over(w) - 1).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select((col(keyCol) +: payload.map(col)) :+
        col("version") :+ col("valid_from") :+ col("valid_to"): _*)
  }
}
