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
