package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for driver-sequenced iterative loops (PageRank, BPE
  * training): each round `localCheckpoint`s its state frame to cut the
  * lineage, and the PREVIOUS round's blocks must be freed eagerly — the
  * ContextCleaner only reclaims them after a driver GC, so a long loop
  * would otherwise accumulate O(rounds × |state|) executor storage.
  */
object CheckpointUtil {

  /** Frees the block-manager storage behind a `localCheckpoint`ed frame.
    * A checkpointed Dataset's plan is a bare [[LogicalRDD]] over the
    * cached RDD; unpersisting that RDD is the only handle —
    * `Dataset.unpersist` only consults the cache manager, which never saw
    * a checkpoint. No-op on frames that are not checkpoint roots.
    */
  def unpersistCheckpointed(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
