package org.apache.spark.sql

import java.io.File

import org.apache.spark.SparkEnv
import org.apache.spark.util.Utils

/** Bridge to Spark's `private[spark]` local-directory resolution, so the
  * engine's spill files land where every other Spark spill lands
  * (`spark.local.dir` / YARN container dirs / K8s emptyDirs), not in a
  * hardcoded `/tmp`. Executor-side only — callers run inside tasks where
  * `SparkEnv.get` is always populated.
  */
object GraftSpillUtil {
  /** A fresh temp file in the executor's Spark-managed local dir. The
    * caller owns deletion (register a task-completion listener). */
  def newSpillFile(prefix: String): File = {
    val dir = new File(Utils.getLocalDir(SparkEnv.get.conf))
    File.createTempFile(prefix, ".run", dir)
  }
}
