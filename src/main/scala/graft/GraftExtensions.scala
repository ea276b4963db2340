package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions

/** Cluster-wide installation point for the engine:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every session built from that config — batch jobs, Spark Connect,
  * Thrift server — resolves the engine's native functions
  * (`h60`, `minhash31`, `simhash60`, `hybrid_sort_array`,
  * `topk_by_score`) like built-ins, with no per-application
  * `GraftFunctions.register` call. This is the standard
  * `SparkSessionExtensions` mechanism, the same hook a custom Rule or
  * SparkStrategy would use; the engine currently needs only function
  * injection (see SURVEY §4 — zero custom planner rules required).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
