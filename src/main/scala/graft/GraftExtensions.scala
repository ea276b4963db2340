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
  * `GraftFunctions.register` call, the optimizer gains
  * [[graft.plans.RangeJoinBucketize]] — naive interval-containment joins
  * are rewritten to the scalable day-bucket equi-join automatically —
  * plus [[graft.plans.ZOrderStripPrune]] — dimension predicates over
  * z-clustered layouts gain the strip partition filter without the
  * caller spelling it — and the planner gains
  * [[graft.plans.HybridSortStrategy]], which maps the engine's
  * [[graft.plans.HybridSortPlan]] logical node to its physical operator.
  * (Reference parity itself needs zero custom rules, SURVEY §4; the
  * extensions serve the extended 100 TB surface and the algorithm-level
  * parity operator.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBucketize)
    ext.injectOptimizerRule(_ => graft.plans.ZOrderStripPrune)
    ext.injectPlannerStrategy(_ => graft.plans.HybridSortStrategy)
  }
}
