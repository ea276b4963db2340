package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: bucketize interval-containment joins.
  *
  * An inner join whose ONLY cross-side predicates are a timestamp range
  * pair — `ts >= lo AND ts <= hi` with `ts` from one side and `lo`/`hi`
  * from the other — has no equi-key, so Spark must plan a nested-loop
  * join: O(|points| · |intervals|) comparisons, the plan that dies at
  * scale. This rule rewrites the join into the form
  * [[graft.ops.RangeJoin.pointInInterval]] writes by hand:
  *
  *  - the interval side generates one row per calendar day it touches
  *    (`explode(sequence(trunc(lo), trunc(hi), 1 day))`),
  *  - the point side projects `trunc(ts)`,
  *  - the join gains the day equi-key and KEEPS the original range
  *    predicate as the residual filter.
  *
  * A point matches a given interval in exactly one day bucket (its own),
  * so no dedup is needed and the result set is unchanged; the planner now
  * sees an equi-join and picks hash/sort-merge. Malformed intervals
  * (`lo > hi`) explode a NULL sequence — zero generated rows, matching
  * the empty result the original predicate produces (where the raw
  * `sequence` call would instead error on a negative range).
  *
  * Fires only on: inner join, no existing cross-side equi-conjunct, all
  * three range operands timestamp attributes (LTZ or NTZ). Idempotent —
  * the rewritten join has an equi-conjunct, so it no longer matches.
  *
  * Installed cluster-wide by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinBucketize extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      rewrite(j, left, right, cond).getOrElse(j)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    val lOut = left.outputSet
    val rOut = right.outputSet
    def crossSide(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(lOut) && b.references.subsetOf(rOut) &&
        a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(rOut) && b.references.subsetOf(lOut) &&
        a.references.nonEmpty && b.references.nonEmpty)
    val hasEqui = cs.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
    if (hasEqui) return None

    // normalize each conjunct to (ts, bound, isLower): ts >= lo / lo <= ts
    // → lower; ts <= hi / hi >= ts → upper. Attributes + timestamps only.
    // both timestamp flavors qualify (parquet without UTC adjustment reads
    // as TIMESTAMP_NTZ); a mixed pair would carry analyzer casts and not
    // match as raw attributes, so same-type is implied per comparison
    def isTs(dt: DataType): Boolean =
      dt == TimestampType || dt == TimestampNTZType
    def tsAttr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference if isTs(a.dataType) => Some(a)
      case _ => None
    }
    val bounds = cs.flatMap {
      case GreaterThanOrEqual(a, b) =>
        (tsAttr(a), tsAttr(b)) match {
          case (Some(x), Some(y)) => Seq((x, y, true), (y, x, false))
          case _ => Nil
        }
      case LessThanOrEqual(a, b) =>
        (tsAttr(a), tsAttr(b)) match {
          case (Some(x), Some(y)) => Seq((x, y, false), (y, x, true))
          case _ => Nil
        }
      case _ => Nil
    }
    // a usable pair: same ts on one side, lo+hi both on the other side
    val pair = bounds.collect { case (ts, lo, true) =>
      bounds.collect {
        case (ts2, hi, false) if ts2.semanticEquals(ts) => (ts, lo, hi)
      }
    }.flatten.find { case (ts, lo, hi) =>
      (lOut.contains(ts) && rOut.contains(lo) && rOut.contains(hi)) ||
      (rOut.contains(ts) && lOut.contains(lo) && lOut.contains(hi))
    }
    pair.map { case (ts, lo, hi) =>
      val tz = Some(conf.sessionLocalTimeZone)
      // DATE is the day bucket: well-defined for both timestamp flavors
      // (LTZ truncates in the session zone — same zone on both sides of
      // the join, so bucket membership is consistent)
      def day(e: Expression): Expression = Cast(e, DateType, tz)

      val (ptSide, ivSide, ptOnLeft) =
        if (lOut.contains(ts)) (left, right, true) else (right, left, false)

      // interval side: one row per touched day (NULL sequence → 0 rows)
      val oneDay = Literal(new CalendarInterval(0, 1, 0L))
      val seq = Sequence(day(lo), day(hi), Some(oneDay), tz)
      val guarded = If(LessThanOrEqual(lo, hi), seq,
        Literal.create(null, ArrayType(DateType, containsNull = false)))
      val gen = Explode(guarded)
      val genDay = AttributeReference("_graft_iv_day", DateType,
        nullable = gen.elementSchema.head.nullable)()
      val ivPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(genDay), child = ivSide)

      // point side: its single day bucket
      val ptDayAlias = Alias(day(ts), "_graft_pt_day")()
      val ptPlan = Project(ptSide.output :+ ptDayAlias, ptSide)

      val newCond = And(EqualTo(ptDayAlias.toAttribute, genDay), cond)
      val (nl, nr) = if (ptOnLeft) (ptPlan, ivPlan) else (ivPlan, ptPlan)
      // restore the original output (drop the helper day columns)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }
  }
}
