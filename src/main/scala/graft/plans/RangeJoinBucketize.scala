package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: bucketize interval-containment joins.
  *
  * An inner join whose ONLY cross-side predicates are a temporal range
  * pair — `ts >= lo AND ts <= hi` with `ts` from one side and `lo`/`hi`
  * from the other — has no equi-key, so Spark must plan a nested-loop
  * join: O(|points| · |intervals|) comparisons, the plan that dies at
  * scale. This rule rewrites the join into the form
  * [[graft.ops.RangeJoin.pointInInterval]] writes by hand:
  *
  *  - the interval side generates one row per calendar day it touches
  *    (`explode(sequence(day(lo), day(hi), 1 day))`),
  *  - the point side projects its day,
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
  * Operand types: both timestamp flavors (LTZ truncates in the session
  * zone — same zone on both sides of the join, so bucket membership is
  * consistent; parquet without UTC adjustment reads as TIMESTAMP_NTZ)
  * and DATE (the day IS the bucket — interval-containment joins over
  * TPC-H-shaped date columns are at least as common as timestamps).
  *
  * AGGREGATE PUSHDOWN: when the range join feeds DIRECTLY into an
  * `Aggregate` grouped on interval-side columns whose aggregates are
  * count/sum over point-side expressions — `points JOIN intervals ON ts
  * BETWEEN lo AND hi GROUP BY interval_id` — the rewrite instead emits
  * [[graft.ops.RangeJoin.countSumByInterval]]'s two-level shape: a day
  * strictly inside `(day(lo), day(hi))` is fully contained no matter
  * where `lo`/`hi` fall within their own days, so its points aggregate
  * ONCE per day (one pass over the corpus, ~|days| rows) and intervals
  * join against that tiny rollup; only each interval's two BOUNDARY days
  * need row-level residual checks. The aggregated row volume drops from
  * |points|·(interval days) to |days| + boundary rows — at 100 TB the
  * difference between aggregating the fan-out and aggregating the
  * corpus once (measured 3× at sf0.1 on the hand-written operator).
  * Fires only when the decomposition is exactly value-preserving: plain
  * `COUNT` / `SUM` (no DISTINCT, no FILTER), group keys = interval-side
  * attributes, and the join condition is NOTHING BUT the range pair
  * (an extra conjunct would invalidate wholesale interior inclusion).
  * Decimal sums re-cast to the original result type (two-level sum
  * widens twice).
  *
  * Idempotent — every rewritten join carries an equi-conjunct, so it no
  * longer matches. Installed cluster-wide by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinBucketize extends Rule[LogicalPlan] {

  /** A detected range pair: point-side timestamp/date `ts`, interval
    * bounds `lo`/`hi`, the two sides, and whether the pair's two
    * comparisons are the join condition's ONLY conjuncts.
    */
  private final case class RangePair(ts: AttributeReference,
                                     lo: AttributeReference,
                                     hi: AttributeReference,
                                     ptSide: LogicalPlan, ivSide: LogicalPlan,
                                     ptOnLeft: Boolean, exact: Boolean)

  // transformDown: the Aggregate pattern must see the RAW join below it
  // before the plain-join pattern rewrites it away (transformUp would
  // visit the join first)
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(_, _, j: Join, _) =>
      aggRewrite(agg, j).getOrElse(agg)
    case agg @ Aggregate(_, _, Project(projList, j: Join), _)
        if projList.forall(_.isInstanceOf[Attribute]) =>
      // a pure column-pruning Project between the two is transparent:
      // every group/aggregate reference resolves against the join output
      aggRewrite(agg, j).getOrElse(agg)
    case j @ Join(left, right, Inner, Some(cond), _) =>
      rewrite(j, left, right, cond).getOrElse(j)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def isDay(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == DateType

  /** Detect the range pair on an inner join's condition; None when an
    * equi-conjunct already exists (nothing to fix) or no usable pair.
    */
  private def findPair(left: LogicalPlan, right: LogicalPlan,
                       cond: Expression): Option[RangePair] = {
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
    // → lower; ts <= hi / hi >= ts → upper. Attributes only; a mixed
    // date/timestamp pair would carry analyzer casts and not match as
    // raw attributes, so same-type is implied per comparison
    def dayAttr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference if isDay(a.dataType) => Some(a)
      case _ => None
    }
    val bounds = cs.flatMap {
      case GreaterThanOrEqual(a, b) =>
        (dayAttr(a), dayAttr(b)) match {
          case (Some(x), Some(y)) => Seq((x, y, true), (y, x, false))
          case _ => Nil
        }
      case LessThanOrEqual(a, b) =>
        (dayAttr(a), dayAttr(b)) match {
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
      val ptOnLeft = lOut.contains(ts)
      RangePair(ts, lo, hi,
        if (ptOnLeft) left else right, if (ptOnLeft) right else left,
        ptOnLeft, exact = cs.size == 2)
    }
  }

  /** The day bucket of `e`: DATE is its own bucket; timestamps truncate
    * in the session zone (same zone on both join sides — consistent
    * membership).
    */
  private def day(e: Expression): Expression =
    if (e.dataType == DateType) e
    else Cast(e, DateType, Some(conf.sessionLocalTimeZone))

  private val oneDay = Literal(new CalendarInterval(0, 1, 0L))

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression): Option[LogicalPlan] =
    findPair(left, right, cond).map { p =>
      val tz = Some(conf.sessionLocalTimeZone)
      // interval side: one row per touched day (NULL sequence → 0 rows)
      val seq = Sequence(day(p.lo), day(p.hi), Some(oneDay), tz)
      val guarded = If(LessThanOrEqual(p.lo, p.hi), seq,
        Literal.create(null, ArrayType(DateType, containsNull = false)))
      val gen = Explode(guarded)
      val genDay = AttributeReference("_graft_iv_day", DateType,
        nullable = gen.elementSchema.head.nullable)()
      val ivPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(genDay), child = p.ivSide)

      // point side: its single day bucket
      val ptDayAlias = Alias(day(p.ts), "_graft_pt_day")()
      val ptPlan = Project(p.ptSide.output :+ ptDayAlias, p.ptSide)

      val newCond = And(EqualTo(ptDayAlias.toAttribute, genDay), cond)
      val (nl, nr) = if (p.ptOnLeft) (ptPlan, ivPlan) else (ivPlan, ptPlan)
      // restore the original output (drop the helper day columns)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }

  /** The two-level rollup rewrite for `Aggregate(range join)` — see the
    * class doc. Bails (→ the plain-join rewrite still fires via the
    * recursion) unless the decomposition is exactly value-preserving.
    */
  private def aggRewrite(agg: Aggregate, j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner) return None
    val cond = j.condition.getOrElse(return None)
    val p = findPair(j.left, j.right, cond).getOrElse(return None)
    if (!p.exact) return None // extra conjuncts: interior inclusion invalid

    // group keys: interval-side ATTRIBUTES only (kept by reference
    // through both legs, so the final output ids match the original's)
    val groupAttrs = agg.groupingExpressions.map {
      case a: Attribute if p.ivSide.outputSet.contains(a) => a
      case _ => return None
    }
    // aggregates: group attrs pass through; COUNT/SUM over point-side
    // (or literal) arguments decompose — optionally under one outer Cast
    // (`sum(x).cast("double")` is the common query shape); anything else
    // bails
    sealed trait Part
    final case class CountPart(args: Seq[Expression]) extends Part
    final case class SumPart(arg: Expression, resType: DataType) extends Part
    val parts = scala.collection.mutable.ArrayBuffer.empty[Part]
    // arguments must be deterministic: the rewrite changes how many
    // times they evaluate (once per point-day instead of once per joined
    // row) and SHARES one evaluation across every interval covering a
    // day — rand()-style expressions would change distribution
    def decompose(f: aggregate.AggregateFunction): Option[Part] = f match {
      case Count(args)
          if args.forall(a => a.deterministic &&
            a.references.subsetOf(p.ptSide.outputSet)) =>
        Some(CountPart(args))
      case s: Sum if s.child.deterministic &&
          s.child.references.subsetOf(p.ptSide.outputSet) =>
        Some(SumPart(s.child, s.dataType))
      case _ => None
    }
    // (alias, part index, outer-cast target if any)
    val rebuild = agg.aggregateExpressions.map {
      case a: Attribute if groupAttrs.exists(_.semanticEquals(a)) =>
        scala.util.Left(a): Either[Attribute, (Alias, Int, Option[DataType])]
      case al @ Alias(AggregateExpression(f, Complete, false, None, _), _) =>
        val part = decompose(f).getOrElse(return None)
        parts += part
        scala.util.Right((al, parts.size - 1, None))
      case al @ Alias(
          Cast(AggregateExpression(f, Complete, false, None, _), dt, _, _),
          _) =>
        val part = decompose(f).getOrElse(return None)
        parts += part
        scala.util.Right((al, parts.size - 1, Some(dt)))
      case _ => return None
    }

    val tz = Some(conf.sessionLocalTimeZone)

    // ---- point side: per-day partial aggregate (ONE pass over points)
    val ptDayAlias = Alias(day(p.ts), "_graft_pt_day")()
    val ptDayAttr = ptDayAlias.toAttribute
    val ptPlan = Project(p.ptSide.output :+ ptDayAlias, p.ptSide)
    def partialFunc(part: Part): AggregateExpression = part match {
      case CountPart(args) => AggregateExpression(Count(args), Complete,
        isDistinct = false)
      case SumPart(arg, _) => AggregateExpression(Sum(arg), Complete,
        isDistinct = false)
    }
    val partialAliases = parts.zipWithIndex.map { case (part, i) =>
      Alias(partialFunc(part), s"_graft_rj_p$i")()
    }.toSeq
    val dayAgg = Aggregate(Seq(ptDayAttr),
      ptDayAttr +: partialAliases, ptPlan)
    val partialAttrs = partialAliases.map(_.toAttribute)

    // ---- interval side with day bounds
    val loDayAlias = Alias(day(p.lo), "_graft_rj_lo")()
    val hiDayAlias = Alias(day(p.hi), "_graft_rj_hi")()
    val loDay = loDayAlias.toAttribute
    val hiDay = hiDayAlias.toAttribute
    val ivProj = Project(p.ivSide.output ++ Seq(loDayAlias, hiDayAlias),
      p.ivSide)

    // interior leg: days strictly inside (lo_day, hi_day) join the
    // rollup wholesale — row-level residuals provably true there
    val interiorFilter = Filter(
      GreaterThan(hiDay, DateAdd(loDay, Literal(1))), ivProj)
    val interiorGen = Explode(Sequence(
      DateAdd(loDay, Literal(1)), DateSub(hiDay, Literal(1)),
      Some(oneDay), tz))
    val ivDayAttr = AttributeReference("_graft_rj_ivday", DateType,
      nullable = interiorGen.elementSchema.head.nullable)()
    val interiorDays = Generate(interiorGen, unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ivDayAttr),
      child = interiorFilter)
    val interiorJoin = Join(interiorDays, dayAgg, Inner,
      Some(EqualTo(ivDayAttr, ptDayAttr)), JoinHint.NONE)
    val interiorLeg: LogicalPlan =
      Project(groupAttrs ++ partialAttrs, interiorJoin)

    // boundary leg: each interval's first/last day, row-level residual,
    // partial-aggregated to the SAME shape
    val bdayArray = If(EqualTo(loDay, hiDay),
      CreateArray(Seq(loDay)), CreateArray(Seq(loDay, hiDay)))
    val bGen = Explode(bdayArray)
    val bDayAttr = AttributeReference("_graft_rj_bday", DateType,
      nullable = bGen.elementSchema.head.nullable)()
    val bDays = Generate(bGen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bDayAttr), child = ivProj)
    val (bl, br) = if (p.ptOnLeft) (ptPlan, bDays) else (bDays, ptPlan)
    val boundaryJoin = Join(bl, br, Inner,
      Some(And(EqualTo(ptDayAttr, bDayAttr), cond)), j.hint)
    val boundaryAliases = parts.map(part =>
      Alias(partialFunc(part), "_graft_rj_b")()).toSeq
    val boundaryLeg: LogicalPlan = Aggregate(groupAttrs,
      groupAttrs ++ boundaryAliases, boundaryJoin)

    // ---- final: sum the partials per original group; counts coalesce
    // back to non-null longs, decimal sums re-cast to the original
    // (singly-widened) type — output attribute ids preserved exactly
    val union = Union(interiorLeg, boundaryLeg)
    // union output ids = interior leg's (first child): group attrs keep
    // their original ids, partial columns are the dayAgg attrs
    val finals = rebuild.map {
      case scala.util.Left(a) => a
      case scala.util.Right((al, i, outerCast)) =>
        val summed = AggregateExpression(Sum(partialAttrs(i)), Complete,
          isDistinct = false)
        val inner = parts(i) match {
          case CountPart(_) =>
            Coalesce(Seq(summed, Literal(0L))) // count: non-null long
          case SumPart(_, resType) =>
            if (summed.dataType == resType) summed
            else Cast(summed, resType, tz) // re-narrow the double widening
        }
        val expr = outerCast match {
          case Some(dt) => Cast(inner, dt, tz)
          case None => inner
        }
        Alias(expr, al.name)(exprId = al.exprId, qualifier = al.qualifier,
          explicitMetadata = al.explicitMetadata)
    }
    Some(Aggregate(groupAttrs, finals, union))
  }
}
