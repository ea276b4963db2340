package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.ops.Layout

/** Optimizer rule: apply a z-order table's SKIP INDEX automatically.
  *
  * [[graft.ops.Layout.zorderWriteN]] leaves a tiny descriptor
  * (`_graft_zlayout`: dimension columns, bits, stripTopBits) at the root
  * of every layout it writes. This rule makes the skip index a property
  * of the TABLE rather than of disciplined call sites: a scan of such a
  * table filtered on any z-dimension —
  *
  * {{{ spark.read.parquet(layout).where(col("pk") < 64) }}}
  *
  * — gains the implied strip filter `zstrip IN (...)` (the exact
  * [[graft.ops.Layout.zStripsN]] prefix-rectangle enumeration,
  * O(2^stripTopBits) driver arithmetic), which Spark's file-source
  * planning then turns into PLANNING-time partition-directory pruning.
  * Without the rule the caller must spell the strip filter by hand next
  * to the dimension predicate; forgetting it silently costs a full scan
  * of every strip.
  *
  * Soundness: the injected filter must be IMPLIED by the dimension
  * predicate. It is, because (a) the writer REQUIRES every dimension
  * value in `[0, 2^bits)` (out-of-domain rows fail the write — see
  * [[graft.ops.Layout.zorderWriteN]]), so each row's strip is the strip
  * of its true coordinates, and (b) [[graft.ops.Layout.zStripsN]] keeps
  * every strip whose axis-aligned z-box intersects the predicate box.
  * Bounds are only harvested from conjuncts of the form `dim <op>
  * integral-literal` (both operand orders); anything else leaves that
  * dimension unconstrained (full-domain box — never unsound, only less
  * pruning).
  *
  * Fires only when: the scan is a single-root file-source relation whose
  * root carries the descriptor, the descriptor's dimension columns and
  * the `zstrip` partition column all resolve against the relation output
  * as integral types, at least one dimension is actually bounded, no
  * conjunct already references `zstrip` (idempotence — one injection per
  * filter, and hand-written strip filters are respected), and the strip
  * set is a strict subset (a full-domain predicate gains nothing).
  *
  * Installed cluster-wide by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) or per-session via
  * `spark.experimental.extraOptimizations` (the `zorder_auto` query).
  * Either injection point works: even in the last optimizer batch, the
  * filter is still split into `PartitionFilters` by the physical
  * file-source strategy, which is where directory pruning happens.
  */
object ZOrderStripPrune extends Rule[LogicalPlan] {

  private val StripCol = "zstrip"

  private case class ZMeta(dims: Seq[String], bits: Int, stripTopBits: Int)

  /** Descriptor parse cache, keyed by (root path, descriptor mtime) —
    * existence is re-checked per query (cheap: one driver-side file
    * status), the parse is cached per version.
    */
  private val metaCache = TrieMap.empty[(String, Long), Option[ZMeta]]

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, r: LogicalRelation) =>
      stripFilter(cond, r).map(in => Filter(And(cond, in), r)).getOrElse(f)
    // column pruning inserts a Project between the filter and the scan;
    // the strip filter goes BELOW it (zstrip is usually pruned away
    // above), where the file-source strategy still collects it into
    // PartitionFilters. Attribute-only projections keep the predicate's
    // references meaningful against the relation output.
    case f @ Filter(cond, Project(projList, r: LogicalRelation))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      stripFilter(cond, r).map(in =>
        Filter(cond, Project(projList, Filter(in, r)))).getOrElse(f)
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def longOf(l: Literal): Option[Long] = l match {
    case Literal(v: Byte, _) => Some(v.toLong)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def stripFilter(cond: Expression,
                          rel: LogicalRelation): Option[Expression] = {
    val fsRel = rel.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    val root = fsRel.location.rootPaths match {
      case Seq(p) => p
      case _ => return None
    }
    val meta = readMeta(fsRel, root).getOrElse(return None)

    def resolveIntegral(name: String): Option[AttributeReference] =
      rel.output.collectFirst {
        case a: AttributeReference
          if conf.resolver(a.name, name) && isIntegral(a.dataType) => a
      }
    val stripAttr = resolveIntegral(StripCol).getOrElse(return None)
    val dimAttrs = meta.dims.map(d => resolveIntegral(d).getOrElse(return None))

    val cs = conjuncts(cond)
    // idempotence + respect hand-written strip filters
    if (cs.exists(_.references.contains(stripAttr))) return None

    // harvest per-dimension [lo, hi] from `dim <op> literal` conjuncts
    val lim = (1L << meta.bits) - 1
    val lo = Array.fill(dimAttrs.size)(0L)
    val hi = Array.fill(dimAttrs.size)(lim)
    var constrained = false
    def dimIdx(e: Expression): Option[Int] = e match {
      case a: AttributeReference =>
        val i = dimAttrs.indexWhere(_.semanticEquals(a))
        if (i >= 0) Some(i) else None
      case _ => None
    }
    def tighten(i: Int, newLo: Option[Long], newHi: Option[Long]): Unit = {
      newLo.foreach { v => lo(i) = math.max(lo(i), v); constrained = true }
      newHi.foreach { v => hi(i) = math.min(hi(i), v); constrained = true }
    }
    cs.foreach {
      case LessThan(d, l: Literal) =>
        for (i <- dimIdx(d); v <- longOf(l) if v > Long.MinValue)
          tighten(i, None, Some(v - 1))
      case LessThanOrEqual(d, l: Literal) =>
        for (i <- dimIdx(d); v <- longOf(l)) tighten(i, None, Some(v))
      case GreaterThan(d, l: Literal) =>
        for (i <- dimIdx(d); v <- longOf(l) if v < Long.MaxValue)
          tighten(i, Some(v + 1), None)
      case GreaterThanOrEqual(d, l: Literal) =>
        for (i <- dimIdx(d); v <- longOf(l)) tighten(i, Some(v), None)
      case EqualTo(d, l: Literal) =>
        for (i <- dimIdx(d); v <- longOf(l)) tighten(i, Some(v), Some(v))
      case LessThan(l: Literal, d) => // lit < dim  ≡  dim > lit
        for (i <- dimIdx(d); v <- longOf(l) if v < Long.MaxValue)
          tighten(i, Some(v + 1), None)
      case LessThanOrEqual(l: Literal, d) =>
        for (i <- dimIdx(d); v <- longOf(l)) tighten(i, Some(v), None)
      case GreaterThan(l: Literal, d) => // lit > dim  ≡  dim < lit
        for (i <- dimIdx(d); v <- longOf(l) if v > Long.MinValue)
          tighten(i, None, Some(v - 1))
      case GreaterThanOrEqual(l: Literal, d) =>
        for (i <- dimIdx(d); v <- longOf(l)) tighten(i, None, Some(v))
      case EqualTo(l: Literal, d) =>
        for (i <- dimIdx(d); v <- longOf(l)) tighten(i, Some(v), Some(v))
      case _ => ()
    }
    if (!constrained) return None
    if ((0 until dimAttrs.size).exists(i => lo(i) > hi(i)))
      return Some(Literal.FalseLiteral) // box empty on the domain

    val strips = Layout.zStripsN(
      (0 until dimAttrs.size).map(i => (lo(i), hi(i))),
      meta.bits, meta.stripTopBits)
    if (strips.size >= (1L << meta.stripTopBits)) return None // no pruning

    def stripLit(v: Long): Literal = stripAttr.dataType match {
      case LongType => Literal(v)
      case IntegerType => Literal(v.toInt)
      case ShortType => Literal(v.toShort)
      case ByteType => Literal(v.toByte)
      case other => sys.error(s"unreachable strip type $other")
    }
    Some(
      if (strips.isEmpty) Literal.FalseLiteral
      else In(stripAttr, strips.map(stripLit)))
  }

  private def readMeta(fsRel: HadoopFsRelation,
                       root: org.apache.hadoop.fs.Path): Option[ZMeta] = {
    try {
      val fs = root.getFileSystem(
        fsRel.sparkSession.sessionState.newHadoopConf())
      val metaPath = new org.apache.hadoop.fs.Path(root, Layout.ZLayoutMetaFile)
      if (!fs.exists(metaPath)) return None
      val mtime = fs.getFileStatus(metaPath).getModificationTime
      metaCache.getOrElseUpdate((root.toString, mtime), {
        val in = fs.open(metaPath)
        val text =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](4096)
            var n = in.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
            new String(buf.toByteArray, "UTF-8")
          } finally in.close()
        val kv = text.linesIterator.flatMap { line =>
          line.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _ => None
          }
        }.toMap
        for {
          dims <- kv.get("dims").map(_.split(",").map(_.trim).toSeq)
            if dims.nonEmpty
          bits <- kv.get("bits").flatMap(_.toIntOption)
          stb <- kv.get("stripTopBits").flatMap(_.toIntOption)
          if bits >= 1 && dims.size * bits <= 62 && stb >= 1 &&
            stb <= dims.size * bits
        } yield ZMeta(dims, bits, stb)
      })
    } catch { case _: java.io.IOException => None } // unreadable ⇒ no pruning
  }
}
