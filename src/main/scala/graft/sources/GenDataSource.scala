package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft-gen")` — the reference's random data source
  * (`/root/reference/SequentialQuickInsert.c:66-70`,
  * `quickThreshold.c:147,166-168`: fill an array with N bounded ints) as a
  * first-class DataSource V2 table.
  *
  * Options:
  *  - `n` (required): row count
  *  - `bound` (default 5000000): values are in [0, bound)
  *  - `numPartitions` (default 8): generation parallelism
  *
  * Schema: (id BIGINT, value BIGINT) where
  * `value = ((id % (2^31-1)) * 2654435761) % bound` — the same
  * engine-agnostic multiplicative-congruential formula as
  * [[graft.ops.Gen.lcgInts]], so a SQL oracle regenerates identical rows
  * (the reference's fixed-seed-42 reproducibility restated portably).
  *
  * Scale design: generation is embarrassingly parallel — each input
  * partition emits its own id range with O(1) state, nothing ever
  * materializes on the driver, so the same source serves 1e3 rows and
  * 1e12. Column pruning is pushed into the reader (a `value`-only scan
  * never materializes ids), and `id`-range predicates prune the generated
  * range itself (the V2 analog of partition pruning: excluded ids are
  * never produced on any executor) — demonstrating both V2 pushdown
  * surfaces on the engine's one "table format".
  */
class GenDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-gen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val n = Option(properties.get("n")).map(_.toLong).getOrElse(
      throw new IllegalArgumentException("graft-gen requires option 'n'"))
    val bound = Option(properties.get("bound")).map(_.toLong).getOrElse(5000000L)
    val parts = Option(properties.get("numpartitions")).map(_.toInt).getOrElse(8)
    require(n >= 0 && bound > 0 && parts > 0)
    new GenTable(n, bound, parts)
  }
}

object GenDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", LongType, nullable = false)))

  val LcgDomain = 2147483647L // 2^31 - 1; domain-reduce before the multiply

  def lcg(id: Long, bound: Long): Long = ((id % LcgDomain) * 2654435761L) % bound
}

private[sources] class GenTable(n: Long, bound: Long, parts: Int)
  extends Table with SupportsRead {

  override def name(): String = s"graft_gen(n=$n, bound=$bound)"
  override def schema(): StructType = GenDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(n, bound, parts)
}

private[sources] class GenScanBuilder(n: Long, bound: Long, parts: Int)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {

  import org.apache.spark.sql.sources._

  private var required: StructType = GenDataSource.Schema
  private var lo: Long = 0L        // inclusive generated-id lower bound
  private var hi: Long = n         // exclusive generated-id upper bound
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Range predicates on `id` prune the GENERATED range itself — the V2
    * analog of partition pruning: a filtered scan never materializes the
    * excluded ids on any executor (vs. generate-then-discard). Everything
    * else stays with Spark as a residual filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) | IsNotNull("id") => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _                                 => () // IsNotNull: non-null column, no-op
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GenScan(required, math.max(0L, lo), math.min(n, hi), bound, parts)
}

private[sources] class GenScan(required: StructType, lo: Long, hi: Long,
                               bound: Long, parts: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // Surfaced in `.explain` so plan tests can assert the pruned range.
  override def description(): String = s"graft-gen-scan[$lo,$hi)"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    val per = math.max(1L, (span + parts - 1) / parts)
    (lo until hi by per).map(s => GenRange(s, math.min(s + per, hi)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames.toSeq
    val b = bound
    (partition: InputPartition) => {
      val GenRange(start, end) = partition
      new PartitionReader[InternalRow] {
        private var id = start - 1
        override def next(): Boolean = { id += 1; id < end }
        override def get(): InternalRow =
          InternalRow.fromSeq(cols.map {
            case "id" => id
            case "value" => GenDataSource.lcg(id, b)
          })
        override def close(): Unit = ()
      }
    }
  }
}

private[sources] case class GenRange(start: Long, end: Long) extends InputPartition
