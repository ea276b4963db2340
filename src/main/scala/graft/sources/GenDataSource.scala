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
  * never materializes ids), demonstrating the V2 pushdown surface on the
  * engine's one "table format".
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
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = GenDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val per = math.max(1L, (n + parts - 1) / parts)
      (0L until n by per).map(s => GenRange(s, math.min(s + per, n)): InputPartition).toArray
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
}

private[sources] case class GenRange(start: Long, end: Long) extends InputPartition
