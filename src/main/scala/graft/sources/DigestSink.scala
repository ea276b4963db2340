package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `df.write.format("graft-digest")` — a DataSource V2 SINK that reduces
  * the written rows to an order-independent corpus digest: row count and
  * the XOR of a single LongType digest column.
  *
  * This is the V2 write path end-to-end, with the distributed-commit
  * pattern that matters at 1000 executors: every task accumulates O(1)
  * state (count + xor — both commutative and associative, so any retry /
  * reorder / partition split commits the same value), ships it to the
  * driver as its [[WriterCommitMessage]], and ONLY the driver-side
  * `commit()` — called once, after every task has succeeded — publishes
  * the combined result (atomic temp-file + move). Speculative or failed
  * task attempts call `abort()` and publish nothing, so the sink is
  * exactly-once under Spark's V2 commit protocol without any
  * coordination beyond the commit messages.
  *
  * Options: `path` (required) — directory; the result lands in
  * `path/digest.json` as `{"n_rows":N,"xor_digest":X}`.
  *
  * Input contract: exactly one LongType column (project a row digest,
  * e.g. `h60(...)`, before writing — digesting keys, not formatted rows,
  * keeps the digest engine-portable).
  */
class DigestSink extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-digest"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DigestSink.InputSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-digest requires option 'path'"))
    new DigestTable(path)
  }
}

object DigestSink {
  val InputSchema: StructType =
    StructType(Seq(StructField("digest", LongType, nullable = false)))

  /** Read back a committed digest result as one (n_rows, xor_digest) row. */
  def result(spark: org.apache.spark.sql.SparkSession,
             path: String): org.apache.spark.sql.DataFrame = {
    val schema = StructType(Seq(
      StructField("n_rows", LongType, nullable = false),
      StructField("xor_digest", LongType, nullable = false)))
    spark.read.schema(schema).json(s"$path/digest.json")
  }
}

private[sources] class DigestTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"graft_digest($path)"
  override def schema(): StructType = DigestSink.InputSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(in.fields.length == 1 && in.fields.head.dataType == LongType,
      s"graft-digest expects exactly one LongType column, got ${in.catalogString}")
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new DigestBatchWrite(path)
      }
    }
  }
}

private[sources] case class DigestCommit(n: Long, xor: Long)
  extends WriterCommitMessage

private[sources] class DigestBatchWrite(path: String) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private var n = 0L
          private var xor = 0L
          override def write(record: InternalRow): Unit = {
            n += 1
            xor ^= record.getLong(0)
          }
          override def commit(): WriterCommitMessage = DigestCommit(n, xor)
          override def abort(): Unit = ()
          override def close(): Unit = ()
        }
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var n = 0L
    var xor = 0L
    messages.foreach { case DigestCommit(tn, txor) => n += tn; xor ^= txor }
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val tmp = dir.resolve(".digest.json.tmp")
    Files.write(tmp,
      s"""{"n_rows":$n,"xor_digest":$xor}""".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("digest.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
