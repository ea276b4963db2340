package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The RESUME half of the streaming checkpoint contract, asserted
  * per-phase (the `stream_resume` query proves the end state against the
  * DuckDB oracle; this spec watches the restart itself): a checkpointed
  * stateful dedup is stopped after half the keyspace, the source grows a
  * file that re-sends EVERY emitted key plus genuinely new ones, and a
  * brand-new query object started on the same checkpoint must
  *
  *  - skip the already-committed file (source offset log recovery),
  *  - suppress every re-sent key (state store recovery), and
  *  - append exactly the new keys (progress after restart).
  *
  * Phase boundaries are read from the sink itself between the two runs,
  * so a violation is attributed to the leg that broke it instead of
  * surfacing as an end-state hash mismatch.
  */
class StreamResumeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-stream-resume-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a new query on the old checkpoint resumes: state restored, file log honored, new keys only") {
    val sp = spark; import sp.implicits._
    val keyMod = 40L
    // ids 0..199: every key 0..39 occurs 5x; low keys (< 20) also occur
    // in phase 1, so phase 2's full re-send genuinely tests suppression
    val ids = (0L until 200L).toDF("event_id")
    val base = java.nio.file.Files.createTempDirectory("t_resume").toString
    val src = s"$base/src"; new java.io.File(src).mkdirs()
    def addFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$base/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet")): Unit
    }
    def runOnce(): Unit = {
      val out = spark.readStream.schema("event_id BIGINT").parquet(src)
        .select(pmod(col("event_id"), lit(keyMod)).as("k"))
        .dropDuplicates("k")
      val q = out.writeStream
        .outputMode(OutputMode.Append)
        .format("parquet")
        .option("path", s"$base/data")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sink(): Seq[Long] =
      spark.read.schema("k BIGINT").parquet(s"$base/data")
        .collect().map(_.getLong(0)).toSeq

    addFile(ids.where(pmod(col("event_id"), lit(keyMod)) < 20), "phase1")
    runOnce()
    val after1 = sink()
    assert(after1.sorted == (0L until 20L),
      s"phase 1 must emit exactly the low keys once: $after1")

    addFile(ids, "phase2") // re-sends ALL low keys + the 20 new high ones
    runOnce() // NEW query object, SAME checkpoint
    val after2 = sink()
    assert(after2.size == after2.distinct.size,
      s"resumed query re-emitted keys — state or offset log lost: " +
        after2.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted)
    assert(after2.sorted == (0L until keyMod),
      s"resumed query must append exactly the new keys: ${after2.sorted}")
  }
}
