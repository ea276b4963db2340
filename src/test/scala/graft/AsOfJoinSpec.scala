package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-asof-test")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest right <= left ts; simultaneous row visible; unmatched -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), 9.0),  // after two right rows
      (1L, 101L, ts("2024-01-01 08:00:00"), 8.0),  // simultaneous with right @08:00
      (1L, 102L, ts("2024-01-01 06:00:00"), 7.0),  // before any right row
      (2L, 103L, ts("2024-01-01 12:00:00"), 6.0))  // key with no right rows
      .toDF("user_id", "event_id", "ts", "value")
    val right = Seq(
      (1L, ts("2024-01-01 07:00:00"), 70.0),
      (1L, ts("2024-01-01 08:00:00"), 80.0))
      .toDF("user_id", "ts", "value")

    val got = AsOfJoin.join(left, right, "user_id", "ts", "ts", Seq("ts", "value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[Timestamp]("r_ts")).map(_.toString).orNull,
        Option(r.getAs[Any]("r_value")).orNull))

    assert(got.toSeq == Seq(
      (100L, "2024-01-01 08:00:00.0", 80.0), // latest of the two
      (101L, "2024-01-01 08:00:00.0", 80.0), // equal ts counts (>= semantics)
      (102L, null, null),                     // left row precedes all rights
      (103L, null, null)))                    // key absent on the right
  }
}
