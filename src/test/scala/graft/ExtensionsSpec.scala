package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-installation path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must resolve every engine
  * function from plain SQL with no imperative registration call.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // ensure a genuinely fresh session so the extensions config applies
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("all engine functions resolve from SQL without register()") {
    val row = spark.sql(
      """SELECT h60('abc') AS h,
        |  minhash31(array('a b c', 'b c d'), 3) AS mh,
        |  simhash60(array('a', 'b')) AS sh,
        |  hybrid_sort_array(array(3, 1, 2)) AS srt
        |""".stripMargin).collect().head
    assert(row.getAs[Long]("h") == graft.functions.SimHashUtil.h60("abc"))
    assert(row.getSeq[Long](row.fieldIndex("mh")).length == 3)
    assert(row.getSeq[Int](row.fieldIndex("srt")).toSeq == Seq(1, 2, 3))
    val agg = spark.sql(
      """SELECT k, topk_by_score(s, i, 2) AS top FROM VALUES
        |  (1, 0.5d, 10L), (1, 0.9d, 11L), (1, 0.1d, 12L) AS t(k, s, i)
        |GROUP BY k""".stripMargin).collect().head
    assert(agg.getSeq[org.apache.spark.sql.Row](agg.fieldIndex("top"))
      .map(_.getAs[Long]("nbr_id")).toSeq == Seq(11L, 10L))
  }
}
