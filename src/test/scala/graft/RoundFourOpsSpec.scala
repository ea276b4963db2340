package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Events, Similarity, TextStats}

/** Round-4 additions: conversion funnel, cohort retention, vocabulary
  * build, source-mixture weights, and SemDeDup-style semantic dedup.
  */
class RoundFourOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-round4-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel counts only strictly-ordered step completions") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      // u1 completes all three in strict order
      (1L, "view", ts("2026-01-01 10:00:00")),
      (1L, "click", ts("2026-01-01 10:01:00")),
      (1L, "purchase", ts("2026-01-01 10:02:00")),
      // u2's click is simultaneous with the view — NOT strictly after —
      // so the click (and the later purchase) must not count
      (2L, "view", ts("2026-01-01 11:00:00")),
      (2L, "click", ts("2026-01-01 11:00:00")),
      (2L, "purchase", ts("2026-01-01 11:05:00")),
      // u3 clicks without ever viewing: no step counts
      (3L, "click", ts("2026-01-01 12:00:00")),
      // u4 views then purchases, skipping click: only the view counts
      (4L, "view", ts("2026-01-01 13:00:00")),
      (4L, "purchase", ts("2026-01-01 13:01:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }

  test("cohortRetention buckets activity by first-seen day and day offset") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      // u1: cohort Jan 1, active on day 0 (twice — must dedup) and day 2
      (1L, ts("2026-01-01 08:00:00")), (1L, ts("2026-01-01 20:00:00")),
      (1L, ts("2026-01-03 09:00:00")),
      // u2: cohort Jan 1, active day 0 only
      (2L, ts("2026-01-01 10:00:00")),
      // u3: cohort Jan 2, active day 0 and day 1
      (3L, ts("2026-01-02 10:00:00")), (3L, ts("2026-01-03 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Events.cohortRetention(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2026-01-01", 0L) -> 2L, ("2026-01-01", 2L) -> 1L,
      ("2026-01-02", 0L) -> 1L, ("2026-01-02", 1L) -> 1L))
  }

  test("vocabTopK ranks by count desc then term asc, bounded at k") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "banana cherry date")
    ).toDF("doc_id", "text")
    val out = TextStats.vocabTopK(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // banana ties apple at 3 — term asc puts apple first
    assert(out.toSeq == Seq((1L, "apple", 3L), (2L, "banana", 3L), (3L, "cherry", 2L)))
  }

  test("sourceMix: sqrt-temperature weights renormalize to 1") {
    val sp = spark; import sp.implicits._
    // 9 and 16 tokens: shares .36/.64, sqrt .6/.8, weights 3/7 and 4/7
    val docs = Seq(
      (1L, "a b c d e f g h i", "srcA"),
      (2L, "a b c d e f g h i j k l m n o p", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = TextStats.sourceMix(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("srcA") == ((9L, 0.36, 0.428571)))
    assert(out("srcB") == ((16L, 0.64, 0.571429)))
  }

  test("funnel plan: one user-keyed shuffle, no joins, no re-scan chain") {
    val sp = spark; import sp.implicits._
    val events = Seq((1L, "view", ts("2026-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val plan = Events.funnel(events, Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not plan joins:\n$plan")
    val userShuffles = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userShuffles == 1,
      s"expected exactly 1 user_id shuffle, got $userShuffles:\n$plan")
  }

  test("cohortRetention plan: no join, no count_distinct expand") {
    val sp = spark; import sp.implicits._
    val events = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("user_id", "ts")
    val plan = Events.cohortRetention(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"cohort must not plan a join:\n$plan")
    assert(!plan.contains("Expand"),
      s"cohort must not plan a count_distinct Expand:\n$plan")
  }

  test("sourceMix plan: the corpus is scanned exactly once") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "a b", "srcA")).toDF("doc_id", "text", "source")
    val plan = TextStats.sourceMix(docs).queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$plan")
  }

  test("funnel equals a naive per-user fold on random event sets") {
    val sp = spark; import sp.implicits._
    val steps = Seq("view", "click", "purchase")
    val rnd = new scala.util.Random(202)
    (1 to 5).foreach { _ =>
      val events = List.fill(200)((
        rnd.nextInt(12).toLong,
        steps(rnd.nextInt(3)),
        // coarse second grid on purpose: simultaneous events must tie-fail
        ts(f"2026-01-01 10:00:${rnd.nextInt(30)}%02d")))
      // naive reference: per user, sequentially find min ts per step with
      // each step strictly after the previous step's chosen ts
      val expected = steps.indices.map { i =>
        events.groupBy(_._1).values.count { evts =>
          var prev = Option.empty[Long]
          var ok = true
          (0 to i).foreach { s =>
            if (ok) {
              val cands = evts.filter(e => e._2 == steps(s) &&
                prev.forall(p => e._3.getTime > p)).map(_._3.getTime)
              if (cands.isEmpty) ok = false else prev = Some(cands.min)
            }
          }
          ok
        }.toLong
      }
      val out = Events.funnel(events.toDF("user_id", "event_type", "ts"), steps)
        .collect().sortBy(_.getLong(0)).map(_.getLong(2)).toSeq
      assert(out == expected, s"events=$events")
    }
  }

  test("cohortRetention equals a naive grouping on random event sets") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(303)
    (1 to 5).foreach { _ =>
      val events = List.fill(150)((
        rnd.nextInt(10).toLong,
        ts(f"2026-01-${rnd.nextInt(9) + 1}%02d 0${rnd.nextInt(10)}:00:00")))
      val days = events.map { case (u, t) => (u, t.toLocalDateTime.toLocalDate) }
      val cohort = days.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val expected = days.distinct
        .groupBy { case (u, d) =>
          (cohort(u).toString, d.toEpochDay - cohort(u).toEpochDay) }
        .view.mapValues(_.size.toLong).toMap
      val out = Events.cohortRetention(events.toDF("user_id", "ts"))
        .collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
      assert(out == expected, s"events=$events")
    }
  }

  test("semanticDedup pairs only within a cell and above the cosine floor") {
    val sp = spark; import sp.implicits._
    // two identical vectors (cos 1.0), one orthogonal, one diagonal
    // (cos ~= .7071 to both axes — ties assign it to the smallest cell)
    val embs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(embs, numCentroids = 4, minCosine = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }
}
