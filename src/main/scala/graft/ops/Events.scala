package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Time-series operators over the `events` table (ts timestamp, user_id,
  * event_type, value double, props JSON string).
  *
  * Batch tumbling windows via `window($"ts", ...)`: the aggregation is a
  * single hash-aggregate keyed on (window, event_type) — partial map-side
  * combine, one shuffle of the (tiny) group keys, never a row-level
  * shuffle. JSON extraction (`get_json_object`) is a map-side projection
  * evaluated before the aggregate. The same plan shape runs under
  * Structured Streaming (`readStream` + watermark) unchanged — the window
  * expression is identical in both modes.
  *
  * Money-style sums go through DECIMAL(18,2) so they are order-independent
  * and bit-identical to a SQL oracle; the window start is formatted as a
  * string so timestamp precision never enters the comparison.
  */
object Events {

  /** Per-hour, per-type event stats: count, exact value sum, and the sum of
    * the JSON `$.k` property.
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"), col("sum_k"))

  /** Gap-based sessionization (batch): consecutive events of a user belong
    * to one session while the gap between them is ≤ `gapMinutes`; a larger
    * gap starts a new session. Classic gaps-and-islands: a lag-window marks
    * session breaks, a running sum numbers sessions, one aggregate folds
    * each session.
    *
    * Scale: both windows partition by `user_id` — per-user event counts are
    * bounded in practice (a user is not a corpus), so unlike a window over
    * a tiny key space this does not concentrate the dataset on few tasks;
    * the plan is one shuffle on user_id reused by both windows AND the
    * final aggregate (Spark keeps the partitioning). The streaming
    * restatement ([[graft.streaming.StreamOps.sessionize]]) computes the
    * same sessions incrementally with `flatMapGroupsWithState`.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // µs precision on both sides of the oracle comparison (DuckDB
    // epoch_us); unix_timestamp would floor to seconds and disagree with
    // a fractional-second oracle at exact gap boundaries.
    val gapUs = gapMinutes * 60000000L
    val brk = when(
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) > gapUs,
      1L).otherwise(0L)
    val sid = sum(brk).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    events
      .withColumn("sid", sid)
      .groupBy(col("user_id"), col("sid"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(col("user_id"), col("sid"), col("session_start"),
        col("session_end"), col("n_events"), col("total_value"))
  }

  /** Per-user activity profile: event count, distinct active days, total
    * value — the "user feature" shape of a training-data pipeline.
    */
  def userStats(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        sum(dec2(col("value"))).cast("double").as("total_value"))

  /** Typed JSON projection + aggregate: `props` is parsed ONCE per row via
    * `from_json` with an explicit schema (at scale, schema-projected
    * parsing beats repeated `get_json_object` calls — one parse, pruned to
    * the referenced fields), then a per-type integer aggregate. Map-side
    * combine; the shuffle carries one row per event_type.
    */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), lit("k LONG")).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** First-order event-type transition counts (Markov bigrams): per-user
    * lag pairs the consecutive event types, then one hash-aggregate counts
    * each (from, to) edge. One shuffle on user_id (the window), one tiny
    * grouped shuffle — the sequence-mining primitive behind funnel and
    * next-action analyses.
    */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(byUser).as("prev"))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("prev").as("from_type"), col("event_type").as("to_type"),
        col("n"))
  }

  /** Per-type z-score of `value` — the feature-normalization pass. Group
    * moments come from EXACT decimal sums (order-independent, so any
    * engine reproduces them bit-for-bit); mean/variance/z are then a
    * fixed-order double expression. Two-pass shape: one tiny stats
    * aggregate (rows = |event_type|, broadcast back), one map-only scoring
    * pass — at 100 TB the data crosses the wire zero times.
    */
  /** Cohort retention: users grouped by first-seen day, activity counted
    * per (cohort day, day offset) — the engagement matrix behind every
    * retention curve.
    *
    * Scale shape: the corpus collapses ONCE, map-side, through the
    * (user, day) distinct (partial aggregation dedups before the
    * shuffle); everything after runs on ≤ users × active-days rows. The
    * cohort day is a min-window over that reduced frame's user
    * partitioning — per-partition state is one user's distinct days, and
    * because the rows are already (user, day)-distinct, the final
    * (cohort, offset) aggregate is a plain count: no corpus-level
    * count_distinct expand, no join. Final group cardinality is days² —
    * trivially small at any corpus size.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    ud.withColumn("cohort_day",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered conversion funnel: how many users completed each step of
    * `steps`, where step i+1 must occur STRICTLY AFTER the user's earliest
    * completion of step i.
    *
    * Each stage is a conditional-min WINDOW over the same user
    * partitioning — `t_i = min(ts | type = step_i ∧ ts > t_{i-1})` — so
    * the whole k-step chain is ONE shuffle of the (user, type, ts)
    * projection followed by k stacked window passes and a user-keyed
    * reduction that reuses the partitioning: no per-stage re-scan, no
    * join chain, no per-user sequence materialization. State per user
    * per stage: one timestamp.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val w = Window.partitionBy(col("user_id"))
    val staged = steps.zipWithIndex.foldLeft(
      events.select(col("user_id"), col("event_type"), col("ts"))) {
      case (df, (step, i)) =>
        val cond =
          if (i == 0) col("event_type") === step
          else col("event_type") === step && col("ts") > col(s"t${i - 1}")
        df.withColumn(s"t$i", min(when(cond, col("ts"))).over(w))
    }
    // one row per user (every row of a user carries identical t_i)
    val perUser = staged.groupBy(col("user_id")).agg(
      steps.indices.map(i => max(col(s"t$i")).as(s"t$i")).head,
      steps.indices.map(i => max(col(s"t$i")).as(s"t$i")).tail: _*)
    val counts = perUser.agg(
      steps.indices.map(i => count(col(s"t$i")).as(s"n$i")).head,
      steps.indices.map(i => count(col(s"t$i")).as(s"n$i")).tail: _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i + 1).cast("long").as("step"), lit(step).as("step_name"),
          col(s"n$i").as("n_users"))
      }: _*)).as("f"))
      .select(col("f.step"), col("f.step_name"), col("f.n_users"))
  }

  /** Time-series gap filling: the dense (event_type × hour) grid over the
    * corpus's hour range, with missing cells as explicit zero rows — what
    * charting/forecasting consumers need (a missing hour and a zero hour
    * are different facts).
    *
    * Scale shape: counts reduce FIRST (one hash-aggregate — the only pass
    * over the corpus); the dense grid is dimensions-only (distinct types ×
    * the broadcast 1-row hour bounds exploded into the hour sequence), so
    * the fill join touches O(types · hours) rows no matter the corpus
    * size. The hour axis is bounded by calendar time, not data volume.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"),
      date_trunc("hour", col("ts")).as("hour"))
    val counts = ev.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val bounds = ev.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val hours = bounds.select(explode(
      sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val types = ev.select(col("event_type")).distinct()
    // explicit broadcast: the hour axis is calendar-bounded, so the grid
    // cross join must plan as a bounded-broadcast BNLJ, never a cartesian
    types.crossJoin(broadcast(hours))
      .join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Event-stream compaction: drop events whose type equals the SAME
    * user's immediately-preceding type (dedup of refresh storms /
    * double-clicks — the standard pre-sessionization cleanup). One
    * shuffle on user_id; the lag window scans each user's stream once
    * with O(1) state. Order is pinned by (ts, event_id) so ties
    * compact identically in any engine.
    */
  def compactStream(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"))
  }

  def valueZscore(events: DataFrame): DataFrame = {
    val stats = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).as("s"),
        sum(dec2(col("value")) * dec2(col("value"))).as("s2"))
    val nD = col("n").cast("double")
    val sD = col("s").cast("double")
    val mean = sD / nD
    val variance = (col("s2").cast("double") - sD * sD / nD) / nD
    events.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        when(variance > 0d, round((col("value") - mean) / sqrt(variance), 4))
          .otherwise(0.0d).as("z"))
  }
}
