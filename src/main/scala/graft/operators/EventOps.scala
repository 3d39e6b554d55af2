package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable event-time operators over a (user_id, event_id, ts_us, …)
  * relation — the public surface behind the gated event queries. The
  * streaming twins (watermarked windows, stateful cross-batch
  * sessionization) live in [[graft.streaming.StreamingOps]].
  */
object EventOps {

  /** Tumbling (or, with `slide`, sliding) event-time windows: one algebraic
    * hash aggregate (partial→final) grouped on the builtin window()
    * bucketing of a timestamp derived from epoch-micros. */
  def windowed(events: DataFrame, width: String,
      slide: Option[String] = None): DataFrame = {
    val ts = timestamp_micros(col("ts_us"))
    val w = slide.fold(window(ts, width))(sl => window(ts, width, sl))
    events
      .groupBy(w, col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("val_cents")).cast("double") / lit(100.0)).as("val_sum"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n"), col("val_sum"))
  }

  /** SCD2 (slowly-changing-dimension type 2) intervals from a change
    * stream: per key, each run of equal attribute values becomes one
    * versioned row (attr, valid_from, valid_to), open-ended (`valid_to`
    * NULL + is_current) for the latest version — the standard temporal-
    * dimension build step (the reference store's MapPut keeps only
    * last-writer state, reference hashmap.c:39-46; SCD2 is the
    * keep-the-history generalization).
    *
    * Scale shape: ONE shuffle on the key; the change filter (lag) and the
    * interval close (lead over the filtered set) share that partitioning,
    * so Catalyst plans a single exchange with two window passes. Ordering
    * ties break on `idCol` — deterministic under any arrival order. */
  def scd2(changes: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, idCol: String): DataFrame = {
    Markers.requireFree(changes, "scd2 input", "_prev", "_prevTs")
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    changes
      .withColumn("_prev", lag(col(attrCol), 1).over(byKey))
      // null-SAFE change detection: a NULL attribute is a legitimate
      // "value unknown" version, so NULL→'A' and 'A'→NULL open versions
      // while NULL→NULL does not (a plain =!= returns NULL against a NULL
      // side and silently drops the version). lag(attr) alone cannot tell
      // "first row" from "previous attr was NULL", so the first-row witness
      // is lag(ts) — tsCol is non-null, and the extra lag shares the same
      // window spec (no new exchange or sort). Oracle mirror:
      // `pts IS NULL OR (pk IS DISTINCT FROM k)`.
      .withColumn("_prevTs", lag(col(tsCol), 1).over(byKey))
      .where(col("_prevTs").isNull || !(col("_prev") <=> col(attrCol)))
      .withColumn("valid_from_us", col(tsCol))
      .withColumn("valid_to_us", lead(col(tsCol), 1).over(byKey))
      .select(col(keyCol), col(attrCol), col("valid_from_us"),
        col("valid_to_us"), col("valid_to_us").isNull.as("is_current"))
  }

  /** Windowed conversion funnel: how many users progressed through `stages`
    * in order, each hop within `windowUs` of the previous stage's timestamp.
    * Stage 1's time is the user's EARLIEST stage-1 event; each later stage
    * binds to the earliest qualifying event strictly after the previous
    * bind and within its window (the standard product-analytics funnel
    * semantics — greedy-earliest is well-defined and replayable in SQL as
    * nested conditional mins).
    *
    * Scale shape: ONE shuffle on user_id, then a per-user sorted scan with
    * O(#stages) state — no self-joins (the SQL form's k-stage cascade
    * re-shuffles the event table k times; this does it once), no windows,
    * nothing driver-resident. Per-user event lists sort in memory like
    * sessionize's; a pathological user is one task's work, not a plan
    * change. Output: (stage, lvl, n_users) — the classic funnel report. */
  def funnel(events: DataFrame, stages: Seq[String], windowUs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val stagesB = stages.toArray
    val levels = events
      .select(col("user_id").cast("long"), col("event_type"), col("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(_._3)
        var lvl = 0
        var tPrev = Long.MinValue
        var bound = Long.MaxValue // stage 1 is unconstrained
        var advanced = true
        while (advanced && lvl < stagesB.length) {
          val st = stagesB(lvl)
          var found = -1L
          var i = 0
          while (found < 0 && i < evs.length) {
            val e = evs(i)
            if (e._2 == st && e._3 > tPrev && e._3 <= bound) found = e._3
            i += 1
          }
          if (found >= 0) { lvl += 1; tPrev = found; bound = found + windowUs }
          else advanced = false
        }
        (uid, lvl)
      }.toDF("user_id", "lvl")
    val counts = levels.groupBy(col("lvl")).agg(count(lit(1)).as("n"))
    // users at level L reached every stage ≤ L: cumulative sum, tiny domain
    val stageDf = stagesB.zipWithIndex
      .map { case (st, i) => (st, (i + 1).toLong) }.toSeq
      .toDF("stage", "lvl_req")
    stageDf.join(counts, col("lvl") >= col("lvl_req"), "left")
      .groupBy(col("stage"), col("lvl_req").as("lvl"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_users"))
  }

  /** Peak concurrent sessions per hour — the capacity-planning sweep line,
    * in the DISTRIBUTED PREFIX-SUM shape: a naive sweep is one global
    * running sum over every boundary event (a single-partition window —
    * the classic scale trap). Instead: boundary points (+1 at start, −1 at
    * end+1, exclusive) bucket by hour; each bucket computes its own
    * running-sum max and total (window bounded by the hour's points); then
    * ONE window over the BUCKET TABLE — hours-in-corpus rows, telemetry-
    * sized, not event-sized — turns bucket totals into carry-ins. Peak in
    * an hour = max(carry at hour start, carry + within max); tie order
    * inside equal (t, delta) groups cannot change either max (equal deltas
    * commute). Hours with no boundary points carry silently (a session
    * spanning a silent hour peaks at its endpoints' hours). */
  def peakConcurrency(intervals: DataFrame): DataFrame = {
    val pts = intervals
      .select(col("sess_start_us").as("t"), lit(1L).as("delta"))
      .unionAll(intervals
        .select((col("sess_end_us") + 1L).as("t"), lit(-1L).as("delta")))
      .withColumn("bucket", expr("t div 3600000000"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = pts.withColumn("run", sum(col("delta")).over(wIn))
      .groupBy(col("bucket"))
      .agg(max(col("run")).as("in_max"), sum(col("delta")).as("tot"))
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("carry", sum(col("tot")).over(wB) - col("tot"))
      .select(col("bucket").as("hour_id"),
        greatest(col("carry"), col("carry") + col("in_max"))
          .as("peak_concurrent"))
      .orderBy("hour_id")
  }

  /** Journey (path) mining: each user's first `k` event types in time
    * order, joined with '>' — the "what do users actually do first"
    * report behind funnel design. ONE shuffle on user_id and a per-user
    * sorted prefix scan (same discipline as [[funnel]]); the journey table
    * that comes back is |users| rows of short strings, and the census
    * aggregate on it is journey-domain-sized. Ties at equal timestamps
    * break on event_id, so the path string is deterministic. */
  def journeys(events: DataFrame, k: Int, topN: Int): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id").cast("long"), col("ts_us"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val head = it.toArray.sortBy(e => (e._2, e._3)).take(k)
        (uid, head.map(_._4).mkString(">"))
      }.toDF("user_id", "journey")
      .groupBy(col("journey"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("journey"))
      // the census is journey-domain-sized; the REPORT is its top-N —
      // explicit parameter, not a buried constant, so no caller mistakes
      // the truncated report for the full census
      .limit(topN)
  }

  /** Gap-based sessionization, batch window-function form: lag → new-session
    * flag → running session ordinal → per-session aggregate. One shuffle on
    * user_id; both windows and the final aggregate share that partitioning.
    * Sessions are inherently per-user ordered, so the user_id window is the
    * semantic minimum — the merging-aggregate alternative is the builtin
    * session_window (q_session_window), and the unbounded-stream form is
    * StreamingOps.sessionize. */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts_us"), col("val_cents"))
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs
          || lag(col("ts_us"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        min(col("ts_us")).as("sess_start_us"),
        max(col("ts_us")).as("sess_end_us"),
        count(lit(1)).as("n_events"),
        (sum(col("val_cents")).cast("double") / lit(100.0)).as("val_sum"))
  }
}
