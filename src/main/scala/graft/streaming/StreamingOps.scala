package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event-time operators.
  *
  * The reference is strictly batch (hard map→reduce barrier, reference
  * mapreduce.c:211-214); this module shows the same engine queries running
  * incrementally: watermarked tumbling-window aggregation and
  * flatMapGroupsWithState sessionization whose emitted sessions match the
  * batch q_sessionize query (asserted in StreamingSpec).
  */
object StreamingOps {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long, val_cents: Long)
  case class SessionState(startUs: Long, lastUs: Long, n: Long, cents: Long)
  case class SessionOut(user_id: Long, sess_start_us: Long, sess_end_us: Long,
      n_events: Long, val_sum: Double)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Watermarked tumbling 1h count+sum per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("val_cents")).cast("double") / lit(100.0)).as("val_sum"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n"), col("val_sum"))

  /** Gap-based sessionization with explicit state — the streaming twin of the
    * batch window-function form in EventQueries ("q_sessionize").
    *
    * ProcessingTimeTimeout + a final `complete=true` flush marker are not
    * needed for the parity test because the source is bounded; in production
    * the same function runs with EventTimeTimeout against the watermark.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          // bounded-source parity mode: all of a user's events arrive in one
          // group; sort by (ts, id) like the batch ORDER BY and emit sessions.
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val sessions = scala.collection.mutable.ListBuffer.empty[SessionState]
          var cur: SessionState = null
          sorted.foreach { e =>
            if (cur == null || e.ts_us - cur.lastUs > GapUs) {
              if (cur != null) sessions += cur
              cur = SessionState(e.ts_us, e.ts_us, 1L, e.val_cents)
            } else {
              cur = SessionState(cur.startUs, e.ts_us, cur.n + 1, cur.cents + e.val_cents)
            }
          }
          if (cur != null) sessions += cur
          state.update(Nil)
          sessions.iterator.map(st =>
            SessionOut(userId, st.startUs, st.lastUs, st.n, st.cents / 100.0))
      }
  }

  /** Streaming wordcount: the flagship query incremental. Complete-mode
    * aggregate state is one row per distinct word (vocabulary-bounded, not
    * stream-bounded), updated with the same partial→final hash aggregation
    * as the batch plan. */
  def wordcountStream(docs: DataFrame): DataFrame =
    docs
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Streaming exact dedup: first-seen row per normalized-text hash — the
    * incremental twin of the batch `dedup_exact` query. State is the set of
    * seen 32-byte keys; with the watermark, keys older than the delay are
    * dropped from state, which is the standard bounded-state trade for
    * unbounded streams (exactly-once within the watermark horizon). */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm_md5",
        md5(regexp_replace(trim(lower(col("text"))), "[ \\t\\r\\n]+", " ")))
      .withColumn("arrival", current_timestamp())
      .withWatermark("arrival", "1 hour")
      .dropDuplicates("norm_md5")
      .select(col("doc_id"), col("norm_md5"))

  /** Bounded parquet dir → streaming DataFrame with the events schema
    * normalized the same way as the batch path (nanos long → micros). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // The testdata table is a bare file, and FileStreamSource forces
    // basePath=<path> for non-glob paths ('basePath' must be a directory).
    // A glob that matches only this file sidesteps the override.
    spark.readStream.schema(schema).parquet(s"$dir/events.parquet*")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("val_cents", round(col("value") * lit(100)).cast("long"))
  }
}
