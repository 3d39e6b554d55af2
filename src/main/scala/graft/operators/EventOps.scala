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
