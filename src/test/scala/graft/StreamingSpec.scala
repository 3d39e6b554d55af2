package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  test("streaming tumbling window agg matches the batch q_event_tumbling") {
    val stream = StreamingOps.eventStream(spark, sf)
    val q = StreamingOps.tumblingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_out")
        .select("ws_us", "event_type", "n", "val_sum")
        .as[(Long, String, Long, Double)].collect().toSet
      val want = SparkEntry.queries("q_event_tumbling")(spark, sf)
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming sliding window agg matches the batch q_event_sliding") {
    val stream = StreamingOps.eventStream(spark, sf)
    val q = StreamingOps.slidingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sliding_out")
        .select("ws_us", "event_type", "n", "val_sum")
        .as[(Long, String, Long, Double)].collect().toSet
      val want = SparkEntry.queries("q_event_sliding")(spark, sf)
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming wordcount matches the batch flagship") {
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(s"$sf/documents.parquet*")
    val q = StreamingOps.wordcountStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("wc_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wc_out").as[(String, Long)].collect().toMap
      val want = SparkEntry.queries("wordcount")(spark, sf)
        .as[(String, Long)].collect().toMap
      assert(got == want)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per normalized text") {
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(s"$sf/documents.parquet*")
    val q = StreamingOps.dedupStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out")
      val batchDistinct = SparkEntry.queries("dedup_exact")(spark, sf).count()
      assert(got.count() == batchDistinct)
      assert(got.select("norm_md5").distinct().count() == batchDistinct)
    } finally q.stop()
  }

  test("out-of-order event older than the open session forms its own session") {
    // round-2 review: an event that precedes the open session's START by
    // more than the gap (but is still inside the watermark) must become a
    // separate earlier session — the old merge absorbed it into the open
    // session, diverging from the batch result
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-sess-ooo").toString
    val schema = Tables(spark, sf, "events").schema
    val H = 3600L * 1000 * 1000 // 1h in micros
    val S = 1000L * 1000 // 1s in micros: stays strictly above the watermark floor
    def one(uid: Long, eid: Long, tsUs: Long) =
      spark.range(1).select(lit(eid).as("event_id"), lit(tsUs * 1000).as("ts"),
        lit(uid).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/*.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "400 hours") // keep the deep-late event in scope
      .withColumn("val_cents", round(col("value") * lit(100)).cast("long"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("val_cents"),
        col("ts_t"))
      .as[StreamingOps.Ev]
    val q = StreamingOps.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo_out").start()
    try {
      one(1L, 10L, H).write.parquet(s"$dir/b1.parquet") // open session at 1h
      q.processAllAvailable()
      one(1L, 11L, S).write.parquet(s"$dir/b2.parquet") // deep-late event
      q.processAllAvailable()
      one(-1L, 12L, 500 * H).write.parquet(s"$dir/b3.parquet") // advance watermark
      q.processAllAvailable()
      one(-2L, 13L, 600 * H).write.parquet(s"$dir/b4.parquet") // fire timeouts
      q.processAllAvailable()
      val got = spark.table("sess_ooo_out").where(col("user_id") === 1L)
        .select("sess_start_us", "sess_end_us", "n_events", "val_sum")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == Set((S, S, 1L, 1.0), (H, H, 1L, 1.0)),
        s"late event merged across a > gap distance: $got")
    } finally q.stop()
  }

  test("stream-stream attribution join matches batch q_event_attrib") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-attrib").toString
    val ev = Tables(spark, sf, "events")
    // split mid-timeline: clicks buffered in batch-1 state must still match
    // purchases arriving in batch 2 (the cross-batch join-state path)
    val median = ev
      .selectExpr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY ts) AS BIGINT)")
      .head().getLong(0)
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/*.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
    val q = StreamingOps.attributionJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_out").start()
    try {
      ev.where(col("ts") <= median).write.parquet(s"$dir/b1.parquet")
      q.processAllAvailable()
      ev.where(col("ts") > median).write.parquet(s"$dir/b2.parquet")
      q.processAllAvailable()
      val got = spark.table("attrib_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = SparkEntry.queries("q_event_attrib")(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming funnel levels across batches match batch EventOps.funnel") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-funnel").toString
    val ev = Tables(spark, sf, "events")
    val stages = Seq("view", "click", "purchase")
    val W = 86400000000L
    // ordered mid-timeline split: a user's chain can span the boundary, so
    // batch-2 recomputation must extend batch-1 buffered state
    val median = ev
      .selectExpr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY ts) AS BIGINT)")
      .head().getLong(0)
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/*.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .select(col("user_id"), col("event_type"), col("ts_us"), col("ts_t"))
      .as[StreamingOps.FunnelEv]
    val q = StreamingOps.funnelStream(stream, stages, W)
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out").start()
    try {
      ev.where(col("ts") <= median).write.parquet(s"$dir/b1.parquet")
      q.processAllAvailable()
      ev.where(col("ts") > median).write.parquet(s"$dir/b2.parquet")
      q.processAllAvailable()
      // in-order arrival ⇒ per-user level is monotone: latest == max
      val lvls = spark.table("funnel_out")
        .groupBy("user_id").agg(max("lvl").as("lvl"))
        .as[(Long, Long)].collect()
      val gotCounts = stages.indices
        .map(i => stages(i) -> lvls.count(_._2 >= i + 1).toLong).toMap
      val want = graft.operators.EventOps.funnel(
          ev.withColumn("ts_us", expr("ts div 1000"))
            .select(col("user_id"), col("event_type"), col("ts_us")),
          stages, W)
        .select("stage", "n_users").as[(String, Long)].collect().toMap
      assert(gotCounts == want, s"stream $gotCounts vs batch $want")
    } finally q.stop()
  }

  test("sessionization RECOVERS from a checkpoint restart mid-stream") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-restart").toString
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    val ev = Tables(spark, sf, "events")
    val schema = ev.schema
    val median = ev
      .selectExpr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY ts) AS BIGINT)")
      .head().getLong(0)
    val maxTs = ev.agg(max(col("ts"))).head().getLong(0)
    def sentinel(uid: Long, ts: Long) =
      spark.range(1).select(lit(uid).as("event_id"), lit(ts).as("ts"),
        lit(uid).as("user_id"), lit("click").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    // memory sinks refuse checkpoint recovery; foreachBatch + parquet is
    // the recoverable, idempotent-enough sink (set compare absorbs a
    // replayed batch)
    val outDir = Files.createTempDirectory("graft-restart-out").toString
    def startQ() = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/*.parquet")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("ts_t", timestamp_micros(col("ts_us")))
        .withWatermark("ts_t", "1 second")
        .withColumn("val_cents", round(col("value") * lit(100)).cast("long"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("val_cents"), col("ts_t"))
        .as[StreamingOps.Ev]
      StreamingOps.sessionize(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StreamingOps.SessionOut],
              _: Long) =>
            df.write.mode("append").parquet(outDir)
        }.start()
    }
    def sunk(): Set[(Long, Long, Long, Long, Double)] =
      spark.read.parquet(outDir).where(col("user_id") >= 0)
        .select("user_id", "sess_start_us", "sess_end_us", "n_events",
          "val_sum")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
    // phase 1: half the timeline, then STOP — many sessions are open in the
    // state store at the stop point
    val q1 = startQ()
    ev.where(col("ts") <= median).write.parquet(s"$dir/b1.parquet")
    q1.processAllAvailable()
    q1.stop()
    // phase 2: a NEW query object resumes from the same checkpoint — source
    // offsets AND the open-session state must both come back
    val q2 = startQ()
    try {
      ev.where(col("ts") > median).write.parquet(s"$dir/b2.parquet")
      q2.processAllAvailable()
      sentinel(-1L, maxTs + 3600L * 1000 * 1000 * 1000)
        .write.parquet(s"$dir/b3.parquet")
      q2.processAllAvailable()
      sentinel(-2L, maxTs + 7200L * 1000 * 1000 * 1000)
        .write.parquet(s"$dir/b4.parquet")
      q2.processAllAvailable()
      val got = sunk()
      val want = SparkEntry.queries("q_sessionize")(spark, sf)
        .select("user_id", "sess_start_us", "sess_end_us", "n_events",
          "val_sum")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got == want,
        s"restart lost/duplicated sessions: got ${got.size}, want ${want.size}")
    } finally q2.stop()
  }

  test("stream-stream join RECOVERS its buffered state from a checkpoint restart") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-attr-restart").toString
    val ckpt = Files.createTempDirectory("graft-attr-ckpt").toString
    val outDir = Files.createTempDirectory("graft-attr-out").toString
    val ev = Tables(spark, sf, "events")
    val schema = ev.schema
    val median = ev
      .selectExpr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY ts) AS BIGINT)")
      .head().getLong(0)
    def startQ() = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/*.parquet")
        .withColumn("ts_us", expr("ts div 1000"))
      StreamingOps.attributionJoin(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(outDir)
        }.start()
    }
    // phase 1: the early half of the timeline — clicks whose purchases are
    // still to come sit in the join's buffered state at the stop point
    val q1 = startQ()
    ev.where(col("ts") <= median).write.parquet(s"$dir/b1.parquet")
    q1.processAllAvailable()
    q1.stop()
    // phase 2: a NEW query resumes from the checkpoint — cross-boundary
    // purchase-click matches require the RESTORED click buffer
    val q2 = startQ()
    try {
      ev.where(col("ts") > median).write.parquet(s"$dir/b2.parquet")
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .select("event_id", "user_id", "ts_us", "click_id", "click_ts_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = SparkEntry.queries("q_event_attrib")(spark, sf)
        .select("event_id", "user_id", "ts_us", "click_id", "click_ts_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want,
        s"restart lost/duplicated matches: got ${got.size}, want ${want.size}")
    } finally q2.stop()
  }

  test("stateful sessionization across batches matches batch q_sessionize") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-sess").toString
    val ev = Tables(spark, sf, "events")
    val schema = ev.schema
    // split the stream mid-timeline so many sessions SPAN the batch boundary
    // — this exercises the open-session state merge, not just within-batch
    // sessionization
    val median = ev
      .selectExpr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY ts) AS BIGINT)")
      .head().getLong(0)
    val maxTs = ev.agg(max(col("ts"))).head().getLong(0)
    def sentinel(uid: Long, ts: Long) =
      spark.range(1).select(lit(uid).as("event_id"), lit(ts).as("ts"),
        lit(uid).as("user_id"), lit("click").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))

    val stream = spark.readStream.schema(schema).parquet(s"$dir/*.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 second")
      .withColumn("val_cents", round(col("value") * lit(100)).cast("long"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("val_cents"),
        col("ts_t"))
      .as[StreamingOps.Ev]
    val q = StreamingOps.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      ev.where(col("ts") <= median).write.parquet(s"$dir/b1.parquet")
      q.processAllAvailable()
      ev.where(col("ts") > median).write.parquet(s"$dir/b2.parquet")
      q.processAllAvailable()
      // two far-future sentinels: the first advances the watermark past every
      // open session's last+gap; the second runs a data batch afterwards so
      // the event-time timeouts actually fire and flush the opens
      sentinel(-1L, maxTs + 3600L * 1000 * 1000 * 1000)
        .write.parquet(s"$dir/b3.parquet")
      q.processAllAvailable()
      sentinel(-2L, maxTs + 7200L * 1000 * 1000 * 1000)
        .write.parquet(s"$dir/b4.parquet")
      q.processAllAvailable()
      val got = spark.table("sess_out").where(col("user_id") >= 0)
        .select("user_id", "sess_start_us", "sess_end_us", "n_events", "val_sum")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      val want = SparkEntry.queries("q_sessionize")(spark, sf)
        .select("user_id", "sess_start_us", "sess_end_us", "n_events", "val_sum")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }
}
