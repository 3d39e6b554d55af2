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

  test("flatMapGroupsWithState sessionization matches batch q_sessionize") {
    val evs = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"),
        round(col("value") * lit(100)).cast("long").as("val_cents"))
      .as[StreamingOps.Ev]
    val got = StreamingOps.sessionize(evs)
      .collect().map(s => (s.user_id, s.sess_start_us, s.sess_end_us, s.n_events, s.val_sum))
      .toSet
    val want = SparkEntry.queries("q_sessionize")(spark, sf)
      .select("user_id", "sess_start_us", "sess_end_us", "n_events", "val_sum")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == want)
  }
}
