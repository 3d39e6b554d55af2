package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{KvBatchWrite, KvWriterFactory}

/** The DSv2 write path's exactly-once contract, driven both through Spark
  * (round trip, truncate overwrite) and at the BatchWrite API directly
  * (speculative duplicate attempts, job abort) — the failure cases Spark
  * only produces under real task loss. */
class KvTextSinkSpec extends SparkTestBase {

  private val fmt = classOf[graft.sources.KvTextSource].getName

  private def freshDir(): String = {
    val d = Files.createTempDirectory("kvsink")
    d.toString
  }

  private def writeKv(dir: String, rows: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("key", "value").repartition(2)
      .write.format(fmt).mode("overwrite").save(dir)
  }

  test("round trip through the V2 write + read seams is value-exact") {
    val dir = freshDir()
    val rows = Seq(("a", 1L), ("b", -2L), ("c", 30L))
    writeKv(dir, rows)
    val back = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(back == rows.sorted)
  }

  test("overwrite truncates: second write fully replaces the first") {
    val dir = freshDir()
    writeKv(dir, Seq(("old", 1L), ("old", 2L)))
    writeKv(dir, Seq(("new", 7L)))
    val back = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(back == Seq(("new", 7L)))
  }

  private def row(k: String, v: Long): InternalRow =
    InternalRow(UTF8String.fromString(k), java.lang.Long.valueOf(v))

  test("speculative duplicate attempt: only the committed message lands") {
    val dir = freshDir()
    val bw = new KvBatchWrite(dir, "job1", truncate = false,
      Seq("key", "value"))
    val factory = new KvWriterFactory(dir, "job1", graft.sources.KvTextSource.sessionConfMap())
    // two attempts of partition 0 race; both stage, ONE commits
    val winner = factory.createWriter(0, taskId = 100L)
    val loser = factory.createWriter(0, taskId = 101L)
    winner.write(row("w", 1L))
    loser.write(row("l", 666L))
    val msg = winner.commit()
    // the losing attempt is killed without abort (executor lost) — its
    // staged file survives until the driver commit sweeps staging
    bw.commit(Array(msg))
    val back = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(back == Seq(("w", 1L)), s"duplicate attempt leaked: $back")
    assert(!new java.io.File(s"$dir/_staging").exists,
      "staging not swept on commit")
  }

  test("job abort leaves the table exactly as it was") {
    val dir = freshDir()
    writeKv(dir, Seq(("keep", 5L)))
    val bw = new KvBatchWrite(dir, "job2", truncate = true,
      Seq("key", "value"))
    val w = new KvWriterFactory(dir, "job2", graft.sources.KvTextSource.sessionConfMap()).createWriter(0, 200L)
    w.write(row("doomed", 9L))
    val msg = w.commit()
    bw.abort(Array(msg))
    val back = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(back == Seq(("keep", 5L)), s"abort corrupted the table: $back")
    assert(!new java.io.File(s"$dir/_staging/job2").exists)
  }

  private def streamingPair(dir: String, runId: String) = {
    val sw = new graft.sources.KvStreamingWrite(dir, runId,
      truncate = false, Seq("key", "value"))
    val wf = new graft.sources.KvStreamingWriterFactory(dir, runId,
      graft.sources.KvTextSource.sessionConfMap())
    (sw, wf)
  }

  test("streaming sink: a replayed epoch commit is discarded, not " +
      "double-applied") {
    val dir = freshDir()
    val (sw, wf) = streamingPair(dir, "run1")
    val w1 = wf.createWriter(0, 10L, epochId = 3L)
    w1.write(row("a", 1L)); w1.write(row("b", 2L))
    sw.commit(3L, Array(w1.commit()))
    // restart replays the last batch: tasks re-stage, driver re-commits
    val w2 = wf.createWriter(0, 11L, epochId = 3L)
    w2.write(row("a", 1L)); w2.write(row("b", 2L))
    sw.commit(3L, Array(w2.commit()))
    val back = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(back == Seq(("a", 1L), ("b", 2L)),
      s"replayed epoch duplicated rows: $back")
    assert(!new java.io.File(s"$dir/_staging").exists,
      "replayed attempt's staging not swept")
    assert(new java.io.File(s"$dir/_SUCCESS").exists, "_SUCCESS not healed")
  }

  test("streaming sink: epoch markers are pruned to a bounded tail, and " +
      "the last epoch stays replay-idempotent") {
    val dir = freshDir()
    val (sw, wf) = streamingPair(dir, "run-prune")
    for (e <- 0L until 20L) {
      val w = wf.createWriter(0, 100L + e, epochId = e)
      w.write(row(s"k$e", e))
      sw.commit(e, Array(w.commit()))
    }
    val markers = new java.io.File(s"$dir/_epochs").list()
      .filterNot(_.startsWith(".")).map(_.toLong).sorted.toSeq
    // 20 epochs committed, only the most recent 16 markers survive —
    // sustained ingest can never grow the marker dir unboundedly
    assert(markers == (4L until 20L),
      s"expected markers 4..19 after pruning, got $markers")
    // the only epoch Spark can re-deliver (the last) still short-circuits
    val w2 = wf.createWriter(0, 999L, epochId = 19L)
    w2.write(row("k19", 19L))
    sw.commit(19L, Array(w2.commit()))
    val back = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(back.size == 20 && back.distinct.size == 20,
      s"replayed last epoch after pruning duplicated rows: $back")
  }

  test("streaming sink: renamed files from an attempt that died before " +
      "its marker are swept by the fresh attempt") {
    val dir = freshDir()
    // simulate epoch 5 dying mid-commit: a data file landed, no marker
    val stray = new java.io.File(s"$dir/e5-part-0-99.kv")
    val os = new java.io.FileOutputStream(stray)
    os.write("dead\t666\n".getBytes("UTF-8")); os.close()
    val (sw, wf) = streamingPair(dir, "run2")
    val w = wf.createWriter(0, 20L, epochId = 5L)
    w.write(row("live", 7L))
    sw.commit(5L, Array(w.commit()))
    val back = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(back == Seq(("live", 7L)),
      s"dead attempt's unmarked file leaked into the table: $back")
  }

  test("streaming sink: distinct epochs append; abort sweeps only its " +
      "own staging") {
    val dir = freshDir()
    val (sw, wf) = streamingPair(dir, "run3")
    val w1 = wf.createWriter(0, 30L, epochId = 1L)
    w1.write(row("e1", 1L))
    sw.commit(1L, Array(w1.commit()))
    val w2 = wf.createWriter(0, 31L, epochId = 2L)
    w2.write(row("e2", 2L))
    sw.commit(2L, Array(w2.commit()))
    // epoch 3 aborts: nothing lands, earlier epochs untouched
    val w3 = wf.createWriter(0, 32L, epochId = 3L)
    w3.write(row("e3", 3L))
    w3.commit()
    sw.abort(3L, Array.empty)
    val back = spark.read.format(fmt).load(dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(back == Seq(("e1", 1L), ("e2", 2L)),
      s"epoch append/abort broke the table: $back")
  }

  test("streaming sink in COMPLETE mode: each epoch truncates — the " +
      "table holds exactly the final aggregate") {
    import spark.implicits._
    val in = Files.createTempDirectory("kvsink-complete-in").toString
    val out = freshDir()
    val ckpt = Files.createTempDirectory("kvsink-complete-ck").toString
    def ingest(name: String, rows: Seq[(String, Long)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        rows.map { case (k, v) => s"$k\t$v" }
          .mkString("", "\n", "\n").getBytes("UTF-8"))
    val q = graft.streaming.StreamingOps.withStreamShuffle(spark) {
      spark.readStream.format(fmt).load(in)
        .groupBy(col("key"))
        .agg(sum(col("value")).as("value"))
        .writeStream.format(fmt)
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .start(out)
    }
    try {
      ingest("b0001.txt", Seq(("a", 1L), ("b", 2L)))
      q.processAllAvailable()
      ingest("b0002.txt", Seq(("a", 10L), ("c", 5L)))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format(fmt).load(out)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    // complete mode: ONLY the final aggregate — epoch 0's rows must have
    // been truncated away, not appended under a second epoch prefix
    assert(back == Seq(("a", 11L), ("b", 2L), ("c", 5L)),
      s"complete-mode epochs appended instead of truncating: $back")
  }

  test("null rows are rejected at the write boundary") {
    val dir = freshDir()
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(("a", 1L)).toDF("key", "value")
        .select(lit(null).cast("string").as("key"), col("value"))
        .write.format(fmt).mode("overwrite").save(dir)
    }
    assert(err.getMessage != null)
  }
}
