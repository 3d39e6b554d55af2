package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.PackDoc

/** Streaming token packer (StreamingOps.packOffsets): per-shard offsets
  * carried across micro-batches in keyed state. Covers cross-batch and
  * cross-RESTART state carry (the checkpoint owns the offsets), exact
  * offset assignment within and across shards, and the loud
  * ordered-arrival contract violation. */
class PackStreamSpec extends SparkTestBase {

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "`shard` INT, `doc_id` BIGINT, `n` BIGINT")

  private def stage(in: String, name: String, mtime: Long,
      rows: Seq[(Int, Long, Long)]): Unit = {
    import spark.implicits._
    val scratch = Files.createTempDirectory("packstage").toString
    rows.toDF("shard", "doc_id", "n").coalesce(1)
      .write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(in, s"$name.parquet")
    Files.move(part.toPath, dst.toPath)
    assert(dst.setLastModified(mtime))
  }

  private def drain(in: String, cp: String, out: String): Unit =
    StreamingOps.withStreamShuffle(spark) {
      import spark.implicits._
      val q = StreamingOps.packOffsets(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(in).as[PackDoc])
        .writeStream.option("checkpointLocation", cp)
        .format("parquet").option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }

  private def offsets(out: String): Map[(Int, Long), Long] =
    spark.read.parquet(out).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("off")).toMap

  test("offsets accumulate per shard across batches AND across a " +
      "restart from the same checkpoint") {
    val root = Files.createTempDirectory("pack").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val (cp, out) = (s"$root/cp", s"$root/out")
    stage(in, "b0", 1000000L,
      Seq((0, 1L, 10L), (0, 2L, 5L), (1, 3L, 7L)))
    stage(in, "b1", 2000000L, Seq((0, 4L, 3L), (1, 5L, 2L)))
    drain(in, cp, out) // two micro-batches
    // "kill": new query, same checkpoint — state must resume, not reset
    stage(in, "b2", 3000000L, Seq((0, 6L, 1L), (1, 7L, 4L)))
    drain(in, cp, out)
    assert(offsets(out) == Map(
      (0, 1L) -> 0L, (0, 2L) -> 10L, (0, 4L) -> 15L, (0, 6L) -> 18L,
      (1, 3L) -> 0L, (1, 5L) -> 7L, (1, 7L) -> 9L))
    // a restart with no new input emits nothing new
    drain(in, cp, out)
    assert(spark.read.parquet(out).count() == 7)
  }

  test("an out-of-order batch fails the stream loudly — offsets never " +
      "silently shift") {
    val root = Files.createTempDirectory("pack").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val (cp, out) = (s"$root/cp", s"$root/out")
    stage(in, "b0", 1000000L, Seq((0, 10L, 5L)))
    drain(in, cp, out)
    stage(in, "b1", 2000000L, Seq((0, 4L, 3L))) // below the frontier
    val e = intercept[StreamingQueryException] {
      drain(in, cp, out)
    }
    assert(e.getMessage.contains("ordered-arrival") ||
      (e.getCause != null &&
        e.getCause.toString.contains("ordered-arrival")) ||
      e.toString.contains("ordered-arrival"), e.toString)
  }
}
