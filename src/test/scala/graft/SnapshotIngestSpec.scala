package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{SnapshotTable => ST}

/** Streaming ingest into the snapshot table (SnapshotTable.ingestBatch):
  * exactly-once TABLE CONTENTS across kill/restart with the same
  * checkpoint (write-once epoch dirs + head-contains commit dedup), the
  * re-delivery no-op, the OCC fold onto a concurrent committer's head,
  * and bounds threading into pruned reads. */
class SnapshotIngestSpec extends SparkTestBase {

  private def freshRoot(): String =
    Files.createTempDirectory("snapingest").toString

  /** Stage `rows` as ONE visible parquet file named `name` in `in` —
    * write to a scratch dir, move the single part file in (the file
    * source must never list a half-copied file). */
  private def stage(in: String, name: String, from: Long,
      until: Long): Unit = {
    import spark.implicits._
    val scratch = Files.createTempDirectory("stage").toString
    (from until until).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath,
      new java.io.File(in, s"$name.parquet").toPath): Unit
  }

  private val kSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "`k` BIGINT")

  /** One AvailableNow drain of `in` through ingestBatch — each run is a
    * fresh query against the SAME checkpoint, i.e. a restart. */
  private def drain(in: String, cp: String, base: String): Unit =
    graft.streaming.StreamingOps.withStreamShuffle(spark) {
      val q = spark.readStream.schema(kSchema).parquet(in)
        .writeStream.option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          ST.ingestBatch(spark, base, b, id): Unit
        }.start()
      try q.awaitTermination() finally q.stop()
    }

  test("kill/restart with the same checkpoint folds each batch exactly " +
      "once; an empty restart is a no-op") {
    val root = freshRoot()
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val base = s"$root/tbl"; new java.io.File(base).mkdirs()
    val cp = s"$root/cp"
    stage(in, "a", 0, 10)
    drain(in, cp, base) // batch 0
    assert(ST.headVersion(spark, base) == 1)
    assert(ST.readVersion(spark, base, 1, "k").count() == 10)
    // "kill": the first query object is gone; a new one on the SAME
    // checkpoint must resume after batch 0, seeing only the new file
    stage(in, "b", 10, 25)
    drain(in, cp, base) // batch 1
    assert(ST.headVersion(spark, base) == 2,
      "the restarted stream must continue the epoch sequence, not replay")
    val head = ST.readVersion(spark, base, 2, "k")
    assert(head.count() == 25 &&
      head.select(countDistinct(col("k"))).head.getLong(0) == 25,
      "restart must yield exactly-once contents — no loss, no doubling")
    // nothing new staged: a further restart commits nothing
    drain(in, cp, base)
    assert(ST.headVersion(spark, base) == 2,
      "a restart with no new input must not mint versions")
    // every ingested epoch carried its row count — the head answers
    // COUNT(*) from metadata alone
    assert(ST.countRows(spark, base, 2).contains(25L),
      "ingested epochs must thread row counts into the manifest")
  }

  test("re-delivered epoch no-ops; a lost version race folds onto the " +
      "winner's head") {
    import spark.implicits._
    val root = freshRoot()
    val base = s"$root/tbl"; new java.io.File(base).mkdirs()
    val b0 = (0L until 5L).toDF("k")
    assert(ST.ingestBatch(spark, base, b0, 0L) == 1)
    // Spark re-delivers the last unacknowledged batch after a crash:
    // same batchId, same rows — both legs must no-op
    assert(ST.ingestBatch(spark, base, b0, 0L) == 1)
    assert(ST.headVersion(spark, base) == 1 &&
      ST.readVersion(spark, base, 1, "k").count() == 5)
    // a CONCURRENT committer (compaction, another stream) takes v2 out
    // from under the ingester; the next batch must land on top of the
    // winner's head, not clobber or fail
    val other = s"$root/other"
    (100L until 103L).toDF("k").write.parquet(other)
    val v1 = ST.manifest(spark, base, 1)
    ST.commit(spark, base, 2, v1.copy(dataDirs = v1.dataDirs :+ other))
    assert(ST.ingestBatch(spark, base, (5L until 9L).toDF("k"), 1L) == 3)
    assert(ST.readVersion(spark, base, 3, "k").count() == 5 + 3 + 4)
  }

  test("ingested versions feed the CDF consumer side: each epoch is one " +
      "O(delta) all-inserts change window") {
    import spark.implicits._
    val root = freshRoot()
    val base = s"$root/tbl"; new java.io.File(base).mkdirs()
    assert(ST.ingestBatch(spark, base, (0L until 5L).toDF("k"), 0L) == 1)
    assert(ST.ingestBatch(spark, base, (5L until 12L).toDF("k"), 1L) == 2)
    // the window between consecutive ingested versions is exactly that
    // batch's rows, all inserts — the contract the CDC stream's consumer
    // (q_stream_snapshot_cdf) folds on
    val w = ST.readChanges(spark, base, 1, 2, "k")
    assert(w.where(col("change") === "insert").count() == 7 &&
      w.where(col("change") =!= "insert").count() == 0)
    assert(w.agg(min(col("k")), max(col("k"))).head match {
      case r => r.getLong(0) == 5L && r.getLong(1) == 11L
    })
  }

  test("statsCol threads per-epoch bounds into pruned reads") {
    import spark.implicits._
    val root = freshRoot()
    val base = s"$root/tbl"; new java.io.File(base).mkdirs()
    assert(ST.ingestBatch(spark, base, (0L until 100L).toDF("k"), 0L,
      statsCol = Some("k")) == 1)
    assert(ST.ingestBatch(spark, base, (1000L until 1100L).toDF("k"), 1L,
      statsCol = Some("k")) == 2)
    val (df, rep) = ST.readVersionPruned(spark, base, 2, "k", "k",
      "1050", "1060")
    assert(rep == ST.PruneReport(1, 2),
      s"a ranged read must prune the out-of-range epoch, got $rep")
    assert(df.where(col("k").between(1050, 1060)).count() == 11)
  }
}
