package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Epoch-dir compaction of the streaming LSH index (the r12 scale-killer:
  * every micro-batch added two epoch dirs that every later probe re-read in
  * full). Pins three contracts: compaction changes NOTHING about the emitted
  * pair set; post-compaction probes physically read the consolidated base
  * plus only the epochs above it (never the folded dirs); and a foreachBatch
  * REPLAY of an already-compacted epoch is idempotent (the crash-recovery
  * story of the exactly-once claim).
  */
class LshIndexSpec extends SparkTestBase {

  private def docs: DataFrame =
    Tables(spark, sf, "documents").select(col("doc_id"), col("text"))

  /** doc_id cut points splitting the corpus into `n` ingest batches. */
  private def cuts(n: Int): Seq[Long] =
    (1 until n).map { i =>
      docs.selectExpr(
        s"CAST(percentile_cont(${i.toDouble / n}) WITHIN GROUP " +
          "(ORDER BY doc_id) AS BIGINT)").head().getLong(0)
    }

  private def batches(n: Int): Seq[DataFrame] = {
    val cs = Long.MinValue +: cuts(n) :+ Long.MaxValue
    cs.sliding(2).map { case Seq(lo, hi) =>
      docs.where(col("doc_id") > lo && col("doc_id") <= hi)
    }.toSeq
  }

  private def pairs(outDir: String): Set[(Long, Long)] =
    spark.read.parquet(outDir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("mid-stream compaction folds epochs into a base and the probe " +
      "reads only base + recent epochs") {
    val tmp = Files.createTempDirectory("graft-lsh-compact").toString
    val st = s"$tmp/state"
    val bs = batches(3)
    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(0), 0L, compactEvery = 2)
    assert(DedupQueries.LshIndex.baseUpto(spark, st).isEmpty,
      "one epoch must not trigger a compactEvery=2 consolidation")
    assert(DedupQueries.LshIndex.liveEpochs(spark, st) == Seq(0L))

    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(1), 1L, compactEvery = 2)
    assert(DedupQueries.LshIndex.baseUpto(spark, st).contains(1L),
      "two live epochs must fold into base upto=1")
    assert(DedupQueries.LshIndex.liveEpochs(spark, st).isEmpty,
      "folded epoch dirs must no longer count as live")
    // the folded inputs are physically gone, not merely ignored
    for (sub <- Seq("sh", "bands"); e <- Seq(0, 1))
      assert(!new java.io.File(s"$st/$sub/epoch=$e").exists,
        s"$sub/epoch=$e should be deleted after folding")

    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(2), 2L, compactEvery = 2)
    // the third batch's probe read the CONSOLIDATED index: every input
    // file of the probe view lives under the base generation or the one
    // live epoch above it
    for (sub <- Seq("sh", "bands")) {
      val files = DedupQueries.LshIndex.read(spark, st, sub).inputFiles
      assert(files.nonEmpty)
      files.foreach { f =>
        assert(f.contains(s"${sub}_base/upto=1") ||
          f.contains(s"$sub/epoch=2"),
          s"probe read an unexpected path: $f")
      }
    }

    // compaction is invisible in the OUTPUT: the union over epochs equals
    // the never-compacted run's union on the identical batch sequence
    val tmp2 = Files.createTempDirectory("graft-lsh-nocompact").toString
    bs.zipWithIndex.foreach { case (b, i) =>
      DedupQueries.lshIngestBatch(s"$tmp2/state", s"$tmp2/out", b, i.toLong,
        compactEvery = Int.MaxValue)
    }
    assert(pairs(s"$tmp/out") == pairs(s"$tmp2/out"))
    assert(pairs(s"$tmp/out").nonEmpty,
      "fixture should contain near-dup pairs or the equality is vacuous")
  }

  test("replaying an already-compacted epoch is idempotent (foreachBatch " +
      "crash-recovery contract)") {
    val tmp = Files.createTempDirectory("graft-lsh-replay").toString
    val st = s"$tmp/state"
    val bs = batches(2)
    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(0), 0L, compactEvery = 2)
    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(1), 1L, compactEvery = 2)
    assert(DedupQueries.LshIndex.baseUpto(spark, st).contains(1L))
    val before = pairs(s"$tmp/out")
    val epoch1Before = pairs(s"$tmp/out/epoch=1")

    // the crash window: epoch 1's compaction committed but the streaming
    // checkpoint did not — on restart foreachBatch re-delivers epoch 1
    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(1), 1L, compactEvery = 2)
    assert(pairs(s"$tmp/out/epoch=1") == epoch1Before,
      "replay must re-emit the identical epoch pair set")
    assert(pairs(s"$tmp/out") == before)
    assert(DedupQueries.LshIndex.baseUpto(spark, st).contains(1L),
      "replay must not regress or advance the base generation")
    assert(DedupQueries.LshIndex.liveEpochs(spark, st).isEmpty,
      "the replayed epoch dir sits below the cut and must stay non-live")
  }
}
