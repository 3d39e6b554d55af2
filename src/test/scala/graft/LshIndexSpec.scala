package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Size-tiered compaction of the streaming LSH index (r13 verdict: the
  * previous shape rewrote the ENTIRE accumulated base on every fold —
  * O(N²/K) lifetime write I/O under sustained ingest). Pins four
  * contracts: an epoch fold reads/writes ONLY the epochs it folds (the
  * existing generations are physically untouched); `every` adjacent
  * same-tier generations merge into one of the next tier and their inputs
  * are swept; compaction changes NOTHING about the emitted pair set; and a
  * foreachBatch REPLAY of an already-compacted epoch is idempotent (the
  * crash-recovery story of the exactly-once claim).
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

  /** (name, length, mtime) of every file under `dir` — a physical
    * untouched-ness witness. */
  private def dirSig(dir: String): Set[(String, Long, Long)] = {
    val f = new java.io.File(dir)
    assert(f.isDirectory, s"$dir should exist")
    f.listFiles().map(x => (x.getName, x.length, x.lastModified)).toSet
  }

  test("mid-stream compaction folds epochs into a generation and the " +
      "probe reads only generations + recent epochs") {
    val tmp = Files.createTempDirectory("graft-lsh-compact").toString
    val st = s"$tmp/state"
    val bs = batches(3)
    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(0), 0L, compactEvery = 2)
    assert(DedupQueries.LshIndex.baseUpto(spark, st).isEmpty,
      "one epoch must not trigger a compactEvery=2 consolidation")
    assert(DedupQueries.LshIndex.liveEpochs(spark, st) == Seq(0L))

    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(1), 1L, compactEvery = 2)
    assert(DedupQueries.LshIndex.baseUpto(spark, st).contains(1L),
      "two live epochs must fold into generation r=0-1")
    assert(DedupQueries.LshIndex.activeRanges(spark, st) == Seq((0L, 1L)))
    assert(DedupQueries.LshIndex.liveEpochs(spark, st).isEmpty,
      "folded epoch dirs must no longer count as live")
    // the folded inputs are physically gone, not merely ignored
    for (sub <- Seq("sh", "bands"); e <- Seq(0, 1))
      assert(!new java.io.File(s"$st/$sub/epoch=$e").exists,
        s"$sub/epoch=$e should be deleted after folding")

    DedupQueries.lshIngestBatch(st, s"$tmp/out", bs(2), 2L, compactEvery = 2)
    // the third batch's probe read the CONSOLIDATED index: every input
    // file of the probe view lives under a generation or the one live
    // epoch above the cut
    for (sub <- Seq("sh", "bands")) {
      val files = DedupQueries.LshIndex.read(spark, st, sub).inputFiles
      assert(files.nonEmpty)
      files.foreach { f =>
        assert(f.contains(s"${sub}_gen/r=0-1") ||
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

  test("epoch folds never touch existing generations; `every` adjacent " +
      "same-tier generations merge size-tiered and their inputs sweep") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lsh-tiered").toString
    val st = s"$tmp/state"
    // drive the compactor directly with tiny epoch dirs: the machinery
    // reads/writes parquet dirs, content-agnostic
    def put(e: Long): Unit = for (sub <- Seq("sh", "bands"))
      Seq((e, sub)).toDF("epoch", "sub")
        .write.parquet(s"$st/$sub/epoch=$e")
    def compact(): Unit =
      DedupQueries.LshIndex.maybeCompact(spark, st, every = 3)
    def active = DedupQueries.LshIndex.activeRanges(spark, st)

    (0L to 2L).foreach(put); compact()
    assert(active == Seq((0L, 2L)))
    val sig = Seq("sh", "bands").map(s2 => dirSig(s"$st/${s2}_gen/r=0-2"))

    (3L to 5L).foreach(put); compact()
    assert(active == Seq((0L, 2L), (3L, 5L)),
      "a second tier-1 fold must NOT merge (only 2 of 3 needed)")
    // the load-bearing bound: the second fold's writes are its OWN epoch
    // inputs — the existing generation's files are byte-identical and
    // untouched (the r13 shape rewrote them every fold)
    assert(Seq("sh", "bands").map(s2 => dirSig(s"$st/${s2}_gen/r=0-2"))
      == sig, "an epoch fold rewrote a generation it did not fold")

    (6L to 8L).foreach(put); compact()
    assert(active == Seq((0L, 8L)),
      "three adjacent tier-1 generations must merge into one tier-2")
    for (sub <- Seq("sh", "bands"); r <- Seq("0-2", "3-5", "6-8"))
      assert(!new java.io.File(s"$st/${sub}_gen/r=$r").exists,
        s"superseded generation r=$r should be swept")
    // nothing lost, nothing doubled across the whole cascade
    assert(DedupQueries.LshIndex.read(spark, st, "sh")
      .select(col("epoch")).as[Long].collect().sorted.toSeq
      == (0L to 8L))
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
      "replay must not regress or advance the covered cut")
    assert(DedupQueries.LshIndex.liveEpochs(spark, st).isEmpty,
      "the replayed epoch dir sits below the cut and must stay non-live")
  }

  test("a crash between the two sub-index writes leaves the previous " +
      "active set in force (joint gate)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lsh-crash").toString
    val st = s"$tmp/state"
    def put(e: Long): Unit = for (sub <- Seq("sh", "bands"))
      Seq((e, sub)).toDF("epoch", "sub")
        .write.parquet(s"$st/$sub/epoch=$e")
    (0L to 1L).foreach(put)
    DedupQueries.LshIndex.maybeCompact(spark, st, every = 2)
    assert(DedupQueries.LshIndex.activeRanges(spark, st) == Seq((0L, 1L)))
    // simulate the crash: a later fold committed in sh only
    (2L to 3L).foreach(put)
    Seq((99L, "x")).toDF("epoch", "sub").write.parquet(s"$st/sh_gen/r=2-3")
    assert(DedupQueries.LshIndex.activeRanges(spark, st) == Seq((0L, 1L)),
      "a single-sub generation must not activate")
    assert(DedupQueries.LshIndex.liveEpochs(spark, st) == Seq(2L, 3L),
      "epochs above the joint cut stay live through the crash window")
    // the next compaction redoes BOTH dirs and recovers
    DedupQueries.LshIndex.maybeCompact(spark, st, every = 2)
    assert(DedupQueries.LshIndex.activeRanges(spark, st) == Seq((0L, 3L)))
    assert(DedupQueries.LshIndex.read(spark, st, "sh")
      .select(col("epoch")).as[Long].collect().sorted.toSeq
      == (0L to 3L), "the recovered index must hold exactly the epochs")
  }
}
