package graft

/** Empirical scale guard: the only check for the "would survive 100×" claims
  * available inside the sandbox's three scale factors. Each of the heaviest
  * batch queries is timed at sf0.001 → sf0.01 → sf0.1 (10× data per step,
  * after an untimed warm-up run so JIT/codegen/layer builds don't land on the
  * first timing) and each decade step must grow wall-time by less than 25×:
  * linear scaling gives ≲10×, a quadratic regression gives ~100×, and the
  * 25× line splits them with headroom for scheduling noise at small SFs.
  *
  * Streaming gates are excluded (micro-batch scheduling dominates their time
  * and varies ±2× run-to-run — CLAUDE.md); sim_topk-style brute-force
  * baselines are excluded because they are *documented* quadratic controls.
  */
class ScalingSmokeSpec extends SparkTestBase {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  // the heaviest non-streaming, non-intentionally-quadratic queries from the
  // committed bench baseline (top20_slowest, BENCH r7)
  private val heavies = Seq("q_recursive_cte", "dedup_ngram", "dedup_editdist",
    "q_kcore", "q_pagerank", "q_label_prop", "dedup_cluster_star",
    "dedup_keep_best")

  private def time(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).collect(): Unit
    (System.nanoTime() - t0) / 1e9
  }

  for (q <- heavies) {
    test(s"$q: wall-time grows sub-quadratically across sf decades") {
      // untimed warm-up: builds write-once layers for every SF and pays the
      // one-time JIT for this query's operators
      sfs.foreach { d =>
        graft.queries.AdvancedQueries.warmGraphLayers(spark, d)
        time(q, d): Unit
      }
      val timed = sfs.map(d => d -> time(q, d))
      val ratios = timed.sliding(2).map {
        case Seq((_, a), (_, b)) => b / math.max(a, 0.05)
      }.toSeq
      val detail = timed.map { case (d, t) =>
        f"${d.split('/').last}=$t%.2fs"
      }.mkString(", ")
      assert(ratios.forall(_ < 25.0),
        f"$q decade-step growth ${ratios.map(r => f"$r%.1f×").mkString(", ")}" +
          s" exceeds the sub-quadratic line ($detail)")
    }
  }
}
