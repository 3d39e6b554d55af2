package graft

/** Partition-count invariance for the similarity family — the moving parts
  * here are the TopKPairsAggregator partial/merge order (different partition
  * counts split the buffers differently), the driver-side k-means fit over a
  * collected sample (collect order varies with partitioning), and the
  * grid-block replication of sim_neardup (SURVEY §5 parallelism-sweep axiom).
  */
class SimInvarianceSpec extends SparkTestBase {

  private def run(name: String, parts: String): Seq[String] =
    withShufflePartitions(parts) {
      SparkEntry.queries(name)(spark, sf).collect().toSeq.map(_.toString)
    }

  for (q <- Seq("sim_topk", "sim_ann_ivf", "sim_filtered_ann", "sim_lsh",
      "sim_lsh_multi", "sim_neardup", "sim_semdedup", "sim_pq", "sim_gram",
      "sim_project")) {
    test(s"$q: identical results under shuffle partitions 1 vs 8") {
      assert(run(q, "1") == run(q, "8"), s"$q not partition-invariant")
    }
  }

  // r21 (r20 verdict item 2): the driver-side training sample must be
  // SELF-bounding — a proportional 1/sampleMod collect grows with the
  // corpus; past the cap the effective modulus widens deterministically.
  test("collectSample: driver sample stays bounded under doubled input") {
    import SparkTestBase.spark.implicits._
    import graft.operators.SimilarityOps
    def corpus(n: Int) = (0L until n.toLong)
      .map(i => (i, Array(i, i + 1))).toDF("vec_id", "iv")
    val (mod, seedBound) = (4, 16)
    val saved = SimilarityOps.maxSampleRows
    try {
      SimilarityOps.maxSampleRows = 8L
      val s1 = SimilarityOps.collectSample(corpus(400), mod, seedBound)
      val s2 = SimilarityOps.collectSample(corpus(800), mod, seedBound)
      // bounded: ≤ cap + the always-kept seeds, and NOT growing with n
      val seedCount = seedBound / mod
      assert(s1.length <= 8 + seedCount, s"uncapped at n=400: ${s1.length}")
      assert(s2.length <= 8 + seedCount, s"uncapped at n=800: ${s2.length}")
      // every seed id (< seedBound, ≡0 mod sampleMod) survives the stride
      for (s <- Seq(s1, s2); id <- 0 until seedBound by mod)
        assert(s.exists(_._1 == id), s"seed $id dropped from capped sample")
      // partitioning-invariant (the stride is a pure function of vec_id)
      val s1b = SimilarityOps.collectSample(
        corpus(400).repartition(7), mod, seedBound)
      assert(s1.map(_._1).toSeq == s1b.map(_._1).toSeq,
        "capped sample not partition-invariant")
    } finally SimilarityOps.maxSampleRows = saved
    // below the cap the sample is bit-identical to the uncapped form the
    // oracles replay: stride = 1, every vec_id % sampleMod == 0 row kept
    val full = SimilarityOps.collectSample(corpus(400), mod, seedBound)
    assert(full.map(_._1).toSeq == (0L until 400L by mod.toLong).toSeq,
      "stride must be 1 below the cap — oracle-replayed sample changed")
  }
}
