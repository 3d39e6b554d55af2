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
}
