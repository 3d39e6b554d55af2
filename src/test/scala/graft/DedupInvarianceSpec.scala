package graft

/** Partition-count invariance for the dedup pipelines — guards the moving
  * parts a refactor could silently break: zipWithIndex dictionary ids, the
  * pair distinct, LSH banding, typed flatMap extraction (SURVEY §5
  * parallelism-sweep axiom applied to the heaviest operators). */
class DedupInvarianceSpec extends SparkTestBase {

  private def run(name: String, parts: String): Seq[String] =
    withShufflePartitions(parts) {
      SparkEntry.queries(name)(spark, sf).collect().toSeq.map(_.toString)
    }

  for (q <- Seq("dedup_exact", "dedup_ngram", "dedup_minhash", "dedup_simhash",
    "dedup_substring", "dedup_incremental", "dedup_cluster_star",
    "dedup_editdist")) {
    test(s"$q: identical results under shuffle partitions 1 vs 8") {
      assert(run(q, "1") == run(q, "8"), s"$q not partition-invariant")
    }
  }
}
