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

  test("q_split_leakage: no near-dup pair straddles the train/holdout " +
      "split; every doc is assigned exactly once") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    val pairs = graft.queries.DedupQueries
      .simhashJoin(docs.select(col("doc_id"), col("text")))
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    assert(pairs.count() > 0, "fixture lost its near-dup pairs")
    val cc = graft.operators.GraphOps.connectedComponents(pairs)
    val labeled = docs.join(cc, docs("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster_id"))
    val split = graft.operators.TextOps
      .hashSplit(labeled, "cluster_id", nBuckets = 10, trainBuckets = 8)
      .select(col("doc_id"), col("split")).localCheckpoint()
    // exactly one split per doc
    assert(split.count() == docs.count())
    // the leakage witness: pairs whose endpoints disagree on split
    val a = split.select(col("doc_id").as("doc_a"), col("split").as("sa"))
    val b = split.select(col("doc_id").as("doc_b"), col("split").as("sb"))
    val straddling = pairs.join(a, "doc_a").join(b, "doc_b")
      .where(col("sa") =!= col("sb")).count()
    assert(straddling == 0L, s"$straddling near-dup pairs straddle the split")
    // and the gated query's totals cover the whole corpus
    val out = SparkEntry.queries("q_split_leakage")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == docs.count())
  }
}
