package graft

import graft.functions.Portable.intVec
import org.apache.spark.sql.functions._

/** Trained-IVF quality: the centroids are a real k-means fit (not the seeds)
  * and the probe search keeps useful recall vs the exact brute-force top-k.
  *
  * Bounds are pinned from measurement on the fixture (mean recall 0.76, min
  * 0.6 at nProbe=4 of 16 cells) with generous margin — the assertion exists
  * to catch a broken training/assignment path (recall collapsing toward the
  * ~nProbe/cells floor of a random partition), not to freeze the exact value.
  */
class IvfRecallSpec extends SparkTestBase {

  private def topkSets(q: String): Map[Long, Set[Long]] =
    SparkEntry.queries(q)(spark, sf)
      .select(col("qid"), col("nbr_id"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }

  test("k-means training moves the seed centroids and keeps all 16 cells") {
    val v = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), intVec(col("embedding")).as("iv"))
    val cents = graft.queries.SimilarityQueries.trainCentroids(v).toMap
    assert(cents.size == 16, s"expected 16 centroids, got ${cents.size}")
    val seeds = v.where(col("vec_id") < 64 && pmod(col("vec_id"), lit(4)) === 0)
      .collect()
      .map(r => ((r.getLong(0) / 4).toInt, r.getSeq[Long](1).toSeq))
      .toMap
    assert(cents.keySet == seeds.keySet)
    val moved = cents.count { case (cid, civ) => civ != seeds(cid) }
    assert(moved >= 8, s"training barely moved the seeds ($moved/16 changed)")
  }

  test("OR-amplified LSH recall dominates the single-table recall") {
    val exact = topkSets("sim_topk")
    val single = topkSets("sim_lsh")
    val multi = topkSets("sim_lsh_multi")
    def recall(ann: Map[Long, Set[Long]]): Double =
      exact.map { case (q, e) =>
        ann.getOrElse(q, Set.empty).intersect(e).size.toDouble / e.size
      }.sum / exact.size
    val (rs, rm) = (recall(single), recall(multi))
    assert(rm >= rs, s"second table LOST recall: single=$rs multi=$rm")
    assert(rm > 0.3, s"multi-table recall collapsed: $rm")
  }

  test("IVF probe search keeps recall vs exact brute-force top-k") {
    val exact = topkSets("sim_topk")
    val ivf = topkSets("sim_ann_ivf")
    assert(exact.keySet.size == 10 && ivf.keySet == exact.keySet)
    val recalls = exact.map { case (q, e) =>
      ivf(q).intersect(e).size.toDouble / e.size.toDouble
    }.toSeq
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean IVF recall collapsed: $mean ($recalls)")
    assert(recalls.min >= 0.2, s"a query lost nearly all recall: $recalls")
  }
}
