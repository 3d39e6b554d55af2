package graft

import graft.functions.Portable.intVec
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Product-quantization quality and exactness pins.
  *
  * The load-bearing property is ADC linearity: the LUT-summed score MUST
  * equal ⟨q, reconstruction(x)⟩ exactly in integer arithmetic — any drift
  * there (wrong subspace offsets, off-by-one code indexing) silently
  * degrades recall in a way the recall floor alone might not catch.
  * Recall bounds are pinned from fixture measurement with wide margin,
  * guarding against a collapsed codebook (recall ~0), not the exact value.
  */
class PqSpec extends SparkTestBase {

  private lazy val v = SimilarityOps.encode(
    Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")))
  private lazy val books = graft.queries.SimilarityQueries.trainPq(v)
  private lazy val codes = SimilarityOps.pqEncode(v, books)

  test("codebooks: 16 subspaces x 16 codewords x 4 dims, training moved seeds") {
    assert(books.length == 16)
    books.foreach { b =>
      assert(b.length == 16, s"codebook has ${b.length} codewords")
      b.foreach(cw => assert(cw.length == 4))
    }
    // at least half the subspace codebooks differ from their raw seeds
    val seeds = v.where(col("vec_id") < 64 && pmod(col("vec_id"), lit(4)) === 0)
      .orderBy("vec_id").collect().map(_.getSeq[Long](2).toArray)
    val moved = books.indices.count { s =>
      books(s).zipWithIndex.exists { case (cw, c) =>
        cw != seeds(c).slice(s * 4, s * 4 + 4).toSeq
      }
    }
    assert(moved >= 8, s"PQ training barely moved the seeds ($moved/16 subspaces)")
  }

  test("codes are dense in [0,16) and pnrm is the exact reconstruction norm") {
    val rows = codes.collect()
    assert(rows.length == v.count())
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 16)
      cs.foreach(c => assert(c >= 0 && c < 16))
      val pn = cs.zipWithIndex.map { case (c, s) =>
        books(s)(c).map(x => x * x).sum
      }.sum
      assert(pn == r.getLong(2), s"pnrm mismatch for vec ${r.getLong(0)}")
    }
  }

  test("ADC score equals the exact dot with the reconstruction (linearity)") {
    val queries = SimilarityOps.asQueries(v.where(col("vec_id") < 10))
    val qrows: Map[Long, (Array[Long], Long)] = queries.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1).toArray, r.getLong(2)))
      .toMap
    val codeMap = codes.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1).toArray, r.getLong(2))).toMap
    val adc = SimilarityOps.pqTopK(codes, queries, books, 5).collect()
    assert(adc.nonEmpty)
    adc.foreach { r =>
      val (qid, nbr, cos) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val (qiv, qnrm) = qrows(qid)
      val (cs, pn) = codeMap(nbr)
      val recon: Array[Long] =
        cs.zipWithIndex.flatMap { case (c, s) => books(s)(c) }
      var dot = 0L
      recon.indices.foreach(i => dot += qiv(i) * recon(i))
      val expect = dot.toDouble / math.sqrt(qnrm.toDouble * pn.toDouble)
      assert(cos == expect, s"ADC drift at ($qid,$nbr): $cos vs $expect")
    }
  }

  test("PQ recall@5 vs brute force stays above the floor") {
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("nbr_id")).collect()
        .groupBy(_.getLong(0))
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val queries = SimilarityOps.asQueries(v.where(col("vec_id") < 10))
    val exact = sets(SimilarityOps.bruteForceTopK(v, queries, 5))
    Seq(5, 25, 50, 100).foreach { c =>
      val pq = sets(SimilarityOps.pqTopK(codes, queries, books, c))
      val recalls = exact.map { case (q, e) =>
        pq.getOrElse(q, Set.empty).intersect(e).size.toDouble / e.size
      }.toSeq
      info(f"PQ shortlist@$c recall of exact top-5: " +
        f"min=${recalls.min}%.2f mean=${recalls.sum / recalls.size}%.2f")
    }
    // the gated two-stage form: shortlist 10·k via ADC, exact re-rank
    val pq = sets(SimilarityOps.pqSearch(v, codes, queries, books, 5, 50))
    pq.values.foreach(s => assert(s.size == 5))
    val minR = exact.map { case (q, e) =>
      pq.getOrElse(q, Set.empty).intersect(e).size.toDouble / e.size
    }.min
    assert(minR >= 0.4, s"PQ min recall collapsed: $minR")
  }
}
