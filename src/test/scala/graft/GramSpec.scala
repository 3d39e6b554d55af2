package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Gram-matrix exactness: the distributed triangle accumulation must equal
  * the in-memory Xᵀ X for random integer corpora, under any partitioning
  * and any flush cadence (flushEvery=1 forces a drain per row — the
  * overflow-guard path; the index inversion in drain() is the fiddly bit
  * this pins). */
class GramSpec extends SparkTestBase {

  private def model(rows: Seq[Array[Long]], d: Int): Map[(Long, Long), BigInt] =
    (for { i <- 0 until d; j <- i until d } yield
      (i.toLong, j.toLong) ->
        rows.map(iv => BigInt(iv(i)) * BigInt(iv(j))).sum).toMap

  test("matches in-memory X^T X for random vectors, any flush/partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val d = 7
    val rows = Seq.fill(40)(Array.fill(d)((rng.nextInt(4001) - 2000).toLong))
    val df = rows.map(_.toSeq).toDF("iv")
    val expect = model(rows, d)
    for (flush <- Seq(1, 3, 1 << 20); parts <- Seq(1, 5)) {
      val got = SimilarityOps.gramMatrix(df.repartition(parts), flush)
        .collect()
        .map { r =>
          val g = r.getDouble(2)
          assert(g == math.rint(g) && math.abs(g) < (1L << 53).toDouble,
            s"gram value $g not an exactly-representable integer")
          (r.getLong(0), r.getLong(1)) -> BigInt(g.toLong)
        }
        .toMap
      assert(got == expect, s"flush=$flush parts=$parts")
    }
  }

  test("fixture gram diagonal equals the encoded norms' sum per dimension") {
    val v = SimilarityOps.encode(
      Tables(spark, sf, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding")))
    val g = SimilarityOps.gramMatrix(v).where(col("i") === col("j"))
      .agg(sum(col("gram").cast("decimal(38,0)"))).head().getDecimal(0)
    val n = v.agg(sum(col("nrm").cast("decimal(38,0)"))).head().getDecimal(0)
    assert(g.compareTo(n) == 0, s"trace(G)=$g vs sum(nrm)=$n")
  }
}
