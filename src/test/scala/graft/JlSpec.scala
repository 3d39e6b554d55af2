package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** JL random projection: exactness vs an in-memory matrix multiply, and the
  * distance-concentration property the reduction exists for (normalized
  * distortion ratios cluster near 1; wide bounds — the assertion catches a
  * broken projection, which scatters ratios by orders of magnitude). */
class JlSpec extends SparkTestBase {

  test("projection equals the in-memory matrix multiply (integer-exact)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val mat: Seq[Seq[Long]] =
      Seq.fill(4)(Seq.fill(9)((rng.nextInt(3) - 1).toLong))
    val vecs = Seq.tabulate(25)(i =>
      (i.toLong, Seq.fill(9)((rng.nextInt(2001) - 1000).toLong)))
    val df = vecs.toDF("vec_id", "iv")
    val got = SimilarityOps.randomProject(df, mat)
      .select(col("vec_id"), col("pv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    vecs.foreach { case (id, iv) =>
      val expect = mat.map(row => row.zip(iv).map { case (a, b) => a * b }.sum)
      assert(got(id) == expect, s"vec $id")
    }
  }

  test("fixture distortion ratios concentrate near 1") {
    val rows = SparkEntry.queries("sim_project")(spark, sf)
      .select(col("ratio")).collect().map(_.getDouble(0))
    assert(rows.length > 100)
    val mean = rows.sum / rows.length
    assert(mean > 0.6 && mean < 1.5, s"mean ratio drifted: $mean")
    val within = rows.count(r => r > 0.2 && r < 3.0).toDouble / rows.length
    assert(within > 0.9, s"only ${within * 100}%% of ratios in [0.2, 3]")
  }
}
