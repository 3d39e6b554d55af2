package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Morton/Z-order layout properties: the SQL template against a bit-level
  * Scala model, the box-nesting locality guarantee, and disjoint per-file
  * key ranges from the writer. */
class LayoutSpec extends SparkTestBase {

  private def mortonModel(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zSql template matches the bit-interleave model") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val pts = Seq.fill(200)((rng.nextLong(1L << 21), rng.nextLong(1L << 21))) ++
      Seq((0L, 0L), ((1L << 21) - 1, (1L << 21) - 1), (0L, (1L << 21) - 1))
    val got = Layout.withZ(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == mortonModel(x, y), s"($x, $y)")
    }
  }

  private def morton3Model(x: Long, y: Long, z: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 21) {
      out |= ((x >> i) & 1L) << (3 * i)
      out |= ((y >> i) & 1L) << (3 * i + 1)
      out |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    out
  }

  test("zSql3 template matches the 3-D bit-interleave model (ANSI-safe: " +
      "every intermediate stays under 2^63)") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val lim = (1L << 21) - 1
    val pts = Seq.fill(300)(
      (rng.nextLong(1L << 21), rng.nextLong(1L << 21),
        rng.nextLong(1L << 21))) ++
      Seq((0L, 0L, 0L), (lim, lim, lim), (0L, lim, 0L), (lim, 0L, lim))
    val got = Layout.withZ3(pts.toDF("x", "y", "w"), "x", "y", "w")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (x, y, w, zv) =>
      assert(zv == morton3Model(x, y, w), s"($x, $y, $w)")
      assert(zv >= 0, s"3-D key must stay positive: ($x, $y, $w)")
    }
    // domain guard raises, same as the 2-D form
    intercept[Exception] {
      Layout.withZ3(Seq((-1L, 0L, 0L)).toDF("x", "y", "w"), "x", "y", "w")
        .collect()
    }
  }

  test("equal z-bucket at shift 2k pins both coordinates to one 2^k box") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val pts = Seq.fill(500)((rng.nextLong(1L << 16), rng.nextLong(1L << 16)))
    val k = 5
    val rows = Layout.withZ(pts.toDF("x", "y"), "x", "y")
      .select(col("x"), col("y"), shiftright(col("zv"), 2 * k).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._3).values.foreach { grp =>
      assert(grp.map(_._1 >> k).distinct.size == 1)
      assert(grp.map(_._2 >> k).distinct.size == 1)
    }
  }

  test("zorderWrite produces files with disjoint Morton ranges") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val pts = Seq.fill(2000)((rng.nextLong(1L << 12), rng.nextLong(1L << 12)))
    val path = "/root/repo/target/tmp/zorder-spec"
    Layout.zorderWrite(pts.toDF("x", "y"), "x", "y", path, nFiles = 8)
    val ranges = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("zv")).as("lo"), max(col("zv")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("globalOrdinals: ranks match an in-memory sort, any partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // duplicate hash keys force the tiebreak column to carry the order
    val rows = Seq.fill(300)((rng.nextInt(40).toLong, rng.nextLong()))
      .zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
    val expect = rows.sortBy(r => (r._1, r._2)).map(r => (r._2, r._1))
      .zipWithIndex.map { case ((id, k), pos) => id -> pos.toLong }.toMap
    for (parts <- Seq(1, 7)) {
      val got = Layout.globalOrdinals(
          rows.toDF("k", "id", "v").repartition(parts),
          Seq(col("k"), col("id")))
        .select(col("id"), col("pos"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }
}
