package graft

import graft.functions.{ArrayExprs, TopKAggregator, TopKPairsAggregator}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized checks for the small pure kernels:
  * - TopKAggregator's buffer ops must form a commutative monoid over row
  *   batches (Spark may split/merge partial buffers in any order) and agree
  *   with the obvious sort-take model.
  * - The native array expressions must agree with plain Scala arithmetic
  *   over one bulk DataFrame of random rows (negatives, empties, unequal
  *   lengths included). */
class KernelPropertySpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n,
      for { s <- Gen.chooseNum(-50L, 50L); id <- Gen.chooseNum(0L, 30L) }
        yield (s, id)))

  private def byAgg(agg: TopKAggregator, batches: Seq[Seq[(Long, Long)]]): Seq[Long] = {
    val partials = batches.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(partials.foldLeft(agg.zero)(agg.merge))
  }

  private def model(rows: Seq[(Long, Long)], k: Int): Seq[Long] =
    rows.sortBy { case (s, id) => (-s, id) }.map(_._2).take(k)

  test("TopKAggregator: split-order invariance and model agreement") {
    val agg = new TopKAggregator(3)
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(1, 4)) { (rows, nSplits) =>
      val batches = rows.grouped(math.max(1, rows.length / nSplits + 1)).toSeq
      val a = byAgg(agg, batches)
      val b = byAgg(agg, batches.reverse)
      a == b && a == model(rows, 3)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }

  test("TopKPairsAggregator: split-order invariance, window-model agreement") {
    val agg = new TopKPairsAggregator(3)
    // include the pathological doubles: the aggregator must order exactly
    // like Spark's descending double sort (Double.compare: NaN greatest,
    // -0.0 < 0.0), or a refactor to the window form would change output
    val score: Gen[Double] = Gen.frequency(
      8 -> Gen.chooseNum(-5, 5).map(_ / 3.0),
      1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 0.0, -0.0))
    val pairsGen: Gen[List[(Double, Long)]] =
      Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n,
        for { s <- score; id <- Gen.chooseNum(0L, 30L) } yield (s, id)))
    def byAgg(batches: Seq[Seq[(Double, Long)]]): Seq[(Double, Long)] = {
      val partials = batches.map(_.foldLeft(agg.zero)(agg.reduce))
      agg.finish(partials.foldLeft(agg.zero)(agg.merge))
    }
    implicit val sparkDescOrd: Ordering[(Double, Long)] =
      Ordering.fromLessThan { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      }
    val prop = Prop.forAll(pairsGen, Gen.chooseNum(1, 4)) { (rows, nSplits) =>
      val batches = rows.grouped(math.max(1, rows.length / nSplits + 1)).toSeq
      val a = byAgg(batches)
      val b = byAgg(batches.reverse)
      // the model IS the ranking-window ordering the oracle SQL expresses
      val m = rows.sorted(sparkDescOrd).take(3)
      def same(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Boolean =
        x.size == y.size && x.zip(y).forall { case (p, q) =>
          java.lang.Double.compare(p._1, q._1) == 0 && p._2 == q._2
        }
      same(a, b) && same(a, m)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.toString)
  }

  test("long intersect kernel handles gids past int range") {
    val base = 1L << 32
    val rng = new scala.util.Random(13)
    val rows = Seq.tabulate(80) { _ =>
      (Array.fill(rng.nextInt(8))(base + rng.nextInt(40)).sorted,
        Array.fill(rng.nextInt(8))(base + rng.nextInt(40)).sorted)
    }
    val got = rows.toDF("x", "y")
      .select(ArrayExprs.intersectSizeLong($"x", $"y"))
      .as[Long].collect().toSeq
    val want = rows.map { case (x, y) =>
      var i = 0; var j = 0; var c = 0L
      while (i < x.length && j < y.length) {
        if (x(i) == y(j)) { c += 1; i += 1; j += 1 }
        else if (x(i) < y(j)) i += 1 else j += 1
      }
      c
    }
    assert(got == want)
  }

  test("native kernels agree with Scala arithmetic on bulk random rows") {
    val rng = new scala.util.Random(11)
    def arr(n: Int) = Array.fill(n)(rng.nextLong() % 1000)
    val rows = Seq.tabulate(120) { i =>
      // dot/l2sq are equal-dimension contracts (mismatch THROWS, asserted
      // below); intersect is a merge walk and takes any two lengths
      val n = rng.nextInt(8)
      (arr(n), arr(n),
        Array.fill(rng.nextInt(8))(rng.nextInt(40)).sorted,
        Array.fill(rng.nextInt(8))(rng.nextInt(40)).sorted)
    }
    val df = rows.toDF("a", "b", "x", "y")
    val got = df.select(ArrayExprs.dot($"a", $"b"), ArrayExprs.l2sq($"a", $"b"),
        ArrayExprs.intersectSize($"x", $"y"))
      .as[(Long, Long, Long)].collect().toSeq
    val want = rows.map { case (a, b, x, y) =>
      val n = a.length
      val dot = (0 until n).map(i => a(i) * b(i)).sum
      val l2 = (0 until n).map(i => { val d = a(i) - b(i); d * d }).sum
      // sorted-array intersection with duplicate multiplicity (merge walk)
      var i = 0; var j = 0; var c = 0L
      while (i < x.length && j < y.length) {
        if (x(i) == y(j)) { c += 1; i += 1; j += 1 }
        else if (x(i) < y(j)) i += 1 else j += 1
      }
      (dot, l2, c)
    }
    assert(got == want)
  }

  test("dimension mismatch fails loudly instead of truncating the score") {
    // a silently-partial dot product is a plausible wrong similarity — the
    // mixed-dimension-corpus bug class the kernels must refuse
    val df = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(ArrayExprs.dot($"a", $"b")).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("length mismatch")),
      s"expected a length-mismatch error, got: $e")
  }
}
