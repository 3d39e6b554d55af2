package graft

import graft.queries.DedupQueries
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** PPJoin losslessness property: for ANY corpus, the prefix + positional +
  * length-filtered candidate pipeline returns EXACTLY the brute-force
  * bigram-Jaccard pairs — no misses from the filters, no false survivors
  * from verification. Thresholds at and around the boundary (incl. the
  * candidate-killing 0.5-exact ties) are exercised by the small dense
  * vocabulary, which maximizes shared grams. */
class JaccardPropertySpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private val vocab = Gen.oneOf("a", "b", "c", "d", "e", "f")
  private val docGen: Gen[String] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, vocab)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, docGen))

  private def bigrams(text: String): Set[String] = {
    val t = text.toLowerCase.split("[ \t\r\n]+").filter(_.nonEmpty)
    t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
  }

  private def model(docs: Seq[String], t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.zipWithIndex.map { case (d, i) => (i.toLong, bigrams(d)) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      common = (sa & sb).size
      jac = common.toDouble / (sa.size + sb.size - common)
      if jac >= t
    } yield (ia, ib, jac)).toSet
  }

  private def engine(docs: Seq[String], t: Double,
      wideGids: Boolean = false): Set[(Long, Long, Double)] = {
    val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("doc_id", "text")
    DedupQueries.ngramJaccardJoin(df, t, wideGids)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("PPJoin == brute force for arbitrary corpora at t=0.5") {
    val prop = Prop.forAll(corpusGen) { docs =>
      engine(docs, 0.5) == model(docs, 0.5)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.toString)
  }

  test("PPJoin == brute force at a high threshold (t=0.8)") {
    val prop = Prop.forAll(corpusGen) { docs =>
      engine(docs, 0.8) == model(docs, 0.8)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.toString)
  }

  test("identical docs always pair with jac == 1.0") {
    val got = engine(Seq("a b c a b", "a b c a b", "f f f"), 0.5)
    assert(got == Set((0L, 1L, 1.0)))
  }

  private def contModel(docs: Seq[String],
      t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.zipWithIndex.map { case (d, i) => (i.toLong, bigrams(d)) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if sa.nonEmpty && sb.nonEmpty
      if sa.size < sb.size || (sa.size == sb.size && ia < ib)
      cont = (sa & sb).size.toDouble / sa.size
      if cont >= t
    } yield (ia, ib, cont)).toSet
  }

  private def contEngine(docs: Seq[String],
      t: Double): Set[(Long, Long, Double)] = {
    val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("doc_id", "text")
    DedupQueries.ngramContainmentJoin(df, t)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("containment join == brute force at t=0.6 and t=0.9") {
    val prop = Prop.forAll(corpusGen) { docs =>
      contEngine(docs, 0.6) == contModel(docs, 0.6) &&
        contEngine(docs, 0.9) == contModel(docs, 0.9)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.toString)
  }

  test("a doc fully quoted inside a larger doc has containment 1.0") {
    // doc 0's bigrams are a strict subset of doc 1's
    val got = contEngine(Seq("a b c", "a b c d e f", "f f f"), 0.9)
    assert(got == Set((0L, 1L, 1.0)))
  }

  test("long-gid path (gids forced past 2^32) == brute force and == int path") {
    // the >2^31-vocabulary regime: gids offset beyond int range exercise the
    // SortedLongIntersectSize kernel and the long prefix/positional pipeline
    val prop = Prop.forAll(corpusGen) { docs =>
      val wide = engine(docs, 0.5, wideGids = true)
      wide == model(docs, 0.5) && wide == engine(docs, 0.5)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.toString)
  }
}
