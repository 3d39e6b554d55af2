package graft

import graft.queries.DedupQueries
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** MinHash+LSH deterministic guarantees (the probabilistic part — recall on
  * partially-similar pairs — is by design not asserted):
  * - NO false positives, ever: every banded candidate is verified with
  *   exact Jaccard, so output ⊆ brute-force pairs at the threshold, with
  *   the exact jac value.
  * - GUARANTEED recall for identical shingle sets: equal sets hash to equal
  *   signatures, so every band collides and the pair must surface. */
class MinhashPropertySpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private val vocab = Vector("ox", "ant", "bee", "cat", "dog", "elk", "fox")
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] = for {
    bases <- Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, docGen))
    dups <- Gen.someOf(bases)
  } yield bases ++ dups // exact duplicates guaranteed present sometimes

  private def trigrams(text: String): Set[String] = {
    val t = text.toLowerCase.split("[ \t\r\n]+").filter(_.nonEmpty)
    t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
  }

  private def bruteForce(docs: Seq[String], t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.zipWithIndex.map { case (d, i) => (i.toLong, trigrams(d)) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      common = (sa & sb).size
      jac = common.toDouble / (sa.size + sb.size - common)
      if jac >= t
    } yield (ia, ib, jac)).toSet
  }

  test("no false positives; identical shingle sets always recalled") {
    val prop = Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      val got = DedupQueries.minhashJoin(df, 0.7)
        .as[(Long, Long, Double)].collect().toSet
      val truth = bruteForce(docs, 0.7)
      val identicals = truth.filter(_._3 == 1.0)
      got.subsetOf(truth) && identicals.subsetOf(got)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.toString)
  }
}
