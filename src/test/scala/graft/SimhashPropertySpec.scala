package graft

import graft.functions.Portable.md5Long60
import graft.queries.DedupQueries
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** SimHash band-blocking losslessness: hamming ≤ 3 pairs found by the
  * 4×15-bit blocked join equal the brute-force all-pairs result for ANY
  * corpus (pigeonhole: ≤3 differing bits cannot touch all 4 bands). The
  * near-identical doc generator (clone + small mutations) produces plenty
  * of low-hamming pairs, so the property is not vacuous. */
class SimhashPropertySpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum")
  private val baseDoc: Gen[List[String]] =
    Gen.chooseNum(4, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
  /** a corpus of base docs plus near-clones (one token appended/changed). */
  private val corpusGen: Gen[List[String]] = for {
    bases <- Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, baseDoc))
    mutated <- Gen.sequence[List[List[String]], List[String]](bases.map { b =>
      Gen.oneOf(vocab).map(w => b :+ w)
    })
  } yield (bases ++ mutated).map(_.mkString(" "))

  private def simhash(text: String): Long = {
    val tf = text.toLowerCase.split("[ \t\r\n]+").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong)
    val bsum = new Array[Long](60)
    tf.foreach { case (tok, n) =>
      val h = md5Long60(tok)
      for (i <- 0 until 60) bsum(i) += n * (((h >>> i) & 1L) * 2L - 1L)
    }
    (0 until 60).foldLeft(0L)((acc, i) => if (bsum(i) > 0) acc | (1L << i) else acc)
  }

  private def model(docs: Seq[String]): Set[(Long, Long, Long)] = {
    val sigs = docs.zipWithIndex.map { case (d, i) => (i.toLong, simhash(d)) }
    (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb).toLong if h <= 3
    } yield (ia, ib, h)).toSet
  }

  test("blocked simhash join == brute-force hamming pairs") {
    val prop = Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      val got = DedupQueries.simhashJoin(df)
        .as[(Long, Long, Long)].collect().toSet
      got == model(docs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.toString)
  }

  test("identical docs have hamming 0 and always pair") {
    val df = Seq((0L, "red green blue"), (1L, "red green blue"))
      .toDF("doc_id", "text")
    assert(DedupQueries.simhashJoin(df).as[(Long, Long, Long)]
      .collect().toSeq == Seq((0L, 1L, 0L)))
  }
}
