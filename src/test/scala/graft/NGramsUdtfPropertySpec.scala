package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Portable.tokensJvm

/** Model equality for the graft_ngrams Generator UDTF: for ANY generated
  * corpus and n, the SQL LATERAL VIEW stream equals an in-memory replay of
  * the shared tokenizer — same (pos, gram) multiset per doc, so a drifted
  * tokenizer, an off-by-one window, or a dropped short doc falsifies it.
  * n = 2 additionally cross-checks the independent TextOps.bigrams path.
  */
class NGramsUdtfPropertySpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "\t", " ")
  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.chooseNum(0L, 40L)
    n <- Gen.chooseNum(0, 8)
    ws <- Gen.listOfN(n, word)
  } yield (id, ws.mkString(" "))

  private def model(docs: Seq[(Long, String)],
      n: Int): Seq[(Long, Int, String)] =
    docs.flatMap { case (id, text) =>
      val t = tokensJvm(text)
      (0 to t.length - n).map(i => (id, i, t.slice(i, i + n).mkString(" ")))
    }

  test("LATERAL VIEW graft_ngrams equals the tokenizer model for any corpus and n") {
    val prop = Prop.forAll(
      Gen.chooseNum(1, 15).flatMap(k => Gen.listOfN(k, docGen))
        .map(_.groupBy(_._1).map(_._2.head).toList),
      Gen.chooseNum(1, 4)) { (docs, n) =>
      docs.toDF("doc_id", "text").createOrReplaceTempView("ngp_docs")
      val got = spark.sql(
        s"SELECT doc_id, pos, gram FROM ngp_docs " +
          s"LATERAL VIEW graft_ngrams(text, $n) g AS pos, gram")
        .as[(Long, Int, String)].collect().sorted.toSeq
      got == model(docs, n).sorted
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30),
      prop)
    assert(r.passed, r.status.toString)
  }

  test("n = 2 agrees with the independent TextOps.bigrams operator") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf, "documents")
    docs.createOrReplaceTempView("ngp_real_docs")
    val viaUdtf = spark.sql(
      "SELECT gram AS bigram, count(*) AS n FROM ngp_real_docs " +
        "LATERAL VIEW graft_ngrams(text, 2) g AS pos, gram GROUP BY gram")
      .as[(String, Long)].collect().toMap
    val viaOp = graft.operators.TextOps.bigrams(docs)
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(viaUdtf == viaOp,
      "UDTF bigram counts diverge from TextOps.bigrams")
  }
}
