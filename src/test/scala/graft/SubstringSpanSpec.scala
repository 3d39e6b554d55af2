package graft

import graft.functions.Portable.tokensJvm
import graft.queries.DedupQueries
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ExactSubstr-style duplicated-span dedup vs an in-memory brute-force
  * model: for random corpora with planted shared substrings, the engine's
  * spans must equal the model's (every position whose w-shingle occurs in
  * ≥2 docs, merged into maximal runs, span_len = run + w - 1, filtered at
  * minLen). Also pins the exactness claim: a planted shared substring of L
  * tokens yields a span of EXACTLY L tokens in both docs. */
class SubstringSpanSpec extends SparkTestBase {

  private def model(docs: Seq[(Long, String)], w: Int,
      minLen: Int): Set[(Long, Long, Long)] = {
    val sh = docs.flatMap { case (id, text) =>
      val t = tokensJvm(text)
      (0 to t.length - w).map(i => (id, i.toLong, t.slice(i, i + w).mkString(" ")))
    }
    val dup = sh.groupBy(_._3).filter { case (_, os) =>
      os.map(_._1).distinct.size >= 2
    }.keySet
    sh.filter(o => dup(o._3)).groupBy(_._1).toSeq.flatMap { case (id, os) =>
      val ps = os.map(_._2).sorted
      // merge consecutive runs
      val runs = ps.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: rest, p) if p == e0 + 1 => (s0, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      runs.map { case (s0, e0) => (id, s0, e0 - s0 + w) }
    }.filter(_._3 >= minLen).toSet
  }

  private def run(docs: Seq[(Long, String)], w: Int,
      minLen: Int): Set[(Long, Long, Long)] = {
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    DedupQueries.substringSpans(df, w, minLen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("planted shared substring of L tokens -> exactly-L spans in both docs") {
    val shared = (1 to 23).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta eta theta iota"),
      (2L, s"one two three four five six $shared seven eight nine ten"),
      (3L, "completely unrelated filler words nothing repeated here at all"))
    val spans = run(docs, w = 10, minLen = 15)
    assert(spans == Set((1L, 2L, 23L), (2L, 6L, 23L)), s"got $spans")
  }

  test("random corpora with planted duplicates match the in-memory model") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.choose(5, 40).flatMap(n => Gen.listOfN(n, word))
    val gen = for {
      nDocs <- Gen.choose(2, 8)
      ds <- Gen.listOfN(nDocs, doc)
      w <- Gen.choose(2, 4)
      minLen <- Gen.choose(w, w + 3)
    } yield (ds.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) },
      w, minLen)
    val prop = Prop.forAllNoShrink(gen) { case (docs, w, minLen) =>
      run(docs, w, minLen) == model(docs, w, minLen)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
