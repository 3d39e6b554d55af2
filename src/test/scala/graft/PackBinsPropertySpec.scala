package graft

import graft.functions.Portable.{md5Long60, tokensJvm}
import graft.operators.TextOps
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model equality for the greedy sequence packer: for ANY generated corpus,
  * budget, and shard count, the distributed `TextOps.packBins` equals an
  * in-memory replay of the same deterministic state machine — group by
  * (lang, md5-shard), sort by doc_id, pack greedily. With the grouping,
  * ordering, and overflow rule all pinned by the model, any divergence
  * (a lost doc, a shard-assignment drift, an off-by-one at the budget
  * boundary) falsifies the property.
  */
class PackBinsPropertySpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private val word = Gen.oneOf("ein", "zwei", "drei", "vier", "fuenf", "w")
  private val docGen: Gen[(Long, String, String)] = for {
    id <- Gen.chooseNum(0L, 60L)
    lang <- Gen.oneOf("en", "de")
    n <- Gen.chooseNum(0, 9)
    ws <- Gen.listOfN(n, word)
  } yield (id, lang, ws.mkString(" "))
  private val corpusGen: Gen[List[(Long, String, String)]] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, docGen))
      // packBins keys groups by doc_id: keep ids unique like the real table
      .map(_.groupBy(_._1).map(_._2.head).toList)

  private def model(docs: Seq[(Long, String, String)], budget: Long,
      nShards: Int): Set[(String, Long, Long, Long, Long)] = {
    val out = Set.newBuilder[(String, Long, Long, Long, Long)]
    docs.map { case (id, lang, text) =>
      (lang, math.floorMod(md5Long60(id.toString), nShards.toLong), id,
        tokensJvm(text).length.toLong)
    }.groupBy { case (lang, shard, _, _) => (lang, shard) }
      .foreach { case ((lang, shard), group) =>
        var bin = 0L; var fill = 0L; var nDocs = 0L; var first = true
        group.sortBy(_._3).foreach { case (_, _, _, n) =>
          if (first) { fill = n; nDocs = 1; first = false }
          else if (fill + n > budget) {
            out += ((lang, shard, bin, nDocs, fill))
            bin += 1; fill = n; nDocs = 1
          } else { fill += n; nDocs += 1 }
        }
        if (!first) out += ((lang, shard, bin, nDocs, fill))
      }
    out.result()
  }

  test("packBins equals the in-memory greedy model for any corpus") {
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1L, 12L),
      Gen.oneOf(1, 3, 8)) { (docs, budget, nShards) =>
      val df = docs.toDF("doc_id", "lang", "text")
      val got = TextOps.packBins(df, budget = budget, nShards = nShards)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      got == model(docs, budget, nShards)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"packBins model equality: $res")
  }
}
