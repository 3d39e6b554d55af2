package graft

import graft.functions.Portable.tokensJvm
import graft.operators.TextOps
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Coverage laws for the RAG chunker: every token of every doc lands in at
  * least one chunk, adjacent chunks overlap by exactly width−stride (except
  * a shorter tail), chunk text is the exact token slice, and the chunk
  * count matches the 1-or-⌈(len−width)/stride⌉+1 formula the oracle SQL
  * replays. */
class ChunkSpec extends SparkTestBase {

  test("random docs: coverage, overlap, slice exactness, count formula") {
    val word = Gen.oneOf("xx", "yy", "zz", "ww")
    val doc = Gen.choose(1, 90).flatMap(n => Gen.listOfN(n, word))
    val gen = for {
      ds <- Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, doc))
      stride <- Gen.choose(2, 6)
      extra <- Gen.choose(1, 5)
    } yield (ds.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) },
      stride + extra, stride)
    val prop = Prop.forAllNoShrink(gen) { case (docs, width, stride) =>
      val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      val out = TextOps.chunk(df, width, stride).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)
      docs.forall { case (id, text) =>
        val t = tokensJvm(text)
        val cs = out(id).sortBy(_._2)
        val expectN =
          if (t.length <= width) 1
          else (t.length - width + stride - 1) / stride + 1
        val countOk = cs.length == expectN
        val sliceOk = cs.forall { case (_, i, n, txt) =>
          val start = i.toInt * stride
          n == math.min(width, t.length - start) &&
            txt == t.slice(start, start + n.toInt).mkString(" ")
        }
        val lastCoversEnd =
          cs.last._2.toInt * stride + cs.last._3.toInt == t.length
        countOk && sliceOk && lastCoversEnd
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
