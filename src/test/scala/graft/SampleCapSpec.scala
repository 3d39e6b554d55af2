package graft

import graft.functions.Portable
import graft.operators.TextOps
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-equality checks for the round-5 corpus-governance operators:
  * classifier inference (vs the same frozen-hash formula in plain Scala),
  * exact-k sampling and domain caps (vs in-memory sort-and-take models), and
  * partitioning invariance — the aggregator forms must pick the SAME rows
  * under any physical layout, which is the whole point of hash-determinism.
  */
class SampleCapSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"$name: $res")
  }

  private val wordGen = Gen.oneOf("the", "cat", "sat", "on", "mat", "über",
    "Data", "spark", "x1", "")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("classify equals the frozen-hash linear model on random docs") {
    check("classify-model", Prop.forAll(
      Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, docGen))) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextOps.classify(docs)
        .select("doc_id", "n_tokens", "score", "keep")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val want = texts.zipWithIndex.map { case (t, i) =>
        val ts = Portable.tokensJvm(t)
        val score = ts.map(w => Portable.md5Long60(w) % 2001 - 1000).sum
        (i.toLong, ts.length.toLong, score, score > 0)
      }
      got == want
    })
  }

  private val grpGen = Gen.oneOf("en", "de", "fr")

  test("sampleK picks exactly the k hash-smallest ids per group, any layout") {
    check("samplek-model", Prop.forAll(
      Gen.chooseNum(0, 30).flatMap(n =>
        Gen.listOfN(n, grpGen)).map(_.zipWithIndex),
      Gen.chooseNum(1, 4), Gen.chooseNum(1, 7)) { (rows, k, parts) =>
      val docs = rows.map { case (g, i) => (i.toLong, g) }
        .toDF("doc_id", "lang").repartition(parts)
      val got = TextOps.sampleK(docs, "lang", k)
        .select("lang", "rnk", "doc_id")
        .as[(String, Long, Long)].collect().toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map(r => (Portable.md5Long60(r._2.toString), r._2.toLong))
          .sorted.take(k).zipWithIndex
          .map { case ((_, id), i) => (g, (i + 1).toLong, id) }
      }.sorted
      got.sorted == want
    })
  }

  test("weightedPrioritySample equals the min-of-w-hashes model, any layout") {
    check("wsample-model", Prop.forAll(
      Gen.chooseNum(0, 30).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0L, 4000L))).map(_.zipWithIndex),
      Gen.chooseNum(1, 6), Gen.chooseNum(1, 7)) { (rows, k, parts) =>
      val docs = rows.map { case (nc, i) => (i.toLong, nc) }
        .toDF("doc_id", "n_chars").repartition(parts)
      val got = TextOps.weightedPrioritySample(docs, k)
        .select("rnk", "doc_id", "weight", "pri")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val want = rows.map { case (nc, i) =>
        val w = 1L + math.min(7L, nc / 400L)
        val pri = (1L to w).map(r => Portable.md5Long60(s"$i:$r")).min
        (pri, i.toLong, w)
      }.sorted.take(k).zipWithIndex.map { case ((pri, id, w), idx) =>
        ((idx + 1).toLong, id, w, pri)
      }
      got == want
    })
  }

  test("domainCap keeps top-k per source by (n_chars desc, id), any layout") {
    check("domaincap-model", Prop.forAll(
      Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n,
        Gen.zip(grpGen, Gen.chooseNum(0L, 9L)))).map(_.zipWithIndex),
      Gen.chooseNum(1, 4), Gen.chooseNum(1, 7)) { (rows, k, parts) =>
      val docs = rows.map { case ((g, nc), i) => (i.toLong, g, nc) }
        .toDF("doc_id", "source", "n_chars").repartition(parts)
      val got = TextOps.domainCap(docs, k)
        .select("source", "rnk", "doc_id", "n_chars")
        .as[(String, Long, Long, Long)].collect().toSeq
      val want = rows.groupBy(_._1._1).toSeq.flatMap { case (g, rs) =>
        rs.map { case ((_, nc), i) => (-nc, i.toLong) }
          .sorted.take(k).zipWithIndex
          .map { case ((negNc, id), i) => (g, (i + 1).toLong, id, -negNc) }
      }.sorted
      got.sorted == want
    })
  }
}
