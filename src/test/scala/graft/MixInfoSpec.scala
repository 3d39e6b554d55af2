package graft

import graft.functions.Portable
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Model checks for the unigram information scorer and the token-budget
  * mixture sampler: infoScore vs a per-doc in-memory replay of the bit
  * formula, and mixBudgetSample vs an in-memory census/rate/membership
  * computation — both on the sf0.001 documents fixture, so any drift
  * between the distributed plans and the semantics shows as a value diff.
  */
class MixInfoSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private lazy val corpus: Seq[(Long, String, String)] =
    docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq

  test("infoScore matches the in-memory unigram bit model") {
    val lm = scala.collection.mutable.Map.empty[String, Long]
    corpus.foreach { case (_, _, t) =>
      Portable.tokensJvm(t).foreach(w => lm(w) = lm.getOrElse(w, 0L) + 1) }
    val total = lm.values.sum
    def bits(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val expect = corpus.map { case (id, _, t) =>
      val toks = Portable.tokensJvm(t)
      val score = toks.map(w => (bits(total) - bits(lm(w))).toLong).sum
      id -> (toks.length.toLong, score)
    }.toMap
    val got = TextOps.infoScore(docs).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (id, dlen, score, avg) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert((dlen, score) === expect(id), s"doc $id")
      assert(avg === score.toDouble / dlen.toDouble)
    }
  }

  test("mixBudgetSample matches the in-memory census/rate/membership model") {
    val w = Map("en" -> 400L, "fr" -> 150L, "es" -> 150L, "zh" -> 150L,
      "de" -> 150L)
    val toks = corpus.map { case (id, lang, t) =>
      (id, lang, Portable.tokensJvm(t).length.toLong) }
    val census = toks.groupBy(_._2).map { case (l, xs) =>
      l -> xs.map(_._3).sum }
    val budget = math.floor(census.values.sum.toDouble * 0.5)
    val rate = census.map { case (l, lt) =>
      l -> math.min(1000000L, math.floor(
        math.floor(budget * w(l).toDouble / 1000.0)
          * 1000000.0 / lt.toDouble).toLong)
    }
    val kept = toks.filter { case (id, l, _) =>
      Portable.md5Long60(id.toString) % 1000000L < rate(l) }
    val expect = kept.groupBy(_._2).map { case (l, xs) =>
      l -> (census(l), rate(l), xs.size.toLong, xs.map(_._3).sum) }
    val got = TextOps.mixBudgetSample(docs, w).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expect)
    // the realized sample is a genuine downsample, never an overshoot past
    // the lang's own tokens
    got.foreach { case (l, (lt, _, _, st)) => assert(st <= lt, l) }
  }

  test("bpePairCounts matches the in-memory pair model") {
    val model = scala.collection.mutable.Map.empty[String, Long]
    corpus.foreach { case (_, _, t) =>
      Portable.tokensJvm(t).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          model(p) = model.getOrElse(p, 0L) + 1
        }
      }
    }
    val got = TextOps.bpePairCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === model.toMap)
  }

  test("mixBudgetSample is invariant to input partitioning") {
    val w = Map("en" -> 400L, "fr" -> 150L, "es" -> 150L, "zh" -> 150L,
      "de" -> 150L)
    val a = TextOps.mixBudgetSample(docs.repartition(1), w)
      .orderBy("lang").collect().toSeq
    val b = TextOps.mixBudgetSample(docs.repartition(13), w)
      .orderBy("lang").collect().toSeq
    assert(a === b)
  }
}
