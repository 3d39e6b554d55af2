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

  test("pplBuckets matches the in-memory histogram-tercile model") {
    val lm = scala.collection.mutable.Map.empty[String, Long]
    corpus.foreach { case (_, _, t) =>
      Portable.tokensJvm(t).foreach(w => lm(w) = lm.getOrElse(w, 0L) + 1) }
    val total = lm.values.sum
    def bits(x: Long) = (64 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val perDoc = corpus.flatMap { case (_, lang, t) =>
      val toks = Portable.tokensJvm(t)
      if (toks.isEmpty) None
      else {
        val dlen = toks.length.toLong
        val score = toks.map(w => bits(total) - bits(lm(w))).sum
        Some((lang, dlen,
          math.floor(score.toDouble / dlen.toDouble * 100.0).toLong))
      }
    }
    val expect = perDoc.groupBy(_._1).flatMap { case (lang, xs) =>
      val n = xs.size.toLong
      val hist = xs.groupBy(_._3).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      var t1 = Long.MaxValue; var t2 = Long.MaxValue
      hist.foreach { case (cb, nh) =>
        cum += nh
        if (t1 == Long.MaxValue && cum * 3 >= n) t1 = cb
        if (t2 == Long.MaxValue && cum * 3 >= 2 * n) t2 = cb
      }
      xs.groupBy { case (_, _, cb) =>
        (if (cb > t1) 1L else 0L) + (if (cb > t2) 1L else 0L)
      }.map { case (b, ys) =>
        (lang, b) -> (ys.size.toLong, ys.map(_._2).sum,
          ys.map(_._3).min, ys.map(_._3).max)
      }
    }
    val got = TextOps.pplBuckets(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === expect)
    // buckets are score-ordered: extents never overlap within a language
    got.keys.map(_._1).toSet.foreach { (l: String) =>
      val bs = got.filter(_._1._1 == l).toSeq.sortBy(_._1._2)
      bs.sliding(2).foreach {
        case Seq((_, lo), (_, hi)) => assert(lo._4 < hi._3, s"$l overlap")
        case _ =>
      }
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

  test("bpeApply: golden segmentations incl. multi-level merges and priority") {
    import spark.implicits._
    val merges = Seq("e" -> "r", "o" -> "r", "a" -> "t", "t" -> "h",
      "th" -> "e", "or" -> "t")
    val wc = Seq(("the", 3L), ("sort", 2L), ("order", 1L), ("data", 1L),
      ("thether", 1L), ("xyz", 1L)).toDF("word", "cnt")
    val got = graft.operators.TextOps.bpeApply(wc, merges)
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getLong(3)))
      .toMap
    // th+e composes over t+h; or+t over o+r; priority e+r beats t+h in
    // "thether" ONLY until e r is exhausted (leftmost-highest-priority)
    assert(got("the") == ("the", 1L))
    assert(got("sort") == ("s ort", 2L))
    assert(got("order") == ("or d er", 3L))
    assert(got("data") == ("d at a", 3L))
    // thether: chars t h e t h e r -> (e,r) at 5-6 first: t h e t h er;
    // then (t,h) leftmost: th e t h er; (th,e): the t h er; (t,h): the th er
    assert(got("thether") == ("the th er", 3L))
    assert(got("xyz") == ("x y z", 3L)) // no merge applies
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
