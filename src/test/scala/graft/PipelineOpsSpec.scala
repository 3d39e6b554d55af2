package graft

import graft.functions.ArrayExprs
import graft.operators.{EventOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-equality and fixture checks for the round-4 pipeline operators:
  * the windowed funnel (vs an in-memory greedy-earliest model on random
  * event streams), bigrams (vs a sliding-window model), redact (fixture with
  * known hit counts), and bm25 (vs the same formula evaluated in plain
  * Scala doubles on a hand-built corpus — catches tf/df/avgdl wiring bugs).
  */
class PipelineOpsSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"$name: $res")
  }

  // ---- funnel ----

  private val stages = Seq("view", "click", "purchase")

  private def modelFunnel(evs: Seq[(Long, String, Long)],
      w: Long): Map[String, Long] = {
    val lvls = evs.groupBy(_._1).map { case (_, es) =>
      var lvl = 0
      var tPrev = Long.MinValue
      var bound = Long.MaxValue
      var go = true
      for (st <- stages if go) {
        val cands = es.collect {
          case (_, t, ts) if t == st && ts > tPrev && ts <= bound => ts }
        if (cands.nonEmpty) {
          val t = cands.min; lvl += 1; tPrev = t; bound = t + w
        } else go = false
      }
      lvl
    }.toSeq
    stages.zipWithIndex.map { case (st, i) =>
      st -> lvls.count(_ >= i + 1).toLong
    }.toMap
  }

  private val eventGen: Gen[(Long, String, Long)] = for {
    uid <- Gen.chooseNum(1L, 5L)
    tpe <- Gen.oneOf("view", "click", "purchase", "error")
    ts <- Gen.chooseNum(0L, 100L)
  } yield (uid, tpe, ts)

  test("funnel equals the greedy-earliest model on random streams") {
    check("funnel-model", Prop.forAll(
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, eventGen)),
      Gen.chooseNum(1L, 40L)) { (evs, w) =>
      val got = EventOps.funnel(
          evs.toDF("user_id", "event_type", "ts_us"), stages, w)
        .select("stage", "n_users").as[(String, Long)].collect().toMap
      got == modelFunnel(evs, w)
    })
  }

  test("funnel window edges: bind at exactly t+w counts, t+w+1 does not") {
    def run(ts2: Long) = EventOps.funnel(
      Seq((1L, "view", 10L), (1L, "click", ts2))
        .toDF("user_id", "event_type", "ts_us"), stages, 5L)
      .select("lvl", "n_users").as[(Long, Long)].collect().toMap
    assert(run(15L) == Map(1L -> 1L, 2L -> 1L, 3L -> 0L)) // ts == t1+w: in
    assert(run(16L) == Map(1L -> 1L, 2L -> 0L, 3L -> 0L)) // past the window
    assert(run(10L) == Map(1L -> 1L, 2L -> 0L, 3L -> 0L)) // not strictly after
  }

  // ---- bigrams ----

  private val docGen: Gen[String] = Gen.chooseNum(0, 8).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))

  test("bigrams equal the sliding-window model") {
    check("bigram-model", Prop.forAll(
      Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, docGen))) { docs =>
      val got = TextOps.bigrams(docs.toDF("text"))
        .groupBy("bigram").count().as[(String, Long)].collect().toMap
      val want = docs.flatMap(d => graft.functions.Portable.tokensJvm(d)
          .sliding(2).filter(_.length == 2).map(_.mkString(" ")))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      got == want
    })
  }

  // ---- chunk dedup / contamination / token hist ----

  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(2, 50).flatMap(m => Gen.listOfN(m,
        Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("chunkDedup equals the in-memory repeated-chunk model") {
    check("chunk-model", Prop.forAll(corpusGen) { docs =>
      val got = graft.queries.DedupQueries
        .chunkDedup(docs.toDF("doc_id", "text"), chunkTokens = 3)
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, d) => id -> ((n, d)) }.toMap
      val chunks = docs.flatMap { case (id, t) =>
        graft.functions.Portable.tokensJvm(t).grouped(3)
          .map(c => (id, c.mkString(" "))) }
      val dupSet = chunks.groupBy(_._2)
        .filter(_._2.map(_._1).distinct.size >= 2).keySet
      val want = chunks.groupBy(_._1).view.mapValues { cs =>
        (cs.size.toLong, cs.count(c => dupSet(c._2)).toLong)
      }.filter(_._2._2 > 0).toMap
      got == want
    })
  }

  test("contaminationCheck equals the shared-distinct-gram model") {
    check("contam-model", Prop.forAll(corpusGen) { docs =>
      val bench = (id: Long) => id % 3 == 0
      val got = graft.queries.DedupQueries
        .contaminationCheck(docs.toDF("doc_id", "text"),
          pmod(col("doc_id"), lit(3L)) === 0, n = 2, minShared = 2)
        .as[(Long, Long)].collect().toMap
      def grams(t: String) = graft.functions.Portable.tokensJvm(t)
        .sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      val benchGrams = docs.filter(d => bench(d._1)).flatMap(d => grams(d._2)).toSet
      val want = docs.filterNot(d => bench(d._1))
        .map { case (id, t) => id -> grams(t).count(benchGrams).toLong }
        .filter(_._2 >= 2).toMap
      got == want
    })
  }

  test("tokenHist buckets by decade and sums token counts") {
    val docs = Seq(("en", "a b c"), ("en", "a b c d e f g h i j k l"),
      ("de", "x y"), ("en", "p q r s")).toDF("lang", "text")
    val got = TextOps.tokenHist(docs)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("en", 0L, 2L, 7L), ("en", 10L, 1L, 12L),
      ("de", 0L, 1L, 2L)))
  }

  // ---- scd2 ----

  test("scd2 builds closed-open version intervals with run collapsing") {
    val ch = Seq(
      (1L, 10L, 100L, "a"), (1L, 11L, 200L, "a"), // equal run collapses
      (1L, 12L, 300L, "b"), (1L, 13L, 400L, "a"), // value may recur
      (2L, 20L, 50L, "x")).toDF("user_id", "event_id", "ts_us", "v")
    val got = EventOps.scd2(ch, "user_id", "v", "ts_us", "event_id")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      (1L, "a", 100L, Some(300L), false),
      (1L, "b", 300L, Some(400L), false),
      (1L, "a", 400L, None, true),
      (2L, "x", 50L, None, true)))
  }

  test("scd2 intervals tile each key's timeline: no gaps, no overlaps") {
    check("scd2-tiling", Prop.forAll(
      Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 3L)
        ts <- Gen.chooseNum(0L, 40L)
        v <- Gen.oneOf("a", "b", "c")
      } yield (u, ts, v)))) { rows =>
      // unique (user, ts) so the change stream is well-defined without ties
      val uniq = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .zipWithIndex.map { case ((u, ts, v), i) => (u, i.toLong, ts, v) }
      val got = EventOps.scd2(uniq.toDF("user_id", "event_id", "ts_us", "v"),
          "user_id", "v", "ts_us", "event_id")
        .as[(Long, String, Long, Option[Long], Boolean)].collect()
      got.groupBy(_._1).forall { case (u, ivs) =>
        val s = ivs.sortBy(_._3)
        val times = uniq.filter(_._1 == u).map(_._3).sorted
        s.head._3 == times.head && // first version opens at the first event
          s.last._4.isEmpty && s.last._5 && // exactly one open version
          s.init.forall(!_._5) &&
          s.zip(s.tail).forall { case (a, b) => a._4.contains(b._3) } && // tiling
          s.zip(s.tail).forall { case (a, b) => a._2 != b._2 } // runs collapsed
      }
    })
  }

  // ---- redact ----

  test("redact scrubs in rule order and counts per-rule hits") {
    val rules = Seq(
      ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+", "<EMAIL>"),
      ("num", "[0-9][0-9-]+", "<NUM>"))
    val docs = Seq(
      (1L, "reach me at bob99@mail.com or 555-1234 ext 77"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextOps.redact(docs, rules)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // the email's own digits are gone before the num rule runs: no double count
    assert(got(0) == ((1L, "reach me at <EMAIL> or <NUM> ext <NUM>", 1L, 2L)))
    assert(got(1) == ((2L, "no pii here at all", 0L, 0L)))
  }

  // ---- int8 quantization ----

  test("graft_dot_i8 equals the JVM model (codegen path)") {
    check("dot-i8", Prop.forAll(
      Gen.listOfN(16, Gen.chooseNum(-127, 127)),
      Gen.listOfN(16, Gen.chooseNum(-127, 127))) { (a, b) =>
      val got = Seq((a.map(_.toByte).toArray, b.map(_.toByte).toArray))
        .toDF("a", "b")
        .select(ArrayExprs.dotI8(col("a"), col("b"))).as[Long].head()
      got == a.zip(b).map { case (x, y) => x.toLong * y }.sum
    })
  }

  test("quantizeI8 matches the round-scale model and bounds cosine error") {
    val vecs = Seq(
      (0L, 0, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (1L, 0, Array(0.5f, -0.99f, 0.3f, 0.1f)),
      (2L, 0, Array(-1.5f, 0.2f, 1.9f, -0.7f))).toDF("vec_id", "label", "embedding")
    val enc = SimilarityOps.encode(vecs)
    val qz = SimilarityOps.quantizeI8(enc)
      .as[(Long, Array[Byte], Long, Long)].collect().sortBy(_._1).toSeq
    // model: scale = max|micro|, q = round(micro*127/scale)
    val iv0 = Array(500000L, -1000000L, 250000L, 125000L)
    assert(qz.head._3 == 1000000L)
    assert(qz.head._2.toSeq == iv0.map(v =>
      math.round(v * 127.0 / 1000000L).toByte).toSeq)
    // quantized cosine within 2% of exact for each pair (64-dim headroom is
    // even better; 4-dim is the worst case for rounding error)
    def cosQ(a: Array[Byte], b: Array[Byte]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toLong * y }.sum
      val na = a.map(x => x.toLong * x).sum; val nb = b.map(x => x.toLong * x).sum
      d / math.sqrt(na.toDouble * nb.toDouble)
    }
    def cosE(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      d / math.sqrt(na.toDouble * nb.toDouble)
    }
    val ivs = Map(
      0L -> iv0,
      1L -> Array(500000L, -990000L, 300000L, 100000L),
      2L -> Array(-1500000L, 200000L, 1900000L, -700000L))
    for (i <- Seq(0L, 1L, 2L); j <- Seq(0L, 1L, 2L) if i < j) {
      val qa = qz(i.toInt)._2; val qb = qz(j.toInt)._2
      val err = math.abs(cosQ(qa, qb) - cosE(ivs(i), ivs(j)))
      assert(err < 0.02, s"pair ($i,$j) cos error $err")
    }
  }

  test("quantized top-k recall vs exact on the sf0.001 fixture") {
    val v = SimilarityOps.encode(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val qs = SimilarityOps.asQueries(v.where(col("vec_id") < 10))
    val exact = SimilarityOps.bruteForceTopK(v, qs, 5)
      .select("qid", "nbr_id").as[(Long, Long)].collect().toSet
    val qz = SimilarityOps.quantizeI8(v)
    val qzq = qz.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("qv").as("q_qv"),
        col("qnrm").as("q_qnrm"))
    val quant = SimilarityOps.quantizedTopK(qz, qzq, 5)
      .select("qid", "nbr_id").as[(Long, Long)].collect().toSet
    val perQ = exact.groupBy(_._1).map { case (q, es) =>
      es.count(quant.contains).toDouble / es.size
    }
    assert(perQ.min >= 0.6, s"min recall ${perQ.min}")
    info(s"min per-query recall@5: ${perQ.min}")
  }

  // ---- bm25 ----

  test("bm25 matches the formula evaluated in plain doubles") {
    val corpus = Seq((10L, "a a b x"), (11L, "b c"), (12L, "d d d"))
    val terms = Seq("a", "b")
    val k1 = 1.2; val b = 0.75
    val got = TextOps.bm25(corpus.toDF("doc_id", "text"), terms, k1, b)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // corpus stats over ALL docs (incl. the no-match doc 12)
    val nDocs = 3.0; val avgdl = (4L + 2L + 3L) / nDocs
    def ts(tf: Long, df: Long, dlen: Long): Double =
      if (tf == 0L) 0.0
      else math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) *
        (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dlen / avgdl))
    val want = Seq(
      (10L, 4L, ts(2, 1, 4) + ts(1, 2, 4)),
      (11L, 2L, ts(0, 1, 2) + ts(1, 2, 2)))
    assert(got.length == 2, s"only matching docs survive: ${got.toSeq}")
    got.zip(want).foreach { case ((id, dl, s), (wid, wdl, ws)) =>
      assert(id == wid && dl == wdl && math.abs(s - ws) < 1e-12,
        s"doc $id: got $s want $ws")
    }
    // two-term doc with higher tf outranks the single-term doc
    assert(got(0)._3 > got(1)._3)
  }
}
