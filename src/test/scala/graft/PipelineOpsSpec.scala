package graft

import graft.operators.{EventOps, TextOps}
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
