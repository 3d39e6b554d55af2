package graft

import graft.operators.{SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Property tests for the round-5 pipeline-telemetry operators:
  * TextOps.repetition vs a brute-force per-doc model (including degenerate
  * loop-generation shapes), and SimilarityOps.kmeansStats vs a driver-side
  * assignment model on the real fixture vectors. */
class PipelineStatsSpec extends SparkTestBase {

  // ---- repetition ----

  private def repModel(text: String): (Long, Long, Long, Long) = {
    val t = graft.functions.Portable.tokensJvm(text)
    val bigrams = t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    val top2 =
      if (bigrams.isEmpty) 0L
      else bigrams.groupBy(identity).values.map(_.size).max.toLong
    val g5 = t.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSeq
    (t.length.toLong, top2, g5.length.toLong, g5.distinct.length.toLong)
  }

  test("repetition counts match brute force on random and degenerate docs") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "repeat", "loop")
    val docs: Seq[(Long, String)] =
      (1L to 30L).map { id =>
        id -> Seq.fill(rng.nextInt(40))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")
      } ++ Seq(
        100L -> "",                       // empty
        101L -> "single",                 // no bigrams, no 5-grams
        102L -> Array.fill(50)("spam spam").mkString(" "),   // pure loop
        103L -> "a b c d e f g h i j")    // all distinct
    val got = TextOps.repetition(docs.toDF("doc_id", "text"))
      .select("doc_id", "n_tokens", "top2_cnt", "n_5grams", "n_uniq_5grams")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == repModel(text), s"doc $id: '$text'")
    }
  }

  test("repetition flags the loop doc and not the distinct doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, Array.fill(50)("spam").mkString(" ")),
      (2L, (1 to 50).map("w" + _).mkString(" ")))
    val flags = TextOps.repetition(docs.toDF("doc_id", "text"))
      .select("doc_id", "is_repetitive").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(1L) && !flags(2L))
  }

  // ---- bpeTrain ----

  /** In-memory BPE trainer: same argmax tiebreak and left-to-right fusion. */
  private def bpeModel(wc: Map[String, Long],
      rounds: Int): Seq[(Long, String, String, Long)] = {
    var seg: Map[List[String], Long] =
      wc.map { case (w, c) => w.map(_.toString).toList -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seg.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case List(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (pc.nonEmpty) {
        val ((a, b), c) = pc.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((r.toLong, a, b, c))
        seg = seg.groupMapReduce { case (syms, _) =>
          val o = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              o += (a + b); i += 2
            } else { o += syms(i); i += 1 }
          }
          o.toList
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("bpeTrain matches an in-memory trainer on random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // alphabet of 3 chars forces heavy pair collisions, self-pairs ("aa"),
    // and ties the (cnt desc, pair asc) tiebreak must break identically
    val words = Seq.fill(60)(
      (1 to (1 + rng.nextInt(6))).map(_ => ('a' + rng.nextInt(3)).toChar)
        .mkString)
    val wc = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TextOps.bpeTrain(
        wc.toSeq.toDF("word", "cnt"), 6)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == bpeModel(wc, 6))
  }

  test("bpeTrain stops when no pairs remain") {
    import spark.implicits._
    val wc = Seq(("ab", 3L), ("a", 2L))   // one merge possible, then dry
    val got = TextOps.bpeTrain(wc.toDF("word", "cnt"), 5).collect()
    assert(got.length == 1 &&
      got(0).getString(1) == "a" && got(0).getString(2) == "b")
  }

  // ---- kmeansStats ----

  test("kmeansStats matches a driver-side assignment model on fixtures") {
    import spark.implicits._
    val v = SimilarityOps.encode(Tables(spark, sf, "embeddings"))
      .localCheckpoint()
    val cents = SimilarityOps.trainCentroids(v, 4, 64, 2)
    val got = SimilarityOps.kmeansStats(v, cents.toDF("cid", "civ"))
      .collect()
      .map { r =>
        val in = r.getDouble(2)
        assert(in == math.rint(in) && math.abs(in) < (1L << 53).toDouble,
          s"inertia $in not an exactly-representable integer")
        r.getInt(0) -> (r.getLong(1), in.toLong)
      }
      .toMap

    val vecs = v.select(col("vec_id"), col("iv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val model = scala.collection.mutable.HashMap.empty[Int, (Long, Long)]
    vecs.foreach { case (_, iv) =>
      var best = -1; var bd = Long.MaxValue
      cents.foreach { case (cid, civ) =>
        var d = 0L; var i = 0
        while (i < iv.length) { val t = iv(i) - civ(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = cid } // strict <: ties keep smaller cid
      }
      val (n, s) = model.getOrElse(best, (0L, 0L))
      model.update(best, (n + 1, s + bd))
    }
    assert(got == model.toMap)
    assert(got.values.map(_._1).sum == vecs.length.toLong)
  }

  // ---- classifierTrain ----

  /** In-memory batch perceptron: same features, labels, and update rule. */
  private def perceptronModel(docs: Seq[(Long, String, String)], buckets: Int,
      rounds: Int): Seq[(Long, Long, Long, Long)] = {
    val dim = buckets + 1
    val feats = docs.map { case (_, text, lang) =>
      val x = new Array[Long](dim)
      graft.functions.Portable.tokensJvm(text).foreach { t =>
        x((graft.functions.Portable.md5Long60(t) % buckets).toInt) += 1L
      }
      x(buckets) = 1L
      (if (lang == "en") 1L else -1L, x)
    }
    var w = new Array[Long](dim)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val bad = feats.filter { case (y, x) =>
        y * w.zip(x).map { case (a, b) => a * b }.sum <= 0L
      }
      w = Array.tabulate(dim)(i => w(i) + bad.map { case (y, x) => y * x(i) }.sum)
      for (b <- 0 until dim) out += ((r.toLong, b.toLong, w(b), bad.size.toLong))
    }
    out.toSeq
  }

  test("classifierTrain matches an in-memory perceptron, any partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val langs = Seq("en", "fr", "zh")
    // skew vocab by label so the model has something to learn
    val docs = (1L to 80L).map { id =>
      val lang = langs(rng.nextInt(3))
      val vocab = if (lang == "en") Seq("the", "and", "cat", "dog")
        else Seq("le", "und", "chat", "hund")
      val text = (1 to 3 + rng.nextInt(10))
        .map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
      (id, text, lang)
    }
    val expect = perceptronModel(docs, 16, 5)
    for (parts <- Seq(1, 7)) {
      val got = TextOps.classifierTrain(
          docs.toDF("doc_id", "text", "lang").repartition(parts),
          buckets = 16, rounds = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
      assert(got.toSeq == expect, s"parts=$parts")
    }
    // round 1 scores under w0 = 0 misclassify every doc
    assert(expect.head._4 == docs.length.toLong)
  }
}
