package graft

import graft.operators.TextOps

/** Winnowing fingerprint selection (SIGMOD '03): model equality, the
  * shared-substring guarantee, and operator/helper consistency. */
class WinnowSpec extends SparkTestBase {

  /** Brute-force reference: literally the paper's definition. */
  private def model(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val cps = text.codePoints().toArray
    val g = cps.length - k + 1
    if (g <= 0) return Set.empty
    val h = (0 until g).map { i =>
      (0 until k).foldLeft(0L)((a, j) => (a * 31L + cps(i + j)) % 2147483647L)
    }
    (0 until math.max(1, g - w + 1)).map { j =>
      val win = (j until math.min(j + w, g))
      // min hash, rightmost position on ties
      val best = win.maxBy(p => (-h(p), p))
      (best + 1, h(best))
    }.toSet
  }

  test("winnowSelect matches the brute-force definition, tie-heavy alphabets") {
    val rng = new scala.util.Random(71)
    for (_ <- 1 to 200) {
      // 2-char alphabet forces many equal gram hashes → tie rule must bite
      val n = rng.nextInt(30)
      val text = (1 to n).map(_ => ('a' + rng.nextInt(2)).toChar).mkString
      val got = TextOps.winnowSelect(text, 3, 4).toSet
      assert(got == model(text, 3, 4), s"text='$text'")
    }
  }

  test("guarantee: docs sharing >= w+k-1 chars share a selected fingerprint") {
    val rng = new scala.util.Random(73)
    for (t <- 1 to 100) {
      val k = 5; val w = 4
      val shared = (1 to w + k - 1).map(_ => ('a' + rng.nextInt(26)).toChar)
        .mkString
      def noise(n: Int) =
        (1 to n).map(_ => ('A' + rng.nextInt(26)).toChar).mkString
      val d1 = noise(rng.nextInt(20)) + shared + noise(rng.nextInt(20))
      val d2 = noise(rng.nextInt(20)) + shared + noise(rng.nextInt(20))
      val f1 = TextOps.winnowSelect(d1, k, w).map(_._2).toSet
      val f2 = TextOps.winnowSelect(d2, k, w).map(_._2).toSet
      assert(f1.intersect(f2).nonEmpty,
        s"trial $t: no shared fingerprint for planted overlap '$shared'")
    }
  }

  test("winnow operator summarizes winnowSelect on the fixture corpus") {
    import SparkTestBase.spark.implicits._
    val docs = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val got = TextOps.winnow(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toMap2
    val texts = docs.as[(Long, String)].collect()
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val sel = TextOps.winnowSelect(text, 5, 4)
      val g = math.max(text.codePoints().toArray.length - 4, 0)
      assert(got(id) == (g.toLong, sel.length.toLong, sel.map(_._2).sum,
        sel.map(_._1.toLong).sum), s"doc $id")
    }
  }

  private implicit class Tup5Ops(rows: Array[(Long, Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
