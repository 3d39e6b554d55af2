package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Incremental dedup semantics: batch docs classified against smaller-id
  * matches (stored corpus vs earlier batch), exact-verified — planted
  * duplicates land with the right canonical id and class, unique batch
  * docs stay `new`, and nothing outside the batch is ever emitted. */
class IncrementalDedupSpec extends SparkTestBase {

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, String)] = {
    import spark.implicits._
    DedupQueries.minhashIncremental(docs.toDF("doc_id", "text"),
        pmod(col("doc_id"), lit(5L)) === 0, 0.7)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
  }

  test("planted dups classify as dup_corpus / dup_batch; uniques stay new") {
    def doc(seed: Int): String =
      (1 to 12).map(i => s"w${seed}x$i").mkString(" ")
    val texts = (0 until 20).map(i => (i.toLong, doc(i))).toMap
    val corpus = texts +
      (10L -> texts(3L)) + // batch doc 10 == corpus doc 3
      (15L -> texts(5L)) + // batch doc 15 == batch doc 5 (earlier)
      (5L -> texts(5L)) // doc 5 stays unique among smaller ids
    val got = run(corpus.toSeq.sortBy(_._1))
    assert(got.keySet == Set(0L, 5L, 10L, 15L), s"non-batch ids leaked: $got")
    assert(got(0L) == (-1L, "new"))
    assert(got(5L) == (-1L, "new"))
    assert(got(10L) == (3L, "dup_corpus"))
    assert(got(15L) == (5L, "dup_batch"))
  }

  test("multiple smaller-id matches keep the smallest as canonical") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (2L, shared), (7L, shared), (10L, shared),
      (3L, "totally different words here that never collide with anything"))
    val got = run(docs)
    assert(got(10L) == (2L, "dup_corpus"))
  }
}
