package graft

import org.apache.spark.sql.functions._

/** The Ed-Join claims that must hold by construction:
  * - the rarity-prefix + position blocking is LOSSLESS — the blocked join
  *   equals the O(n²) levenshtein join on the same universe;
  * - the recursive-CTE chain walk assigns every order exactly one depth,
  *   anchored at one chain head per customer.
  */
class EditDistanceJoinSpec extends SparkTestBase {

  test("editDistanceJoin equals the brute-force levenshtein join") {
    val docs = Tables(spark, sf, "documents")
    val blocked = queries.DedupQueries.editDistanceJoin(docs)
      .collect().toSeq.map(_.toString)

    val base = docs
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 48).as("s"))
      .where(length(col("s")) === 48 && col("s").rlike("^[\\x20-\\x7E]+$"))
    val brute = base.as("a").join(base.as("b"),
        col("a.lang") === col("b.lang")
          && col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")))
      .where(col("dist") <= 3)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.lang").as("lang"), col("dist").cast("long").as("dist"))
      .orderBy("doc_a", "doc_b")
      .collect().toSeq.map(_.toString)

    assert(blocked.nonEmpty, "fixture must contain near-dup prefixes")
    assert(blocked == brute, "blocking dropped or invented pairs")
  }

  test("q_recursive_cte covers every order exactly once") {
    val hist = SparkEntry.queries("q_recursive_cte")(spark, sf)
      .select(col("depth"), col("n_orders")).collect()
    val orders = Tables(spark, sf, "orders")
    assert(hist.map(_.getLong(1)).sum === orders.count(),
      "chain walk must assign each order exactly one depth")
    val anchors = hist.find(_.getLong(0) == 1L).map(_.getLong(1)).get
    assert(anchors === orders.select("o_custkey").distinct().count(),
      "depth-1 rows must be one chain head per customer")
  }
}
