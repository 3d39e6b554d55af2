package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Invariants of the greedy sequence-packing operator (TextOps.packBins):
  * conservation (every doc lands in exactly one bin), the budget bound
  * (a multi-doc bin never exceeds it; only a single oversized doc may),
  * greedy tightness (consecutive bins could not be merged), and
  * partitioning invariance (the result is a pure function of the data,
  * not of the input split).
  */
class PackBinsSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private val budget = 256L // small budget so sf0.001 yields many bins

  private lazy val bins =
    TextOps.packBins(docs, budget = budget).collect()

  test("conservation: n_docs sums to the corpus size") {
    assert(bins.map(_.getLong(3)).sum === docs.count())
  }

  test("budget bound: every multi-doc bin fits; oversized docs sit alone") {
    bins.foreach { r =>
      val (nDocs, tok) = (r.getLong(3), r.getLong(4))
      if (nDocs > 1) assert(tok <= budget, s"overfull bin $r")
    }
  }

  test("greedy tightness: merging adjacent bins would overflow the budget") {
    bins.groupBy(r => (r.getString(0), r.getLong(1))).foreach {
      case (_, rs) =>
        val byBin = rs.sortBy(_.getLong(2))
        byBin.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getLong(4) + b.getLong(4) > budget,
              s"bins ${a.getLong(2)} and ${b.getLong(2)} could merge")
          case _ =>
        }
    }
  }

  test("invariance: identical bins under different input partitioning") {
    val a = TextOps.packBins(docs.repartition(1), budget = budget)
    val b = TextOps.packBins(docs.repartition(7), budget = budget)
    assert(a.orderBy("lang", "shard", "bin").collect().toSeq ===
      b.orderBy("lang", "shard", "bin").collect().toSeq)
  }
}
