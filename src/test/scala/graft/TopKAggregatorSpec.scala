package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The typed Aggregator UDAF surface: bounded-memory top-k per key equals
  * the ranking-window form, registered and callable as a DataFrame udaf. */
class TopKAggregatorSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  test("udaf top-3 per customer == window top-3 (cents score, orderkey tiebreak)") {
    val topk = udaf(new TopKAggregator(3), ExpressionEncoder[(Long, Long)]())
    val orders = Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        graft.functions.Portable.cents(col("o_totalprice")).as("score"),
        col("o_orderkey"))
    // Aggregator orders by (score desc, id asc); mirror in the window.
    // NB ties on score are real in this data, so the id tiebreak matters.
    val viaAgg = orders
      .groupBy(col("o_custkey"))
      .agg(topk(col("score"), col("o_orderkey")).as("ids"))
      .select(col("o_custkey"), col("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("score").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .groupBy(col("o_custkey"))
      .agg(collect_list(struct(col("rn"), col("o_orderkey"))).as("l"))
      .as[(Long, Seq[(Int, Long)])].collect()
      .map { case (k, l) => k -> l.sortBy(_._1).map(_._2) }.toMap
    assert(viaAgg == viaWindow)
  }

  test("partial aggregation present: aggregator runs as ObjectHashAggregate") {
    val topk = udaf(new TopKAggregator(2), ExpressionEncoder[(Long, Long)]())
    val df = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(topk(graft.functions.Portable.cents(col("o_totalprice")),
        col("o_orderkey")).as("ids"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("partial_topkaggregator") || p.contains("partial_"),
      s"no partial aggregation:\n$p")
  }
}
