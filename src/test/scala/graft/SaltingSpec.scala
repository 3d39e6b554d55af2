package graft

import graft.operators.Salting
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Salted top-k equals the direct single-window top-k (SURVEY §7.1 slice 4:
  * skew hygiene for zipfian keys). */
class SaltingSpec extends SparkTestBase {

  test("salted top-3 per customer == direct window top-3") {
    val orders = Tables(spark, sf, "orders")
    val order = Seq(col("o_totalprice").desc, col("o_orderkey"))
    val salted = Salting.topKByKey(orders, col("o_custkey"), order, k = 3,
        nSalts = 8, saltOn = col("o_orderkey"))
      .select("o_custkey", "o_orderkey")
      .collect().map(_.toString).sorted.toSeq
    val w = Window.partitionBy(col("o_custkey")).orderBy(order: _*)
    val direct = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == direct)
  }

  test("salted top-k is invariant to salt count") {
    val orders = Tables(spark, sf, "orders")
    val order = Seq(col("o_totalprice").desc, col("o_orderkey"))
    def run(n: Int) = Salting.topKByKey(orders, col("o_custkey"), order, 3,
      n, col("o_orderkey")).select("o_custkey", "o_orderkey")
      .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(32))
  }
}
