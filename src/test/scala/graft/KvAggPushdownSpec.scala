package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** DSv2 aggregate pushdown: the partial contract (per-split per-key rows
  * cross the boundary instead of raw lines), its interaction with pushed
  * filters, and the fallbacks for shapes the source refuses.
  */
class KvAggPushdownSpec extends SparkTestBase {

  private def writeKv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-kvagg").toString
    import spark.implicits._
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  private def kv(dir: String) =
    spark.read.format(classOf[graft.sources.KvTextSource].getName).load(dir)

  private def pushedAgg(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("PushedAggregation")

  test("grouped count/sum/min/max push down and match the row-scan answer") {
    val dir = writeKv(Seq(
      "a\t5", "a\t7", "b\t1", "b\t-3", "b\t10", "c\t0"))
    val q = kv(dir).groupBy("key")
      .agg(count(lit(1)).as("n"), sum("value").as("s"),
        min("value").as("mn"), max("value").as("mx"))
    assert(pushedAgg(q), "aggregation was not pushed into the scan:\n" +
      q.queryExecution.executedPlan.toString)
    val got = q.collect().map(_.toString).sorted.toSeq
    assert(got == Seq("[a,2,12,5,7]", "[b,3,8,-3,10]", "[c,1,0,0,0]"))
  }

  test("global (ungrouped) aggregate pushes down") {
    val dir = writeKv(Seq("x\t4", "y\t6", "z\t-1"))
    val q = kv(dir).agg(count(lit(1)).as("n"), sum("value").as("s"))
    assert(pushedAgg(q))
    assert(q.collect().head.toString == "[3,9]")
  }

  test("pushed filters apply BEFORE the pushed aggregation") {
    val dir = writeKv(Seq("a\t5", "a\t50", "b\t70", "b\t2"))
    val q = kv(dir).where(col("value") >= 10L).groupBy("key")
      .agg(count(lit(1)).as("n"), max("value").as("mx"))
    assert(pushedAgg(q))
    assert(q.collect().map(_.toString).sorted.toSeq ==
      Seq("[a,1,50]", "[b,1,70]"))
  }

  test("sum(DISTINCT) is refused and falls back to the row scan, correctly") {
    val dir = writeKv(Seq("a\t5", "a\t5", "a\t3"))
    val q = kv(dir).groupBy("key").agg(sum_distinct(col("value")).as("sd"))
    assert(!pushedAgg(q), "distinct aggregate must not push down")
    assert(q.collect().head.toString == "[a,8]")
  }

  test("avg falls back (not a supported pushdown) and stays correct") {
    val dir = writeKv(Seq("a\t4", "a\t6"))
    val q = kv(dir).groupBy("key").agg(avg("value").as("a"))
    assert(q.collect().head.toString == "[a,5.0]")
  }
}
