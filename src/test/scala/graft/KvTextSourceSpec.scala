package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The custom DSv2 connector's scale contract: filters and projections push
  * into the reader (visible in the scan description), unsupported predicates
  * stay as residuals without losing correctness, and split planning gives one
  * task per file. */
class KvTextSourceSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("kvsrc").toString
    import spark.implicits._
    Seq(("a", 1L), ("b", 20L), ("a", 300L), ("c", 4000L), ("b", 50000L))
      .toDF("k", "v")
      .select(concat_ws("\t", col("k"), col("v")).as("value"))
      .repartition(3)
      .write.mode("overwrite").text(d)
    d
  }

  private def load(): DataFrame =
    spark.read.format(classOf[graft.sources.KvTextSource].getName).load(dir)

  private def finalPlan(df: DataFrame): String = {
    df.collect(): Unit // AQE: finalize the plan before reading it
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("reads all rows with the declared schema") {
    val df = load()
    assert(df.schema.fieldNames.toSeq == Seq("key", "value"))
    assert(df.count() == 5)
    assert(df.agg(sum(col("value"))).head().getLong(0) == 54321L)
  }

  test("value predicate pushes into the scan") {
    val df = load().where(col("value") >= 300L)
    val plan = finalPlan(df)
    assert(plan.contains("PushedFilters: ") &&
      plan.contains("GreaterThanOrEqual(value,300)"),
      s"value filter not pushed:\n$plan")
    assert(df.count() == 3)
  }

  test("key equality pushes into the scan") {
    val df = load().where(col("key") === "a")
    assert(finalPlan(df).contains("EqualTo(key,a)"))
    assert(df.agg(sum(col("value"))).head().getLong(0) == 301L)
  }

  test("unsupported predicate stays residual and stays correct") {
    val df = load().where(col("key").startsWith("b"))
    val plan = finalPlan(df)
    // the connector must NOT claim the prefix predicate...
    assert(!plan.contains("PushedFilters: [StringStartsWith"),
      s"claimed a filter it cannot evaluate:\n$plan")
    // ...and Spark applies it post-scan
    assert(df.agg(sum(col("value"))).head().getLong(0) == 50020L)
  }

  test("column pruning reaches the reader") {
    val df = load().groupBy().agg(sum(col("value")).as("s"))
    val plan = finalPlan(df)
    assert(plan.contains("ReadSchema: value") &&
      !plan.contains("ReadSchema: key"),
      s"key column not pruned from the scan:\n$plan")
    assert(df.head().getLong(0) == 54321L)
  }

  test("split planning: one partition per data file") {
    val files = new java.io.File(dir).listFiles
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(files == 3)
    assert(load().rdd.getNumPartitions == files)
  }
}
