package graft

import org.apache.spark.sql.functions._

/** Second relational slice: semantic assertions + the parallelism-invariance
  * axiom (SURVEY.md §5 — reference hashmap_test.c:9-15 sweeps thread counts;
  * here shuffle-partition counts) for the operators composed from multiple
  * shuffles (as-of, range, cogroup).
  */
class AdvancedQueriesSpec extends SparkTestBase {

  private def rows(name: String, parts: String = "8"): Seq[String] =
    withShufflePartitions(parts) {
      SparkEntry.queries(name)(spark, sf).collect().toSeq.map(_.toString)
    }

  test("as-of join: every matched click precedes its purchase") {
    val df = SparkEntry.queries("q_asof_join")(spark, sf)
    assert(df.count() > 0)
    assert(df.where(col("gap_us") < 0).isEmpty, "click after purchase")
    // unmatched purchases keep null click_id (left-as-of semantics)
    assert(df.where(col("click_id").isNull).count() > 0)
  }

  test("range join: counts are non-negative and bounded by user event count") {
    val df = SparkEntry.queries("q_range_join")(spark, sf)
    val ev = Tables(spark, sf, "events").count()
    assert(df.count() == ev, "one output row per event")
    assert(df.where(col("n_next_5min") < 0).isEmpty)
  }

  test("cogroup join: per-nation counts match the two group-bys") {
    val df = SparkEntry.queries("q_cogroup_join")(spark, sf)
    val nCust = Tables(spark, sf, "customer").count()
    val nSupp = Tables(spark, sf, "supplier").count()
    val sums = df.agg(sum("n_cust"), sum("n_supp")).head()
    assert(sums.getLong(0) == nCust && sums.getLong(1) == nSupp)
  }

  test("cube: grand total row equals table count") {
    val df = SparkEntry.queries("q_cube")(spark, sf)
    val total = df.where(col("gs") === 1 && col("gp") === 1)
      .select("n_orders").head().getLong(0)
    assert(total == Tables(spark, sf, "orders").count())
  }

  test("invariance: shuffle partitions 1 vs 8 for multi-shuffle operators") {
    for (q <- Seq("q_asof_join", "q_range_join", "q_cogroup_join")) {
      assert(rows(q, "1") == rows(q, "8"), s"$q not partition-invariant")
    }
  }

  test("multiformat roundtrip equals parquet-path result") {
    val viaCsvJson = SparkEntry.queries("q_multiformat")(spark, sf)
      .collect().toSeq.map(_.toString)
    val viaParquet = Tables(spark, sf, "nation")
      .join(broadcast(Tables(spark, sf, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_nation"))
      .orderBy("r_name").collect().toSeq.map(_.toString)
    assert(viaCsvJson == viaParquet)
  }
}
