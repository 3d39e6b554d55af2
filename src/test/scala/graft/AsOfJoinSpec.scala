package graft

import org.apache.spark.sql.functions._

/** The native as-of operator: equality with the union+window composition,
  * plan shape (AsOfJoinExec with one exchange+sort per side), and edge
  * semantics (left rows with no eligible right row keep nulls). */
class AsOfJoinSpec extends SparkTestBase {

  test("native as-of equals the union+window composition row-for-row") {
    val native = SparkEntry.queries("q_asof_native")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val composed = SparkEntry.queries("q_asof_join")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("plans as AsOfJoinExec with sorted, clustered children") {
    val df = SparkEntry.queries("q_asof_native")(spark, sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString()
    // AQE's toString appends the pre-adaptive plan; assert on the final one
    val p = full.split("== Initial Plan ==").head
    assert(p.contains("AsOfJoin "), s"strategy did not plan the operator:\n$p")
    // EnsureRequirements satisfied the declared requirements: a hash exchange
    // and sort on each side, nothing else
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected exactly one shuffle per side:\n$p")
    assert("Sort \\[(user_id|c_user)".r.findAllIn(p).size == 2,
      s"expected one sort per side:\n$p")
  }

  test("optimizer rule pushes left-side filters below the as-of node") {
    val df = SparkEntry.queries("q_asof_native")(spark, sf)
      .where(col("user_id") < 10 && col("click_id").isNotNull)
    val opt = df.queryExecution.optimizedPlan.toString()
    // user_id < 10 references only left output → must sit BELOW AsOfJoinPlan;
    // click_id is right-side output → must stay above.
    val asofIdx = opt.indexOf("AsOfJoinPlan")
    assert(asofIdx >= 0, opt)
    val below = opt.substring(asofIdx)
    assert(below.contains("user_id") && "(?s)< 10".r.findFirstIn(below).isDefined,
      s"left filter not pushed below the join:\n$opt")
    assert(!opt.substring(asofIdx).contains("isnotnull(click_id"),
      s"right-side filter wrongly pushed:\n$opt")
    // and pushed filters survive to the scan
    df.collect()
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val phys = df.queryExecution.executedPlan.toString()
    assert(phys.contains("LessThan(user_id,10)"),
      s"filter did not reach the parquet scan:\n$phys")
  }

  test("unmatched left rows carry nulls (left-outer as-of)") {
    val df = SparkEntry.queries("q_asof_native")(spark, sf)
    // purchases before any click of that user exist in the fixture
    assert(df.where(col("click_id").isNull).count() > 0)
    assert(df.where(col("gap_us") < 0).isEmpty)
  }
}
