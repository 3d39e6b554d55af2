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
    // a plain projection (no aggregate — sum(value) now pushes the WHOLE
    // aggregate into the scan, see KvAggPushdownSpec) must prune the key
    // column out of the row reader
    val df = load().select(col("value"))
    val plan = finalPlan(df)
    assert(plan.contains("ReadSchema: value") &&
      !plan.contains("ReadSchema: key"),
      s"key column not pruned from the scan:\n$plan")
    assert(df.collect().map(_.getLong(0)).sum == 54321L)
  }

  test("split planning: one partition per data file at the default size") {
    val files = new java.io.File(dir).listFiles
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(files == 3)
    assert(load().rdd.getNumPartitions == files)
  }

  test("offset-range splits: forced mid-line boundaries lose no rows") {
    // tiny maxSplitBytes puts range boundaries inside lines; the
    // TextInputFormat protocol must still read every line exactly once
    val whole = load().collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq.sorted
    for (split <- Seq("1", "2", "3", "5", "7", "64")) {
      val df = spark.read
        .format(classOf[graft.sources.KvTextSource].getName)
        .option("maxSplitBytes", split).load(dir)
      val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq.sorted
      assert(got == whole, s"split=$split lost or duplicated rows")
    }
    val tiny = spark.read
      .format(classOf[graft.sources.KvTextSource].getName)
      .option("maxSplitBytes", "4").load(dir)
    assert(tiny.rdd.getNumPartitions > 3,
      "tiny split size did not fan one file across ranges")
  }

  test("offset-range splits handle a file without a trailing newline") {
    val d = Files.createTempDirectory("kvnoeol").toString
    // hand-written file: last line unterminated
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "data.kv"),
      "a\t1\nbb\t22\nccc\t333".getBytes("UTF-8"))
    for (split <- Seq("1", "4", "1024")) {
      val got = spark.read
        .format(classOf[graft.sources.KvTextSource].getName)
        .option("maxSplitBytes", split).load(d)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(got == Seq(("a", 1L), ("bb", 22L), ("ccc", 333L)),
        s"split=$split: $got")
    }
  }

  test("mode=dropmalformed skips corrupt lines; failfast (default) " +
      "throws; unknown modes refuse") {
    val d = Files.createTempDirectory("kvmode").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "data.kv"),
      ("a\t1\nno-tab-line\nb\t2\nc\tnotanumber\nd\t\ne\t-\nf\t3\n")
        .getBytes("UTF-8"))
    val fmt = classOf[graft.sources.KvTextSource].getName
    // default: loud stop on the first malformed line
    val e = intercept[Exception] {
      spark.read.format(fmt).load(d).collect()
    }
    assert(e.getMessage != null)
    // opted-in drops: exactly the well-formed rows survive, across split
    // sizes (a malformed line at a split boundary must not double-count
    // or resurrect)
    for (split <- Seq("1", "8", "1024")) {
      val got = spark.read.format(fmt).option("mode", "dropmalformed")
        .option("maxSplitBytes", split).load(d)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(got == Seq(("a", 1L), ("b", 2L), ("f", 3L)),
        s"split=$split: $got")
    }
    // aggregate pushdown disabled under dropmalformed (the agg readers
    // have no drop path) — the aggregate still answers, via row readers
    val agg = spark.read.format(fmt).option("mode", "dropmalformed")
      .load(d).groupBy().count()
    assert(agg.head.getLong(0) == 3)
    assert(!agg.queryExecution.executedPlan.toString
      .contains("PushedAggregation: [COUNT"),
      "dropmalformed must not push aggregates into the dropless readers")
    intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("mode", "permissive").load(d).collect()
    }
    // the drop metric is declared on the scan (visible in the SQL UI)
    val scan = new graft.sources.KvTable(d).newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("mode", "dropmalformed"))).build()
    assert(scan.supportedCustomMetrics().map(_.name())
      .contains("kvMalformedDropped"))
  }

  test("SQL DDL: CREATE TABLE ... USING resolves the provider through " +
      "the session catalog; SELECT pushes down; INSERT INTO commits " +
      "through the 2PC write; DROP leaves the external data intact") {
    val d = Files.createTempDirectory("kvsql").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "data.kv"),
      "a\t1\nb\t2\n".getBytes("UTF-8"))
    spark.sql("DROP TABLE IF EXISTS kvsql_t")
    spark.sql("CREATE TABLE kvsql_t " +
      s"USING ${classOf[graft.sources.KvTextSource].getName} " +
      s"OPTIONS (path '$d')")
    val q = spark.sql("SELECT key, value FROM kvsql_t WHERE value >= 2")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 2L)))
    assert(q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
      .contains("GreaterThanOrEqual(value,2)"),
      "SQL read must push the predicate into the v2 scan")
    spark.sql("INSERT INTO kvsql_t VALUES ('c', 3)")
    assert(spark.sql("SELECT SUM(value) FROM kvsql_t").head.getLong(0) == 6,
      "INSERT INTO must land through the connector's batch write")
    spark.sql("DROP TABLE kvsql_t")
    // external table: the data outlives the catalog entry
    assert(spark.read.format(classOf[graft.sources.KvTextSource].getName)
      .load(d).count() == 3)
  }
}
