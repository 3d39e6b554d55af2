package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Planner-facing connector seams: IN-list pushdown reaching the reader,
  * reported statistics making a dimension-sized KV dir broadcastable, and
  * runtime (DPP-style) filters flowing into the scan.
  */
class KvConnectorPlanSpec extends SparkTestBase {

  private def writeKv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-kvplan").toString
    import spark.implicits._
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  private def kv(dir: String) =
    spark.read.format(classOf[graft.sources.KvTextSource].getName).load(dir)

  test("IN-list on key pushes into the scan and row-filters correctly") {
    val dir = writeKv(Seq("a\t1", "b\t2", "c\t3", "d\t4"))
    val q = kv(dir).where(col("key").isin("a", "c"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("In(key"),
      s"IN filter not pushed into the scan:\n$plan")
    assert(q.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 3L))
  }

  test("reported statistics let a small KV dir win the broadcast side") {
    val dir = writeKv(Seq("a\t1", "b\t2"))
    import spark.implicits._
    val big = (1L to 5000L).map(i => (s"${('a' + (i % 2).toInt).toChar}", i))
      .toDF("key", "x")
    val joined = big.join(kv(dir), "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"stats-bearing 2-row KV side was not broadcast:\n$plan")
    assert(joined.count() == 5000L)
  }

  test("runtime filter API: an In handed to the scan reaches the readers") {
    // exercise SupportsRuntimeFiltering.filter directly — the contract the
    // DPP machinery drives: filters arrive AFTER pushdown, BEFORE
    // createReaderFactory, and the readers must honor them
    val dir = writeKv(Seq("a\t1", "b\t2", "c\t3"))
    val builder = new graft.sources.KvScanBuilder(dir, 128L * 1024 * 1024)
    val scan = builder.build().asInstanceOf[graft.sources.KvScan]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("key", Array[Any]("b", "c"))))
    val factory = scan.toBatch.createReaderFactory()
    val rows = scan.toBatch.planInputPartitions().flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) buf += r.get().getLong(1)
      r.close()
      buf
    }
    assert(rows.sorted.toSeq == Seq(2L, 3L),
      "runtime In filter did not reach the partition readers")
  }

  test("end-to-end DPP: a dim-filtered join plants a runtime filter on " +
      "the v2 scan and results stay exact") {
    import spark.implicits._
    val dir = writeKv((0 until 200).map(i => s"k$i\t$i"))
    val dimDir = Files.createTempDirectory("graft-kvdim").toString
    (0 until 200).map(i => (s"k$i", s"seg${i % 10}"))
      .toDF("k", "seg").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("seg") === "seg3")
    val q = kv(dir).join(dim, col("key") === col("k"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"no runtime filter planted on the v2 scan:\n$plan")
    val r = q.collect().head
    val want = (0 until 200).filter(_ % 10 == 3)
    assert(r.getLong(0) == want.size.toLong && r.getLong(1) == want.sum.toLong,
      s"runtime-filtered join result wrong: $r")
  }

  test("LIMIT pushes into the scan; readers stop early; global limit exact") {
    val dir = writeKv((0 until 500).map(i => s"k$i\t$i"))
    val q = kv(dir).limit(7)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 7"),
      s"limit not pushed into the scan:\n$plan")
    assert(q.count() == 7L, "pushed limit changed the global row count")
    // reader-level contract: a wrapped reader emits at most k rows even
    // when its split holds far more
    val builder = new graft.sources.KvScanBuilder(dir, 128L * 1024 * 1024)
    assert(builder.pushLimit(3))
    val scan = builder.build().asInstanceOf[graft.sources.KvScan]
    val factory = scan.toBatch.createReaderFactory()
    scan.toBatch.planInputPartitions().foreach { p =>
      val r = factory.createReader(p)
      var n = 0
      while (r.next()) n += 1
      r.close()
      assert(n <= 3, s"reader emitted $n rows past the pushed limit")
    }
  }

  test("TOP-N pushes into the scan and equals the unpushed ordering") {
    val rng = new scala.util.Random(17)
    val vals = rng.shuffle((0 until 400).toList)
    val dir = writeKv(vals.zipWithIndex.map { case (v, i) => s"k$i\t$v" })
    val q = kv(dir).orderBy(col("value").desc, col("key").asc).limit(10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [value DESC, key ASC],10"),
      s"top-N not pushed into the scan:\n$plan")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = vals.zipWithIndex
      .map { case (v, i) => (s"k$i", v.toLong) }
      .sortBy { case (k, v) => (-v, k) }.take(10)
    assert(got == want, s"pushed top-N diverges: $got vs $want")
  }

  test("OFFSET pushes on a single-split scan and skips exactly k " +
      "post-filter rows") {
    // single file, known line order; the pushed filter keeps even values
    // only and OFFSET must count the SURVIVING rows (SQL: WHERE before
    // OFFSET), so skipping 2 of the evens 0,2,4,…,18 leaves 4,6,…,18
    val dir = writeKv((0 until 20).map(i => s"k$i\t$i"))
    val q = kv(dir).where(col("value") % 2 === 0).offset(2)
    val plan = q.queryExecution.executedPlan.toString
    // value % 2 is not a pushable predicate, so the residual Filter blocks
    // the push — use a pushable band instead and assert both shapes
    assert(!plan.contains("PushedOffset"),
      s"offset must not push past a residual filter:\n$plan")
    val q2 = kv(dir).where(col("value") >= 6L).offset(2)
    val plan2 = q2.queryExecution.executedPlan.toString
    assert(plan2.contains("PushedOffset: 2"),
      s"offset not pushed on a single-split scan:\n$plan2")
    assert(q2.collect().map(_.getLong(1)).toSeq == (8L until 20L).toSeq,
      "pushed offset skipped the wrong post-filter prefix")
  }

  test("OFFSET over a multi-split dir refuses; Spark's own Offset stays " +
      "exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kvplan").toString
    (0 until 100).map(i => s"k$i\t$i").toDF("value")
      .repartition(4).write.mode("overwrite").text(dir)
    val q = kv(dir).offset(30)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedOffset"),
      s"offset must refuse on a multi-split listing:\n$plan")
    assert(q.count() == 70L, "fallback offset changed the row count")
  }

  test("OFFSET composed under a LIMIT keeps the partial-limit plan and " +
      "exact paging semantics") {
    // Limit(Offset) only deletes the offset when the limit pushed FULLY;
    // this builder is always-partial, so Spark retains both operators and
    // pushes limit+offset as the per-split cap — page 2..4 in line order
    val dir = writeKv((0 until 50).map(i => s"k$i\t$i"))
    val q = kv(dir).offset(2).limit(3)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedOffset"),
      s"offset must not push under a partially-pushed limit:\n$plan")
    assert(plan.contains("PushedLimit: 5"),
      s"limit+offset cap not pushed:\n$plan")
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L))
  }

  test("OFFSET past the end of the split yields an empty scan") {
    val dir = writeKv(Seq("a\t1", "b\t2", "c\t3"))
    val builder = new graft.sources.KvScanBuilder(dir, 128L * 1024 * 1024)
    assert(builder.pushOffset(7))
    val scan = builder.build().asInstanceOf[graft.sources.KvScan]
    val factory = scan.toBatch.createReaderFactory()
    val rows = scan.toBatch.planInputPartitions().flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) buf += r.get().getLong(1)
      r.close()
      buf
    }
    assert(rows.isEmpty, s"offset beyond the split must emit nothing: " +
      rows.mkString(","))
  }

  test("TOP-N over an unsupported ordering refuses and falls back") {
    val dir = writeKv(Seq("a\t3", "b\t1", "c\t2"))
    // an expression ordering (value + 1) is not a bare column reference:
    // the builder must refuse so Spark runs the ordinary sort
    val q = kv(dir).orderBy((col("value") + 1).desc).limit(2)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedTopN"),
      s"non-column ordering must not push:\n$plan")
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(3L, 2L))
  }
}
