package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{SnapshotTable => ST}
import graft.sources.SnapshotTable.Snapshot

/** Property armor for the manifest statistics pipeline: randomized
  * multi-dir tables (empty dirs, null-bearing columns, duplicate keys
  * across dirs) drive `analyzeColumnStats` and the manifest-answered
  * aggregate path against direct recomputation from the data. The
  * invariants that must hold at any scale:
  *
  *  - per-dir colstats entries are EXACT (ndv / null counts per dir);
  *  - folded table stats: null counts exact, ndv an upper bound on the
  *    true table ndv clamped to the non-null row count (never below the
  *    true value — CBO must never over-shrink an estimate range);
  *  - a second ANALYZE is a no-op (no empty version boundary);
  *  - a manifest-answered (or fallen-back) MIN/MAX/COUNT aggregate is
  *    VALUE-IDENTICAL to the real scan — the two paths may differ in
  *    cost only, never in answers. */
class SnapshotStatsPropertySpec extends SparkTestBase {

  test("analyze_columns folds to exact/bounding table stats on " +
      "randomized multi-dir tables; re-analyze is a no-op") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      val base = Files.createTempDirectory("statsprop").toString + "/t"
      val nDirs = 1 + rnd.nextInt(4)
      val dirs = (0 until nDirs).map(i => s"$base/d$i")
      val perDir: Seq[Seq[(Long, String)]] = dirs.map { _ =>
        val n = rnd.nextInt(40) // 0 = empty dir, a legal state
        (0 until n).map { _ =>
          val k = rnd.nextInt(60).toLong
          val s = if (rnd.nextInt(4) == 0) null else s"g${rnd.nextInt(9)}"
          (k, s)
        }
      }
      for ((d, rows) <- dirs.zip(perDir))
        (Seq.empty[(Long, String)] ++ rows).toDF("k", "s")
          .write.parquet(d)
      ST.commit(spark, base, 1, Snapshot(dirs, Nil))
      val rep = ST.analyzeColumnStats(spark, base, Seq("k", "s"))
      assert(rep.entriesUncovered == 0, rep.toString)
      val head = ST.headVersion(spark, base)
      val snap = ST.manifest(spark, base, head)
      val all = perDir.flatten
      // row count: exact
      assert(ST.manifestRowCount(snap).contains(all.size.toLong),
        s"round $round: rowCount")
      // per-dir entries: exact against direct recomputation
      for ((d, rows) <- dirs.zip(perDir); c <- Seq("k", "s")) {
        val vals = rows.map(t => if (c == "k") t._1.toString else t._2)
        val expected = ST.ColStats(d, c,
          vals.filter(_ != null).distinct.size.toLong,
          vals.count(_ == null).toLong)
        // exact ndv/nulls ride beside the HLL sketch — compare modulo it
        assert(snap.colStats.map(_.copy(sketch = None)).contains(expected),
          s"round $round: missing/wrong per-dir entry $expected")
      }
      // folded stats: nulls exact; ndv tight (the sketch fold — HLL is
      // EXACT at these cardinalities via sparse mode, so allow ±5% but
      // expect equality in practice) and never above non-null rows
      val folded = ST.manifestColumnStats(snap)
      val trueNullsS = all.count(_._2 == null).toLong
      val nonNullS = all.size - trueNullsS
      val trueNdvS = all.map(_._2).filter(_ != null).distinct.size.toLong
      assert(folded("s")._2 == trueNullsS, s"round $round: s nulls")
      assert(math.abs(folded("s")._1 - math.max(1L, trueNdvS)) <=
        math.max(1L, trueNdvS / 20) &&
        folded("s")._1 <= math.max(1L, nonNullS),
        s"round $round: s ndv ${folded("s")._1} not within 5% of " +
          s"$trueNdvS (cap ${math.max(1L, nonNullS)})")
      val trueNdvK = all.map(_._1).distinct.size.toLong
      assert(folded("k")._2 == 0L &&
        math.abs(folded("k")._1 - math.max(1L, trueNdvK)) <=
          math.max(1L, trueNdvK / 20) &&
        folded("k")._1 <= math.max(1L, all.size.toLong),
        s"round $round: k ndv ${folded("k")._1} not within 5% of " +
          s"$trueNdvK")
      // idempotence: nothing left to scan, no empty version boundary
      val again = ST.analyzeColumnStats(spark, base, Seq("k", "s"))
      assert(again == ST.AnalyzeColsReport(head, 0, 0), again.toString)
      assert(ST.headVersion(spark, base) == head)
    }
  }

  test("manifest-answered aggregates are value-identical to the real " +
      "scan on randomized tables (and the metadata path does engage)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val root = Files.createTempDirectory("statsprop").toString
    spark.conf.set("spark.sql.catalog.statsprop",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.statsprop.root", root)
    var metaHits = 0
    for (round <- 1 to 4) {
      val tbl = s"t$round"
      val base = s"$root/$tbl"
      val nDirs = 1 + rnd.nextInt(3)
      val dirs = (0 until nDirs).map(i => s"$base/d$i")
      for (d <- dirs) {
        val n = rnd.nextInt(30) // 0 = empty dir
        (Seq.empty[(Long, String, java.sql.Date)] ++ (0 until n).map { _ =>
          (rnd.nextInt(1000).toLong,
            if (rnd.nextInt(6) == 0) null else s"v${rnd.nextInt(20)}",
            java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay(18000L + rnd.nextInt(900))))
        }).toDF("k", "s", "d").write.parquet(d)
      }
      ST.commit(spark, base, 1, Snapshot(dirs, Nil,
        bounds = Seq("k", "s", "d")
          .flatMap(c => ST.computeBounds(spark, dirs, c))))
      ST.analyzeColumnStats(spark, base, Seq("s")): Unit
      val q = spark.sql(
        s"""SELECT MIN(k) AS a, MAX(k) AS b, MIN(s) AS c, MAX(s) AS d,
           |  MIN(d) AS e, MAX(d) AS f, COUNT(*) AS g, COUNT(s) AS h
           |FROM statsprop.`$tbl`""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      if (plan.contains("ManifestAggregate")) metaHits += 1
      val got = q.head
      val exp = spark.read.parquet(dirs: _*)
        .agg(min("k"), max("k"), min("s"), max("s"), min("d"), max("d"),
          count(lit(1)), count(col("s"))).head
      for (i <- 0 until 8)
        assert(got.get(i) == exp.get(i),
          s"round $round col $i: metadata answer ${got.get(i)} != " +
            s"scan answer ${exp.get(i)}\n$plan")
    }
    // the equality above must not pass vacuously: the metadata path has
    // to have engaged on at least one randomized round
    assert(metaHits >= 1, "ManifestAggregate never engaged in 4 rounds")
  }
}
