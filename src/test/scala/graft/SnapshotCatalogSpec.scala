package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{SnapshotTable => ST}
import graft.sources.SnapshotTable.Snapshot

/** SQL over snapshot tables (sources/SnapshotCatalog): `VERSION AS OF`
  * and `TIMESTAMP AS OF` resolve through the catalog to the version's
  * manifest and plan Spark's own parquet scan over exactly that
  * version's dirs — with the manifest-carried schema, so time travel
  * keeps each version's shape through evolution. Refusals pinned: delete-
  * carrying versions (a pure scan cannot apply key masks), DDL/writes
  * (read-only), unknown tables. */
class SnapshotCatalogSpec extends SparkTestBase {

  // one catalog NAME per case: Spark instantiates a catalog once per name
  // and caches the instance, so a later conf change to `root` under the
  // same name would be ignored — per-name isolation is the test-side fix
  // (production configures the name once)
  private def setupCatalog(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  private def writeKv(dir: String, from: Int, until: Int): Unit = {
    import spark.implicits._
    (from until until).map(i => (i, i)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
  }

  test("VERSION AS OF and TIMESTAMP AS OF read the version's own data " +
      "and schema; head read follows the latest commit") {
    val root = Files.createTempDirectory("snapcat").toString
    setupCatalog("snapcat1", root)
    val base = s"$root/tbl"
    writeKv(s"$base/d1", 0, 10)
    writeKv(s"$base/d2", 10, 30)
    ST.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    ST.commit(spark, base, 2, Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    assert(new java.io.File(base, "_MANIFEST_v1").setLastModified(1000000L))
    assert(new java.io.File(base, "_MANIFEST_v2").setLastModified(2000000L))
    assert(spark.sql("SELECT COUNT(*) FROM snapcat1.tbl VERSION AS OF 1")
      .head().getLong(0) == 10)
    assert(spark.sql("SELECT COUNT(*) FROM snapcat1.tbl").head()
      .getLong(0) == 30, "an unqualified read must follow the head")
    // 1 500 000 ms = 1970-01-01 00:25:00 UTC — between the two commits
    assert(spark.sql("SELECT COUNT(*) FROM snapcat1.tbl " +
      "TIMESTAMP AS OF '1970-01-01 00:25:00'").head().getLong(0) == 10)
    // filters push into the parquet scan through the catalog path —
    // value AND plan (the whole point of serving Spark's own parquet
    // table is that the planner features apply unchanged)
    val q = spark.sql(
      "SELECT SUM(v) FROM snapcat1.tbl VERSION AS OF 2 WHERE k >= 25")
    assert(q.head().getLong(0) == (25 until 30).sum)
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("GreaterThanOrEqual(k,25)") &&
      plan.contains("PushedFilters"),
      s"catalog scan did not push the filter:\n$plan")
  }

  test("time travel keeps each version's OWN schema through evolution") {
    val root = Files.createTempDirectory("snapcat").toString
    setupCatalog("snapcat2", root)
    val base = s"$root/tbl"
    writeKv(s"$base/d1", 0, 10)
    ST.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    ST.evolveAddColumns(spark, base, "`w` BIGINT")
    assert(spark.sql("SELECT * FROM snapcat2.tbl VERSION AS OF 1")
      .columns.toSeq == Seq("k", "v"))
    val head = spark.sql("SELECT * FROM snapcat2.tbl")
    assert(head.columns.toSeq == Seq("k", "v", "w") &&
      head.where(col("w").isNull).count() == 10,
      "pre-evolution dirs must read the evolved column as NULL via SQL")
  }

  test("the history metadata table lists surviving versions with their " +
      "manifest shape; vacuumed versions drop; unknown nested names refuse") {
    val root = Files.createTempDirectory("snapcat").toString
    setupCatalog("snapcat4", root)
    val base = s"$root/tbl"
    writeKv(s"$base/d1", 0, 10)
    writeKv(s"$base/d2", 10, 30)
    ST.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    ST.commit(spark, base, 2, Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    ST.evolveAddColumns(spark, base, "`w` BIGINT")
    val h = spark.sql("SELECT version, n_data_dirs, n_delete_dirs, " +
      "evolved FROM snapcat4.tbl.history ORDER BY version")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getBoolean(3))).toSeq
    assert(h == Seq((1, 1, 0, false), (2, 2, 0, false), (3, 2, 0, true)), h)
    // commit_ms is the manifest mtime — versionAsOf's clock
    val ms = spark.sql(
      "SELECT commit_ms FROM snapcat4.tbl.history WHERE version = 1")
      .head().getLong(0)
    assert(ms == new java.io.File(base, "_MANIFEST_v1").lastModified)
    // vacuumed versions are absent, not zero-row phantoms
    ST.vacuum(spark, base, 2, 3)
    assert(spark.sql("SELECT version FROM snapcat4.tbl.history")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    // n_rows is the countRows metadata answer: NULL for uncounted
    // versions, the sum for fully-counted ones — history never scans
    assert(spark.sql(
      "SELECT n_rows FROM snapcat4.tbl.history WHERE version = 2")
      .head().isNullAt(0))
    ST.commit(spark, base, 4,
      ST.manifest(spark, base, 3).copy(rowCounts =
        Map(s"$base/d1" -> 10L, s"$base/d2" -> 20L)))
    assert(spark.sql(
      "SELECT n_rows FROM snapcat4.tbl.history WHERE version = 4")
      .head().getLong(0) == 30L)
    intercept[Exception] {
      spark.sql("SELECT * FROM snapcat4.tbl.nope").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM snapcat4.missing.history").collect()
    }
  }

  test("SHOW TABLES lists only dirs with committed snapshots") {
    val root = Files.createTempDirectory("snapcat").toString
    setupCatalog("snapcat5", root)
    writeKv(s"$root/committed/d1", 0, 5)
    ST.commit(spark, s"$root/committed", 1,
      Snapshot(Seq(s"$root/committed/d1"), Nil))
    // a dir with data but NO manifest is not a table
    writeKv(s"$root/uncommitted/d1", 0, 5)
    val listed = spark.sql("SHOW TABLES IN snapcat5")
      .select("tableName").collect().map(_.getString(0)).toSeq
    assert(listed == Seq("committed"), listed.toString)
  }

  test("delete-carrying versions, DDL, and unknown tables refuse loudly") {
    val root = Files.createTempDirectory("snapcat").toString
    setupCatalog("snapcat3", root)
    val base = s"$root/tbl"
    writeKv(s"$base/d1", 0, 10)
    ST.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    ST.deleteWhere(spark, base, "k", col("k") === 3) // v2 carries deletes
    val e = intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM snapcat3.tbl").collect()
    }
    assert(e.getMessage.contains("delete files"), e.getMessage)
    // v1 (pre-delete) still reads
    assert(spark.sql("SELECT COUNT(*) FROM snapcat3.tbl VERSION AS OF 1")
      .head().getLong(0) == 10)
    // compaction folds the delete and SQL reads resume at the head
    ST.compact(spark, base, "k")
    assert(spark.sql("SELECT COUNT(*) FROM snapcat3.tbl").head()
      .getLong(0) == 9)
    intercept[Exception] {
      spark.sql("DROP TABLE snapcat3.tbl")
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM snapcat3.nope").collect()
    }
  }
}
