package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{SnapshotTable => ST}
import graft.sources.SnapshotTable.Snapshot

/** The snapshot table as a CDC stream (sources/SnapshotCdfSource): version
  * numbers are streaming offsets, each emitted row names one committed
  * version, and a foreachBatch consumer folds each version's O(delta)
  * change window into write-once epoch dirs. Pinned here: commit-by-commit
  * discovery, exactly-once folding across a kill/restart on the SAME
  * checkpoint (completed windows must not re-fold — write-once epoch dirs
  * + version offsets), pacing via maxVersionsPerTrigger, mid-history
  * starts, and the loud failure when a vacuum outruns a consumer's
  * frontier (a silently skipped window would corrupt every downstream
  * state). */
class SnapshotCdfStreamSpec extends SparkTestBase {

  private val fmt = classOf[graft.sources.SnapshotCdfSource].getName

  private def freshRoot(): java.io.File =
    Files.createTempDirectory("snapcdf").toFile

  private def writeKv(dir: String, from: Int, until: Int): Unit = {
    import spark.implicits._
    (from until until).map(i => (i, i)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
  }

  /** Consumer shared by the cases: folds every version in the batch into
    * a write-once epoch dir and records which versions each batch saw. */
  private def consumer(base: String, epochs: String,
      seen: scala.collection.mutable.ListBuffer[Seq[Int]])
      : (DataFrame, Long) => Unit = { (b, _) =>
    val vs = b.select("version").collect().map(_.getLong(0).toInt)
      .toSeq.sorted
    if (vs.nonEmpty) seen.synchronized { seen += vs }
    for (v <- vs) {
      val out = s"$epochs/v$v"
      if (!new java.io.File(out, "_SUCCESS").exists) {
        val feed =
          if (v == 1) ST.readVersion(spark, base, 1, "k")
            .withColumn("change", lit("insert"))
          else ST.readChanges(spark, base, v - 1, v, "k")
        feed.write.mode("overwrite").parquet(out)
      }
    }
  }

  private def netFold(epochs: String, versions: Seq[Int]): DataFrame = {
    val all = versions.map(v => spark.read.parquet(s"$epochs/v$v"))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    all.where(col("change") === "insert")
      .join(broadcast(all.where(col("change") === "delete").select("k")),
        Seq("k"), "left_anti")
  }

  test("commit-by-commit discovery; kill/restart on the same checkpoint " +
      "re-folds nothing and resumes at the version frontier") {
    val root = freshRoot()
    val base = s"$root/tbl"
    val epochs = s"$root/epochs"
    val cp = s"$root/cp"
    writeKv(s"$base/d1", 0, 100)
    writeKv(s"$base/d2", 100, 200)
    writeKv(s"$base/d3", 200, 300)
    val seen = scala.collection.mutable.ListBuffer.empty[Seq[Int]]
    def start() = spark.readStream.format(fmt).load(base)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch(consumer(base, epochs, seen))
      .start()
    // phase 1: two commits observed live, then STOP between batches
    val q1 = start()
    try {
      ST.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
      q1.processAllAvailable()
      ST.commit(spark, base, 2, Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(seen.toList == List(Seq(1), Seq(2)),
      s"live commits must arrive one batch each, got $seen")
    val mtimes = (1 to 2).map(v =>
      new java.io.File(s"$epochs/v$v/_SUCCESS").lastModified())
    // phase 2: commits land WHILE the consumer is down
    ST.deleteWhere(spark, base, "k", col("k") < 50) // v3
    ST.commit(spark, base, 4, ST.manifest(spark, base, 3)
      .copy(dataDirs = Seq(s"$base/d1", s"$base/d2", s"$base/d3"))) // v4
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.toList.flatten.sorted == Seq(1, 2, 3, 4),
      s"restart must fold exactly the missed versions, got $seen")
    assert((1 to 2).map(v =>
      new java.io.File(s"$epochs/v$v/_SUCCESS").lastModified()) == mtimes,
      "completed windows must NOT re-fold across a restart")
    // the consumer's net state equals the table head
    val net = netFold(epochs, 1 to 4)
    val head = ST.readVersion(spark, base, 4, "k")
    assert(net.count() == head.count() &&
      net.join(head, Seq("k"), "left_anti").isEmpty &&
      head.join(net, Seq("k"), "left_anti").isEmpty,
      "net-folded CDC state must equal the table head")
  }

  test("maxVersionsPerTrigger paces a backlog one version per batch; " +
      "startingVersion opens mid-history") {
    val root = freshRoot()
    val base = s"$root/tbl"
    writeKv(s"$base/d1", 0, 10)
    ST.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    writeKv(s"$base/d2", 10, 20)
    ST.commit(spark, base, 2, Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    ST.deleteWhere(spark, base, "k", col("k") === 5) // v3
    val seen = scala.collection.mutable.ListBuffer.empty[Seq[Int]]
    val q = spark.readStream.format(fmt)
      .option("maxVersionsPerTrigger", "1").load(base)
      .writeStream.option("checkpointLocation", s"$root/cp")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val vs = b.select("version").collect()
          .map(_.getLong(0).toInt).toSeq.sorted
        if (vs.nonEmpty) seen.synchronized { seen += vs }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.toList == List(Seq(1), Seq(2), Seq(3)),
      s"a 3-commit backlog under maxVersionsPerTrigger=1 must pace to " +
        s"three batches, got $seen")
    // mid-history start: only versions >= 3 emit
    val seen2 = scala.collection.mutable.ListBuffer.empty[Seq[Int]]
    val q2 = spark.readStream.format(fmt)
      .option("startingVersion", "3").load(base)
      .writeStream.option("checkpointLocation", s"$root/cp2")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val vs = b.select("version").collect()
          .map(_.getLong(0).toInt).toSeq.sorted
        if (vs.nonEmpty) seen2.synchronized { seen2 += vs }
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen2.toList == List(Seq(3)), seen2.toString)
  }

  test("startingRef opens at a named ref: a tag streams the versions " +
      "SINCE it, a branch streams the branch's own commits; combining " +
      "with startingVersion or naming a missing ref refuses") {
    val root = freshRoot()
    val base = s"$root/tbl"
    writeKv(s"$base/d1", 0, 10)
    ST.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    ST.createTag(spark, base, "rel", 1)
    writeKv(s"$base/d2", 10, 20)
    ST.commit(spark, base, 2, Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    ST.deleteWhere(spark, base, "k", col("k") === 5): Unit // v3
    def drain(opts: (String, String)*): List[Seq[Int]] = {
      val seen = scala.collection.mutable.ListBuffer.empty[Seq[Int]]
      val cp = Files.createTempDirectory("cdfref").toString
      val reader = opts.foldLeft(spark.readStream.format(fmt)) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(base)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: DataFrame, _: Long) =>
          val vs = b.select("version").collect()
            .map(_.getLong(0).toInt).toSeq.sorted
          if (vs.nonEmpty) seen.synchronized { seen += vs }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toList
    }
    // tag = "changes since the tagged version": v2 and v3 only
    assert(drain("startingRef" -> "rel",
      "maxVersionsPerTrigger" -> "1") == List(Seq(2), Seq(3)))
    // branch = the branch's own commits, none yet right after the fork
    ST.createBranch(spark, base, "wip")
    val bb = ST.branchBase(base, "wip")
    assert(drain("startingRef" -> "wip") == Nil)
    // a branch commit lands → the ref stream emits the branch version
    ST.deleteWhere(spark, bb, "k", col("k") === 7): Unit // bb v2
    assert(drain("startingRef" -> "wip") == List(Seq(2)))
    // refusals: ambiguous start, unknown ref
    intercept[Exception] {
      drain("startingRef" -> "rel", "startingVersion" -> "2")
    }
    intercept[Exception] { drain("startingRef" -> "nope") }
  }

  test("a vacuum past the consumer's frontier fails the stream loudly " +
      "instead of skipping the window") {
    val root = freshRoot()
    val base = s"$root/tbl"
    writeKv(s"$base/d1", 0, 10)
    ST.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    writeKv(s"$base/d2", 10, 20)
    ST.commit(spark, base, 2, Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    writeKv(s"$base/d3", 20, 30)
    ST.commit(spark, base, 3,
      Snapshot(Seq(s"$base/d1", s"$base/d2", s"$base/d3"), Nil))
    // retention drops v1..v2 — a fresh consumer starting below that is a
    // frontier violation, not a skippable gap
    ST.vacuum(spark, base, 3, 3)
    val q = spark.readStream.format(fmt)
      .option("startingVersion", "2").load(base)
      .writeStream.option("checkpointLocation", s"$root/cp")
      .foreachBatch((_: DataFrame, _: Long) => ())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(e).exists(m => m != null && m.contains("vacuumed")),
      s"expected the vacuumed-frontier refusal, got: ${causes(e)}")
  }
}
