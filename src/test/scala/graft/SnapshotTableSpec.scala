package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.Snapshot

/** Contract of the snapshot-versioned table: manifests name immutable data
  * dirs, commits are refused for uncommitted dirs, deletes apply merge-on-read
  * without touching data files, and a missing manifest (crashed commit) leaves
  * the previous version as the readable head. */
class SnapshotTableSpec extends SparkTestBase {

  private def freshBase(): String =
    Files.createTempDirectory("snaptab").toString

  private def writeNums(dir: String, from: Int, until: Int): Unit = {
    import spark.implicits._
    (from until until).toDF("k").write.mode("overwrite").parquet(dir)
  }

  test("append snapshot shares prior files; old version is unaffected") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 10)
    writeNums(s"$base/d2", 10, 15)
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    SnapshotTable.commit(spark, base, 2,
      Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    assert(SnapshotTable.readVersion(spark, base, 1, "k").count() == 10)
    assert(SnapshotTable.readVersion(spark, base, 2, "k").count() == 15)
  }

  test("delete snapshot is merge-on-read; earlier versions keep the rows") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 10)
    writeNums(s"$base/del", 0, 3) // erase keys 0,1,2
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    SnapshotTable.commit(spark, base, 2,
      Snapshot(Seq(s"$base/d1"), Seq(s"$base/del")))
    val v2 = SnapshotTable.readVersion(spark, base, 2, "k")
    assert(v2.count() == 7)
    assert(v2.agg(min(col("k"))).head().getInt(0) == 3)
    // time travel to v1 still sees the erased rows
    assert(SnapshotTable.readVersion(spark, base, 1, "k").count() == 10)
  }

  test("deleteWhere commits a merge-on-read delete at head+1: matches " +
      "erased, data files untouched, history intact, stacking works") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 20)
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    val before = new java.io.File(s"$base/d1").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    val v2 = SnapshotTable.deleteWhere(spark, base, "k", col("k") % 3 === 0)
    assert(v2 == 2)
    assert(SnapshotTable.readVersion(spark, base, 2, "k")
      .collect().map(_.getInt(0)).sorted.toSeq ==
      (0 until 20).filter(_ % 3 != 0))
    // the data files were not rewritten (merge-on-read, O(matches))
    val after = new java.io.File(s"$base/d1").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "deleteWhere rewrote data files")
    // time travel: v1 keeps every row
    assert(SnapshotTable.readVersion(spark, base, 1, "k").count() == 20)
    // deletes STACK: a second delete appends to the delete set
    val v3 = SnapshotTable.deleteWhere(spark, base, "k", col("k") === 1)
    assert(v3 == 3)
    assert(SnapshotTable.readVersion(spark, base, 3, "k")
      .collect().map(_.getInt(0)).sorted.toSeq ==
      (0 until 20).filter(k => k % 3 != 0 && k != 1))
    // an empty match still commits a (replayable) version boundary
    val v4 = SnapshotTable.deleteWhere(spark, base, "k", col("k") > 999)
    assert(v4 == 4)
    assert(SnapshotTable.readVersion(spark, base, 4, "k").count() ==
      SnapshotTable.readVersion(spark, base, 3, "k").count())
    // empty table guard
    intercept[IllegalArgumentException] {
      SnapshotTable.deleteWhere(spark, freshBase(), "k", col("k") === 1)
    }
  }

  test("commit refuses a data dir without _SUCCESS") {
    val base = freshBase()
    Files.createDirectories(java.nio.file.Paths.get(s"$base/raw"))
    intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/raw"), Nil))
    }
  }

  test("crashed commit (no manifest) leaves the previous head readable") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 5)
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    // v2 was never committed: reading it must fail loudly...
    intercept[IllegalArgumentException] {
      SnapshotTable.readVersion(spark, base, 2, "k")
    }
    // ...and v1 stays fully readable.
    assert(SnapshotTable.readVersion(spark, base, 1, "k").count() == 5)
  }

  test("vacuum drops old manifests + orphan dirs, keeps shared/live dirs") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 10)
    writeNums(s"$base/d2", 10, 15)
    writeNums(s"$base/all", 0, 15) // the compaction rewrite
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    SnapshotTable.commit(spark, base, 2,
      Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    SnapshotTable.commit(spark, base, 3, Snapshot(Seq(s"$base/all"), Nil))
    val rep = SnapshotTable.vacuum(spark, base, 3, 3)
    assert(rep == SnapshotTable.VacuumReport(2, 2, 1))
    // orphaned data dirs are physically gone, the live dir is untouched
    assert(!new java.io.File(s"$base/d1").exists)
    assert(!new java.io.File(s"$base/d2").exists)
    assert(new java.io.File(s"$base/all").exists)
    // the surviving head reads its full content
    assert(SnapshotTable.readVersion(spark, base, 3, "k").count() == 15)
    // vacuumed versions fail with the ordinary missing-snapshot error
    intercept[IllegalArgumentException] {
      SnapshotTable.readVersion(spark, base, 1, "k")
    }
    // idempotent: a second vacuum finds nothing to collect
    assert(SnapshotTable.vacuum(spark, base, 3, 3) ==
      SnapshotTable.VacuumReport(0, 0, 1))
  }

  test("vacuum keeps a dir the surviving range still references") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 10)
    writeNums(s"$base/d2", 10, 15)
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    SnapshotTable.commit(spark, base, 2,
      Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    // v2 still references d1, so dropping v1 must delete NO dirs
    val rep = SnapshotTable.vacuum(spark, base, 2, 2)
    assert(rep == SnapshotTable.VacuumReport(1, 0, 2))
    assert(SnapshotTable.readVersion(spark, base, 2, "k").count() == 15)
  }

  test("vacuum canonicalizes dir spellings: a trailing-slash reference cannot orphan a live dir") {
    // the r10-advice latent bug: orphan-vs-live was decided by LEXICAL
    // string equality, so a dir recorded with a cosmetic path difference
    // (trailing slash here) in an old manifest read as "not in the live
    // set" and was physically deleted while the surviving manifest still
    // referenced it. Both sides now pass through fs.makeQualified.
    val base = freshBase()
    writeNums(s"$base/d1", 0, 10)
    // v1 names d1 with a trailing slash; v2 names the same dir bare
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1/"), Nil))
    SnapshotTable.commit(spark, base, 2, Snapshot(Seq(s"$base/d1"), Nil))
    val rep = SnapshotTable.vacuum(spark, base, 2, 2)
    // the old manifest dropped, but its differently-spelled dir collided
    // with the live set — nothing deleted, the head still reads
    assert(rep.manifestsRemoved == 1 && rep.dirsRemoved == 0,
      s"cosmetic spelling difference deleted a live dir: $rep")
    assert(new java.io.File(s"$base/d1").exists)
    assert(SnapshotTable.readVersion(spark, base, 2, "k").count() == 10)
  }

  test("partial manifest write is rejected by the crc footer") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 5)
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    // Simulate an object-store partial rename: truncate the committed
    // manifest mid-body. The reader must refuse it, not resurrect state.
    // Object stores have no checksum sidecars, so drop LocalFS's `.crc`
    // companion — otherwise ChecksumFileSystem rejects the read before the
    // engine's own footer validation (the path under test) ever runs.
    val resolved = java.nio.file.Paths.get(s"$base/_MANIFEST_v1")
    val sidecar = java.nio.file.Paths.get(s"$base/._MANIFEST_v1.crc")
    assert(Files.exists(resolved), s"no v1 manifest found under $base")
    Files.deleteIfExists(sidecar)
    val full = Files.readAllBytes(resolved)
    Files.write(resolved, java.util.Arrays.copyOfRange(full, 0, full.length / 2))
    val partial = intercept[IllegalArgumentException] {
      SnapshotTable.manifest(spark, base, 1)
    }
    assert(partial.getMessage.contains("partial/corrupt manifest"),
      s"rejection must come from the crc footer, got: ${partial.getMessage}")
    // An intact manifest (restored bytes) reads fine again.
    Files.write(resolved, full)
    assert(SnapshotTable.readVersion(spark, base, 1, "k").count() == 5)
  }

  test("pre-footer manifest is footer-upgraded by an identical recommit") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 5)
    // A manifest from before the crc footer existed: core lines only.
    Files.write(java.nio.file.Paths.get(s"$base/_MANIFEST_v1"),
      s"data=$base/d1\ndelete=\n".getBytes("UTF-8"))
    // Reading it directly is refused (no footer)...
    intercept[IllegalArgumentException] {
      SnapshotTable.manifest(spark, base, 1)
    }
    // ...but recommitting the SAME snapshot upgrades it in place,
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    assert(SnapshotTable.readVersion(spark, base, 1, "k").count() == 5)
    // while committed history stays immutable for different content.
    writeNums(s"$base/d2", 5, 8)
    intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, base, 1,
        Snapshot(Seq(s"$base/d1", s"$base/d2"), Nil))
    }
  }
}
