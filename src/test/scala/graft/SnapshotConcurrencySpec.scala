package graft

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.Snapshot

/** Optimistic concurrency of snapshot commits: the version number is
  * claimed with the store's atomic create-if-absent, so two writers
  * racing for the same version can never silently clobber each other —
  * the loser either idempotently replays an identical snapshot or fails
  * with the committed-differently conflict, and the surviving manifest is
  * always EXACTLY one writer's content (the crc footer rejects any mix).
  */
class SnapshotConcurrencySpec extends SparkTestBase {

  private def freshBase(): String =
    Files.createTempDirectory("snapcc").toString

  private def writeNums(dir: String, from: Int, until: Int): Unit = {
    import spark.implicits._
    (from until until).toDF("k").write.mode("overwrite").parquet(dir)
  }

  test("sequential conflict: a writer staged against a stale head fails loudly, then retries at the next version") {
    val base = freshBase()
    writeNums(s"$base/d1", 0, 5)
    writeNums(s"$base/dA", 5, 9)
    writeNums(s"$base/dB", 9, 12)
    SnapshotTable.commit(spark, base, 1, Snapshot(Seq(s"$base/d1"), Nil))
    // writer A wins version 2
    SnapshotTable.commit(spark, base, 2,
      Snapshot(Seq(s"$base/d1", s"$base/dA"), Nil))
    // writer B, staged against v1, tries the same version: loud conflict
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commit(spark, base, 2,
        Snapshot(Seq(s"$base/d1", s"$base/dB"), Nil))
    }
    assert(e.getMessage.contains("already committed with different content"))
    // the optimistic retry: B re-reads the head and commits at v3
    SnapshotTable.commit(spark, base, 3,
      Snapshot(Seq(s"$base/d1", s"$base/dA", s"$base/dB"), Nil))
    assert(SnapshotTable.readVersion(spark, base, 2, "k").count() == 9)
    assert(SnapshotTable.readVersion(spark, base, 3, "k").count() == 12)
  }

  test("racing writers: exactly one snapshot survives intact, never a silent mix") {
    val base = freshBase()
    writeNums(s"$base/dX", 0, 4)
    writeNums(s"$base/dY", 4, 10)
    val ready = new CountDownLatch(2)
    val go = new CountDownLatch(1)
    @volatile var errX: Option[Throwable] = None
    @volatile var errY: Option[Throwable] = None
    def racer(dirs: Seq[String], set: Throwable => Unit) = new Thread(() => {
      ready.countDown(); go.await()
      try SnapshotTable.commit(spark, base, 1, Snapshot(dirs, Nil))
      catch { case t: Throwable => set(t) }
    })
    val tx = racer(Seq(s"$base/dX"), t => errX = Some(t))
    val ty = racer(Seq(s"$base/dY"), t => errY = Some(t))
    tx.start(); ty.start()
    ready.await(); go.countDown()
    tx.join(30000); ty.join(30000)
    // invariant: whatever the interleaving, the surviving manifest reads
    // VALIDLY (footer-checked) as exactly one racer's snapshot — or, if
    // both writers' bytes interleaved, the footer rejects it loudly; a
    // silent mix is the one impossible outcome
    val head = try Some(SnapshotTable.manifest(spark, base, 1)) catch {
      case _: IllegalArgumentException => None
    }
    head match {
      case Some(s) =>
        assert(s == Snapshot(Seq(s"$base/dX"), Nil) ||
          s == Snapshot(Seq(s"$base/dY"), Nil),
          s"manifest is a mix of both writers: $s")
        // the racer whose content lost must have seen the conflict (unless
        // its bytes ARE the survivor's — then it replayed idempotently)
        val loserErr = if (s.dataDirs == Seq(s"$base/dX")) errY else errX
        assert(loserErr.isDefined,
          "both racers claim success for different content")
      case None =>
        // interleaved partial — rejected loudly; a recommit repairs it
        assert(errX.isDefined || errY.isDefined)
    }
  }
}
