package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Streaming-sink epoch replay detection matches a manifest dir against
  * the epoch's deterministic prefix. The match must be EXACT (the
  * unpartitioned dir) or tuple-suffixed (`prefix_p<hex>`) — a bare
  * startsWith let epoch 1's prefix claim epoch 12's dirs, so an
  * out-of-order replay (or manual epoch surgery) would treat an
  * uncommitted epoch as committed and silently drop its rows (r19
  * advice). */
class EpochDirSpec extends AnyFunSuite {
  private val p1 = "/tbl/_streamepoch_abc123_e1"
  private val p12 = "/tbl/_streamepoch_abc123_e12"

  test("epoch 1's prefix never claims epoch 12's dirs") {
    // epoch 12's final dirs, both shapes
    for (d <- Seq(p12, p12 + "_p00aa11bb22cc")) {
      assert(SnapshotStreamingWrite.isEpochDir(d, p12), d)
      assert(!SnapshotStreamingWrite.isEpochDir(d, p1),
        s"epoch-1 prefix must NOT match $d")
    }
    // epoch 1's own dirs still match
    assert(SnapshotStreamingWrite.isEpochDir(p1, p1))
    assert(SnapshotStreamingWrite.isEpochDir(p1 + "_pdeadbeef0123", p1))
    // a different query id never matches
    assert(!SnapshotStreamingWrite.isEpochDir(
      "/tbl/_streamepoch_def456_e1", p1))
    // non-epoch data dirs never match
    assert(!SnapshotStreamingWrite.isEpochDir("/tbl/d0", p1))
  }
}
