package graft.sources

import org.apache.spark.sql.connector.read.InputPartition

/** Split-planning arithmetic guards (r12 ADVICE): the ceil-div used to be
  * the additive form `(len + max - 1) / max`, which wraps NEGATIVE when
  * `maxSplitBytes` is huge — estimateStatistics passes Long.MaxValue — and
  * only the `math.max(1, _)` clamp accidentally rescued it. These pins make
  * the overflow-safe form load-bearing rather than lucky.
  */
class KvSplitSpec extends graft.SparkTestBase {

  private def write(dir: java.nio.file.Path, name: String,
      bytes: Int): Unit =
    java.nio.file.Files.write(dir.resolve(name), Array.fill(bytes)('x'.toByte))

  private def ranges(ps: Array[InputPartition]): Seq[(Long, Long)] =
    ps.map { p =>
      val kp = p.asInstanceOf[KvInputPartition]
      (kp.start, kp.end)
    }.toSeq

  test("planSplits with maxSplitBytes=Long.MaxValue yields one full-file " +
      "split (no additive-ceil-div overflow)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-split")
    write(dir, "a.txt", 1000)
    val ps = KvTextSource.planSplits(dir.toString, Long.MaxValue)
    assert(ranges(ps) == Seq((0L, 1000L)), s"got ${ranges(ps)}")
  }

  test("planSplits covers the file exactly, in order, for small split sizes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-split2")
    write(dir, "a.txt", 1000)
    for (max <- Seq(1L, 7L, 999L, 1000L, 1001L)) {
      val rs = ranges(KvTextSource.planSplits(dir.toString, max))
      assert(rs.head._1 == 0L && rs.last._2 == 1000L, s"max=$max got $rs")
      rs.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2, s"gap at max=$max: $rs")
        case _ =>
      }
      assert(rs.forall { case (s, e) => e - s <= max && e > s },
        s"bad range at max=$max: $rs")
      val expected = 1000L / max + (if (1000L % max == 0L) 0L else 1L)
      assert(rs.size == expected, s"max=$max got ${rs.size} splits")
    }
  }

  test("planSplits emits a single empty split for an empty file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-split3")
    write(dir, "a.txt", 0)
    val rs = ranges(KvTextSource.planSplits(dir.toString, 128L))
    assert(rs == Seq((0L, 0L)), s"got $rs")
  }
}
