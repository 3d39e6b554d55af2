package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Distributed prefix-sum sweep vs a global brute-force sweep: on random
  * interval sets (including intervals spanning several silent hours, the
  * carry-in case), the per-hour peaks must match a single sorted pass. */
class ConcurrencySpec extends SparkTestBase {

  private val H = 3600000000L

  private def model(iv: Seq[(Long, Long)]): Map[Long, Long] = {
    val pts = iv.flatMap { case (a, b) => Seq((a, 1L), (b + 1, -1L)) }
      .sortBy(identity)
    val peaks = scala.collection.mutable.Map.empty[Long, Long]
    var v = 0L
    var curBucket = Long.MinValue
    var carry = 0L
    var inMax = 0L
    def close(): Unit = if (curBucket != Long.MinValue)
      peaks(curBucket) = math.max(carry, inMax)
    pts.foreach { case (t, d) =>
      val b = t / H
      if (b != curBucket) { close(); curBucket = b; carry = v; inMax = v }
      v += d
      if (v > inMax) inMax = v
    }
    close()
    peaks.toMap
  }

  test("peakConcurrency matches the global sweep on random interval sets") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    (1 to 5).foreach { round =>
      val iv = Seq.fill(40) {
        val s0 = rng.nextInt(6).toLong * H / 2 + rng.nextInt(1000000).toLong
        val len = rng.nextInt(3).toLong * H + rng.nextInt(500000).toLong
        (s0, s0 + len)
      }
      val got = EventOps.peakConcurrency(
          iv.toDF("sess_start_us", "sess_end_us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model(iv), s"round $round: $iv")
    }
  }
}
