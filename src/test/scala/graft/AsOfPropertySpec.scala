package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Native as-of operator vs an in-memory model, for arbitrary keyed event
  * sets: per left row the match is the right row with the same key, max
  * ts ≤ left ts, ties broken by max id; nulls when none. Duplicate
  * timestamps on both sides and key ranges that only partially overlap are
  * generated deliberately. */
class AsOfPropertySpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  // small key/ts domains force collisions: same-key same-ts rows are common
  private val rowGen: Gen[(Long, Long)] =
    for { k <- Gen.chooseNum(0L, 3L); ts <- Gen.chooseNum(0L, 20L) } yield (k, ts)
  private val sideGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, rowGen))

  private def model(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Option[Long])] =
    left.map { case (lid, lk, lts) =>
      val m = right.filter(r => r._2 == lk && r._3 <= lts)
        .sortBy(r => (r._3, r._1)).lastOption
      (lid, lk, m.map(_._1))
    }.toSet

  /** forward model: min ts ≥ left ts, ties broken by MIN id. */
  private def modelFwd(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Option[Long])] =
    left.map { case (lid, lk, lts) =>
      val m = right.filter(r => r._2 == lk && r._3 >= lts)
        .sortBy(r => (r._3, r._1)).headOption
      (lid, lk, m.map(_._1))
    }.toSet

  private def run(ls: List[(Long, Long)], rs: List[(Long, Long)],
      fwd: Boolean): Boolean = {
    val left = ls.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
    val right = rs.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
    val lDf = left.toDF("lid", "lk", "lts")
    val rDf = right.toDF("rid", "rk", "rts")
    val got = AsOfJoin(lDf, rDf, lDf("lk"), rDf("rk"),
        lDf("lts"), rDf("rts"), rDf("rid"), forward = fwd)
      .select(col("lid"), col("lk"), col("rid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    got == (if (fwd) modelFwd(left, right) else model(left, right))
  }

  test("native as-of == model for arbitrary keyed event sets") {
    val prop = Prop.forAll(sideGen, sideGen) { (ls, rs) => run(ls, rs, fwd = false) }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.toString)
  }

  test("native FORWARD as-of == model (min ts >= left ts, min-id ties)") {
    val prop = Prop.forAll(sideGen, sideGen) { (ls, rs) => run(ls, rs, fwd = true) }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.toString)
  }
}
