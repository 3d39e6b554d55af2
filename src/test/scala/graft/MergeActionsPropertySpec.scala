package graft

import graft.sources.SnapshotTable
import graft.sources.SnapshotTable.{MatchedAction, MatchedDelete, MatchedUpdate, Snapshot}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Property armor for the generalized MERGE engine op: a seeded chain of
  * randomized merges (matched UPDATE/DELETE clause lists with t./s.
  * conditions, optional INSERT *, by-source UPDATE/DELETE lists) runs
  * against a per-row Scala simulation of SQL's first-match semantics.
  * Each round compares the FULL table against the simulated state, so a
  * clause applied out of order, a condition evaluated against a
  * post-update row, a drop that leaked across the match boundary, or a
  * lost/duplicated insert surfaces within one round. The chain also
  * exercises composition: every round's copy-on-write output is the next
  * round's stored state. */
class MergeActionsPropertySpec extends SparkTestBase {

  test("mergeIntoActions chain equals the per-row first-match simulation") {
    import spark.implicits._
    val base = Files.createTempDirectory("mergeprop").toString + "/t"
    for (i <- 0 until 4)
      (i * 5 until i * 5 + 5).map(k => (k.toLong, k * 10L, (k % 7).toLong))
        .toDF("k", "a", "b").write.parquet(s"$base/d$i")
    SnapshotTable.commit(spark, base, 1,
      Snapshot((0 until 4).map(i => s"$base/d$i"), Nil))
    var expected: Map[Long, (Long, Long)] =
      (0 until 20).map(k => k.toLong -> (k * 10L, (k % 7).toLong)).toMap
    val rnd = new scala.util.Random(42)

    for (round <- 1 to 8) {
      // source: a random slice of current keys plus a few fresh ones
      val existing = rnd.shuffle(expected.keys.toSeq)
        .take(rnd.nextInt(expected.size + 1))
      val fresh = (0 until 1 + rnd.nextInt(3))
        .map(i => 1000L * round + i)
      val srcRows = (existing ++ fresh).distinct
        .map(k => (k, rnd.nextInt(100).toLong, rnd.nextInt(10).toLong))
      val srcMap = srcRows.map(t => t._1 -> (t._2, t._3)).toMap
      val src = srcRows.toDF("k", "a", "b")

      // clause scenarios: each pairs the engine Columns with the exact
      // Scala simulation of its semantics over (t.a, t.b, s.a, s.b)
      val mv = rnd.nextInt(4)
      val matched: Seq[(Option[org.apache.spark.sql.Column], MatchedAction)] =
        mv match {
          case 0 => Nil
          case 1 => Seq(
            (Some(col("s.a") >= 50), MatchedDelete),
            (None, MatchedUpdate(Seq("a" -> (col("t.a") + col("s.a"))))))
          case 2 => Seq(
            (Some(col("t.b") % 2 === 0),
              MatchedUpdate(Seq("b" -> (col("t.b") + lit(1000L))))),
            (None, MatchedDelete))
          case _ => Seq(
            (None, MatchedUpdate(Seq("a" -> col("s.a"), "b" -> col("s.b")))))
        }
      // (ta, tb, sa, sb) => Some((a', b')) kept, None deleted
      def simMatched(ta: Long, tb: Long, sa: Long,
          sb: Long): Option[(Long, Long)] = mv match {
        case 0 => Some((ta, tb))
        case 1 => if (sa >= 50) None else Some((ta + sa, tb))
        case 2 => if (tb % 2 == 0) Some((ta, tb + 1000L)) else None
        case _ => Some((sa, sb))
      }
      // insert leg: absent / unconditional / conditional (`WHEN NOT
      // MATCHED AND cond THEN INSERT *` — source-scoped condition,
      // NULL-as-false first-match collapse)
      val iv = rnd.nextInt(3)
      val insert = iv > 0
      val insertCond: Option[org.apache.spark.sql.Column] =
        if (iv == 2) Some(col("a") % 2 === 0 && col("b") < 8) else None
      def simInsert(sa: Long, sb: Long): Boolean = iv match {
        case 1 => true
        case 2 => sa % 2 == 0 && sb < 8
        case _ => false
      }
      val bv = rnd.nextInt(3)
      val bySource: Seq[(Option[org.apache.spark.sql.Column], MatchedAction)] =
        bv match {
          case 0 => Nil
          case 1 => Seq(
            (Some(col("a") >= 100), MatchedUpdate(Seq("b" -> (col("b") + 7)))),
            (Some(col("b") >= 900), MatchedDelete))
          case _ => Seq((Some(col("b") < 3), MatchedDelete))
        }
      def simBySource(ta: Long, tb: Long): Option[(Long, Long)] = bv match {
        case 0 => Some((ta, tb))
        case 1 =>
          if (ta >= 100) Some((ta, tb + 7))
          else if (tb >= 900) None
          else Some((ta, tb))
        case _ => if (tb < 3) None else Some((ta, tb))
      }
      if (matched.isEmpty && !insert && bySource.isEmpty) {
        // no clauses — the engine refuses; skip the round (state unchanged)
      } else {
        val headBefore = SnapshotTable.headVersion(spark, base)
        SnapshotTable.mergeIntoActions(spark, base, "k", src,
          matched, insert, bySource, insertCond)
        // simulate: stored rows through the clause matrix, then inserts
        val afterRows = expected.flatMap { case (k, (ta, tb)) =>
          srcMap.get(k) match {
            case Some((sa, sb)) => simMatched(ta, tb, sa, sb).map(k -> _)
            case None => simBySource(ta, tb).map(k -> _)
          }
        }
        val inserts =
          if (!insert) Map.empty[Long, (Long, Long)]
          else srcMap.filter { case (k, (sa, sb)) =>
            !expected.contains(k) && simInsert(sa, sb) }
        expected = afterRows ++ inserts
        val head = SnapshotTable.headVersion(spark, base)
        // a no-op-scope merge without inserts legitimately skips the
        // commit; any change must land exactly one version
        assert(head == headBefore || head == headBefore + 1)
        val got = SnapshotTable.readVersion(spark, base, head, "k")
          .select("k", "a", "b").as[(Long, Long, Long)].collect()
          .map(t => t._1 -> (t._2, t._3)).toMap
        assert(got == expected,
          s"round $round (mv=$mv insert=$insert bv=$bv): engine state " +
            s"diverged from the simulation\n missing=${
              expected.keySet -- got.keySet}\n extra=${
              got.keySet -- expected.keySet}\n diff=${
              got.filter { case (k, v) => expected.get(k).exists(_ != v) }}")
      }
    }
    assert(expected.nonEmpty, "the chain should not have emptied the table")
  }
}
