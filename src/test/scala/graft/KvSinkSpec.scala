package graft

import graft.operators.KvSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KvSink.diff — CDC snapshot diff, the inverse of upsert (SURVEY §1.3:
  * the reference store's only mutation is MapPut overwrite; diff recovers
  * the change feed between two immutable snapshot versions). */
class KvSinkSpec extends SparkTestBase {

  import spark.implicits._

  private def snap(rows: (Long, String)*): DataFrame =
    rows.toDF("key", "value")

  /** Replay a diff onto prev: upsert the I/U rows, drop the D keys. */
  private def apply(prev: DataFrame, d: DataFrame): DataFrame = {
    val iu = d.where(col("op") =!= "D").select(col("key"), col("new_value").as("value"))
    val del = d.where(col("op") === "D").select("key")
    KvSink.upsert(prev, iu).join(del, Seq("key"), "left_anti")
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("diff classifies I/U/D and drops unchanged keys") {
    val prev = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val next = snap(2L -> "b", 3L -> "x", 4L -> "d")
    val d = KvSink.diff(prev, next)
      .select("key", "op", "old_value", "new_value")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).sortBy(_._1).toSeq
    assert(d == Seq(
      (1L, "D", Some("a"), None),
      (3L, "U", Some("c"), Some("x")),
      (4L, "I", None, Some("d"))))
  }

  test("diff(x, x) is empty") {
    val x = snap(1L -> "a", 2L -> "b")
    assert(KvSink.diff(x, x).isEmpty)
  }

  test("NULL values are real values, not inserts/deletes") {
    val prev = snap(1L -> "a", 2L -> "b").withColumn("value",
      when(col("key") === 1L, lit(null: String)).otherwise(col("value")))
    val next = snap(1L -> "a", 2L -> "b")
    val d = KvSink.diff(prev, next).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // key 1: null -> "a" is an UPDATE (membership by marker, not nullity)
    assert(d == Seq((1L, "U")))
  }

  test("reconstruction law: apply(prev, diff(prev, next)) == next") {
    val prev = snap(1L -> "a", 2L -> "b", 3L -> "c", 5L -> "e")
    val next = snap(2L -> "b", 3L -> "x", 4L -> "d", 5L -> "e")
    assert(sorted(apply(prev, KvSink.diff(prev, next))) == sorted(next))
  }

  test("diff rejects non-2-column snapshots") {
    val bad = snap(1L -> "a").withColumn("extra", lit(1))
    intercept[IllegalArgumentException](KvSink.diff(bad, snap(1L -> "a")))
    intercept[IllegalArgumentException](KvSink.diff(snap(1L -> "a"), bad))
  }

  test("applyChanges: MERGE law on random snapshot pairs") {
    val rng = new scala.util.Random(83)
    for (_ <- 1 to 20) {
      def randSnap() = snap((1L to 12L).flatMap { k =>
        if (rng.nextBoolean()) Some(k -> ("v" + rng.nextInt(3))) else None
      }: _*)
      val prev = randSnap()
      val next = randSnap()
      val changes = KvSink.diff(prev, next)
        .select(col("key"), col("op"), col("new_value"))
      assert(sorted(KvSink.applyChanges(prev, changes)) == sorted(next))
    }
  }

  test("applyChanges fails loudly on corrupt feeds") {
    val prev = snap(1L -> "a", 2L -> "b")
    def changes(rows: (Long, String, String)*): DataFrame =
      rows.toDF("key", "op", "value")
    // insert for a present key
    intercept[Exception] {
      KvSink.applyChanges(prev, changes((1L, "I", "x"))).collect()
    }
    // update for an absent key
    intercept[Exception] {
      KvSink.applyChanges(prev, changes((9L, "U", "x"))).collect()
    }
    // delete for an absent key
    intercept[Exception] {
      KvSink.applyChanges(prev, changes((9L, "D", null))).collect()
    }
    // unknown op tag
    intercept[Exception] {
      KvSink.applyChanges(prev, changes((1L, "Z", "x"))).collect()
    }
    // duplicate change rows for one key (ambiguous apply order)
    intercept[Exception] {
      KvSink.applyChanges(prev,
        changes((1L, "U", "x"), (1L, "U", "y"))).collect()
    }
    // a well-formed feed passes through the same checks
    val ok = KvSink.applyChanges(prev,
      changes((1L, "U", "x"), (2L, "D", null), (3L, "I", "c")))
    assert(sorted(ok) == sorted(snap(1L -> "x", 3L -> "c")))
  }
}
