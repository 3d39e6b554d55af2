package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** SCD2 null-attribute semantics: NULL is a legitimate "value unknown"
  * version, not a row to silently drop. The change filter must be null-SAFE
  * (IS DISTINCT FROM), and the first version of a key must open even when
  * its attribute starts NULL — lag(attr) alone cannot distinguish that row
  * from "previous attr was NULL". */
class EventOpsSpec extends SparkTestBase {

  private def run(rows: Seq[(Long, java.lang.Long, Long, Long)]) = {
    import spark.implicits._
    EventOps.scd2(rows.toDF("user_id", "k", "ts_us", "event_id"),
        "user_id", "k", "ts_us", "event_id")
      .orderBy("user_id", "valid_from_us")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2),
        Option(r.get(3)), r.getBoolean(4)))
      .toSeq
  }

  test("NULL attribute opens and closes versions; NULL→NULL does not") {
    // A, NULL, NULL, A: three versions — the middle NULL run collapses,
    // the trailing A reopens. A non-null-safe filter would drop the NULL
    // version entirely and emit two back-to-back A versions.
    val got = run(Seq(
      (1L, java.lang.Long.valueOf(7L), 10L, 1L),
      (1L, null, 20L, 2L),
      (1L, null, 30L, 3L),
      (1L, java.lang.Long.valueOf(7L), 40L, 4L)))
    assert(got == Seq(
      (1L, Some(7L), 10L, Some(20L), false),
      (1L, None, 20L, Some(40L), false),
      (1L, Some(7L), 40L, None, true)), s"got $got")
  }

  test("a key whose attribute STARTS null still opens its first version") {
    val got = run(Seq(
      (2L, null, 5L, 1L),
      (2L, java.lang.Long.valueOf(3L), 15L, 2L)))
    assert(got == Seq(
      (2L, None, 5L, Some(15L), false),
      (2L, Some(3L), 15L, None, true)), s"got $got")
  }

  test("all-null change stream is one open version per key") {
    val got = run(Seq(
      (3L, null, 1L, 1L), (3L, null, 2L, 2L), (3L, null, 3L, 3L)))
    assert(got == Seq((3L, None, 1L, None, true)), s"got $got")
  }
}
