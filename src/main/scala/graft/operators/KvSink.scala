package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, concat, count, first, lit, raise_error, when}

/** O12 parity surface: the reference's terminal store is a concurrent
  * hashmap the driver point-looks-up after the run (reference hashmap.c
  * MapPut/MapGet, main.c:42,66-71). In Spark the result DataFrame IS the
  * associative sink; this helper materializes it driver-side for the same
  * get-by-key ergonomics.
  *
  * Driver-sized results only (an aggregate keyed by a bounded vocabulary,
  * like wordcount) — the distributed form of the same lookup is
  * `df.filter(col(key) === term)`, which is what `SparkEntry.entry` gates.
  * Duplicate keys resolve last-writer-wins, matching MapPut's upsert
  * (reference hashmap.c:39-46); aggregate results have unique keys anyway.
  */
object KvSink {

  def collectAsMap[K, V](ds: Dataset[(K, V)]): scala.collection.Map[K, V] =
    ds.collect().toMap // toMap keeps the last pair per key: MapPut upsert

  /** MapGet: None plays the reference's "Word not found!" branch. */
  def get[K, V](m: scala.collection.Map[K, V], key: K): Option[V] = m.get(key)

  /** Distributed MapPut: apply a batch of updates to a keyed snapshot,
    * update-wins per key (the reference's in-place overwrite, hashmap.c:39-46,
    * as a snapshot→snapshot transform — Spark data is immutable, so "mutate
    * the store" becomes "produce the next version").
    *
    * Both relations are (key, value) two-column tables, like the reference
    * hashmap (enforced — anything else is a contract violation, rejected
    * loudly instead of a bare MatchError); `updates` must be unique per key
    * (pre-aggregate if not — within-batch ordering is the caller's semantic,
    * not the engine's). A NULL update VALUE is rejected at execution time
    * (`raise_error` inside codegen, no extra pass): the reference store has
    * MapPut but no MapDelete (reference hashmap.h:21-26), so null-set/delete
    * is unrepresentable here by design — rejecting beats silently degrading
    * to keep-base, which is what a bare `coalesce` would do.
    * One full-outer equi-join: each side shuffles once on the key, or not at
    * all when both snapshots are bucketed on it (Sinks.ensureBucketedTable),
    * which is the 100 TB shape: a bucketed base, bucketed deltas, exchange-
    * free merge per version. */
  /** CDC snapshot diff — the inverse of [[upsert]]: given two versions of a
    * keyed snapshot, emit exactly the change rows that turn `prev` into
    * `next`, tagged `op` ∈ I (key only in next), U (key in both, value
    * changed), D (key only in prev). Unchanged keys are dropped, so the
    * output is change-sized, not snapshot-sized — the shape that feeds an
    * incremental downstream (a delta feed per version) instead of
    * re-shipping 100 TB of snapshot.
    *
    * Membership is decided by presence markers, not value nullity, so a
    * legitimately-NULL value can never masquerade as an insert/delete, and
    * value comparison is null-safe (`<=>`). One full-outer equi-join: each
    * snapshot shuffles once on the key, or not at all when both versions are
    * bucketed on it (Sinks.ensureBucketedTable) — the 100 TB shape, same as
    * [[upsert]]'s. Law (tested): applying the diff to `prev` (upsert the
    * I/U rows, anti-join the D keys) reconstructs `next` exactly. */
  /** The CDC helpers stage internal marker columns onto the inputs; a
    * snapshot whose OWN columns use one of those names would be silently
    * overwritten (e.g. a key column literally named `_in_prev` becomes
    * `lit(true)` and the join keys on a constant) — reject loudly, per the
    * module's contract-violation philosophy (the shared [[Markers]] guard,
    * also applied by Salting.topKByKey / EventOps.scd2 / TextOps.redact). */
  private def requireNoMarkers(df: DataFrame, what: String,
      markers: String*): Unit = Markers.requireFree(df, what, markers: _*)

  def diff(prev: DataFrame, next: DataFrame): DataFrame = {
    require(prev.columns.length == 2,
      s"diff prev must be a (key, value) 2-column table; got ${prev.columns.mkString("(", ",", ")")}")
    require(next.columns.length == 2,
      s"diff next must be a (key, value) 2-column table; got ${next.columns.mkString("(", ",", ")")}")
    requireNoMarkers(prev, "diff prev",
      "_old_value", "_new_value", "_in_prev", "_in_next")
    requireNoMarkers(next, "diff next",
      "_old_value", "_new_value", "_in_prev", "_in_next")
    val Array(k, v) = prev.columns
    val p = prev.toDF(k, "_old_value").withColumn("_in_prev", lit(true))
    val n = next.toDF(k, "_new_value").withColumn("_in_next", lit(true))
    p.join(n, Seq(k), "full_outer")
      .where(col("_in_prev").isNull || col("_in_next").isNull ||
        !(col("_old_value") <=> col("_new_value")))
      .select(col(k),
        when(col("_in_prev").isNull, lit("I"))
          .when(col("_in_next").isNull, lit("D"))
          .otherwise(lit("U")).as("op"),
        col("_old_value").as(s"old_$v"),
        col("_new_value").as(s"new_$v"))
  }

  def upsert(base: DataFrame, updates: DataFrame): DataFrame = {
    require(base.columns.length == 2,
      s"upsert base must be a (key, value) 2-column table; got ${base.columns.mkString("(", ",", ")")}")
    require(updates.columns.length == 2,
      s"upsert updates must be a (key, value) 2-column table; got ${updates.columns.mkString("(", ",", ")")}")
    requireNoMarkers(base, "upsert base", "_update_value", "_upd")
    requireNoMarkers(updates, "upsert updates", "_update_value", "_upd")
    val Array(k, v) = base.columns
    // _upd marks "an update row matched this key": a non-null marker with a
    // null value is a violating update, distinguishable from no-update
    val u = updates.toDF(k, "_update_value").withColumn("_upd", lit(true))
    base.join(u, Seq(k), "full_outer")
      .select(col(k),
        when(col("_upd").isNotNull,
          when(col("_update_value").isNull,
            raise_error(concat(lit("upsert: NULL update value for key "),
              col(k).cast("string"),
              lit(" (deletes are unrepresentable; reference hashmap has no MapDelete)"))))
            .otherwise(col("_update_value")))
          .otherwise(col(v)).as(v))
  }

  /** MERGE-apply — the forward direction of [[diff]] and the general form
    * of [[upsert]] (SQL `MERGE INTO … WHEN MATCHED THEN UPDATE/DELETE,
    * WHEN NOT MATCHED THEN INSERT`): apply a change feed tagged
    * `op` ∈ I/U/D to a keyed snapshot in ONE full-outer equi-join — inserts
    * add, updates replace, deletes drop, untouched keys pass through.
    * Together with [[diff]] this closes the CDC loop: `applyChanges(prev,
    * diff(prev, next)) == next` for any two snapshots (KvSinkSpec law;
    * q_merge_apply gates it end-to-end against the oracle's direct build of
    * `next`).
    *
    * `changes` is a (key, op, value) 3-column table. Contract violations
    * fail LOUDLY at execution time (`raise_error`, no extra pass): an
    * insert for a present key, an update/delete for an absent key, or an
    * unknown op tag all indicate a corrupt feed — silently picking a side
    * would hide exactly the drift CDC exists to prevent. Same shuffle shape
    * as [[diff]]/[[upsert]]: each side once on the key, or exchange-free
    * off bucketed snapshots (Sinks.ensureBucketedTable). */
  def applyChanges(base: DataFrame, changes: DataFrame): DataFrame = {
    require(base.columns.length == 2,
      s"applyChanges base must be a (key, value) 2-column table; got ${base.columns.mkString("(", ",", ")")}")
    require(changes.columns.length == 3,
      s"applyChanges changes must be a (key, op, value) 3-column table; got ${changes.columns.mkString("(", ",", ")")}")
    requireNoMarkers(base, "applyChanges base",
      "_base_value", "_in_base", "_op", "_change_value", "_n")
    requireNoMarkers(changes, "applyChanges changes",
      "_base_value", "_in_base", "_op", "_change_value", "_n")
    val Array(k, v) = base.columns
    // one key-grouped pass over the (batch-sized) feed: a feed carrying two
    // changes for one key is corrupt (which applies first?) and must fail
    // loudly, not fan the key out through the full-outer join; the groupBy
    // pre-partitions on k, so the join reuses the exchange. first() is
    // order-arbitrary but only survives when _n == 1.
    val c = changes.toDF(k, "_op", "_change_value")
      .groupBy(col(k))
      .agg(count(lit(1)).as("_n"), first(col("_op")).as("_op"),
        first(col("_change_value")).as("_change_value"))
    val b = base.withColumnRenamed(v, "_base_value")
      .withColumn("_in_base", lit(true))
    b.join(c, Seq(k), "full_outer")
      // violations raise inside the FILTER condition so they evaluate for
      // every change row — a check only in the value projection would be
      // skipped for D rows once the filter pushes below the project
      .where(
        when(col("_n") > 1,
          raise_error(concat(lit("applyChanges: duplicate change rows for "),
            lit("key "), col(k).cast("string"))).cast("boolean"))
          .when(col("_op").isNotNull && !col("_op").isin("I", "U", "D"),
          raise_error(concat(lit("applyChanges: unknown op '"), col("_op"),
            lit("' for key "), col(k).cast("string"))).cast("boolean"))
          .when(col("_op") === "I" && col("_in_base").isNotNull,
            raise_error(concat(lit("applyChanges: insert for present key "),
              col(k).cast("string"))).cast("boolean"))
          .when(col("_op").isin("U", "D") && col("_in_base").isNull,
            raise_error(concat(
              lit("applyChanges: update/delete for absent key "),
              col(k).cast("string"))).cast("boolean"))
          .otherwise(!(col("_op") <=> lit("D"))))
      .select(col(k),
        when(col("_op").isin("I", "U"), col("_change_value"))
          .otherwise(col("_base_value")).as(v))
  }
}
