package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{coalesce, col}

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
    * hashmap; `updates` must be unique per key (pre-aggregate if not —
    * within-batch ordering is the caller's semantic, not the engine's).
    * One full-outer equi-join: each side shuffles once on the key, or not at
    * all when both snapshots are bucketed on it (Sinks.ensureBucketedTable),
    * which is the 100 TB shape: a bucketed base, bucketed deltas, exchange-
    * free merge per version. */
  def upsert(base: DataFrame, updates: DataFrame): DataFrame = {
    val Array(k, v) = base.columns
    val u = updates.toDF(k, "_update_value")
    base.join(u, Seq(k), "full_outer")
      .select(col(k), coalesce(col("_update_value"), col(v)).as(v))
  }
}
