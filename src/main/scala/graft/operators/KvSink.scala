package graft.operators

import org.apache.spark.sql.Dataset

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
}
