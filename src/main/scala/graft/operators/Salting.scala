package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation for zipfian keys (SURVEY §7.1 slice 4).
  *
  * Spark's hash aggregation already two-phases algebraic aggregates
  * (partial→final), which is the built-in answer to skewed counts — the
  * reference, by contrast, ships every occurrence across its shuffle
  * (reference mapreduce.c:75-86). What Spark does NOT two-phase is ranking:
  * a `row_number` window sorts each key's entire partition, so one hot key
  * serializes onto one task. `topKByKey` is the salted decomposition:
  *
  *   phase 1: rank within (key, salt) — hot key's rows split across nSalts
  *            tasks, each emits its local top-k (≤ k·nSalts survivors/key);
  *   phase 2: rank the survivors within key — a bounded partition.
  *
  * Output is identical to the direct single-window form for any total
  * `order` (asserted in SaltingSpec): the global top-k of a key is a subset
  * of the union of its per-salt top-ks.
  */
object Salting {

  /** Exact top-k rows per key, skew-safe. `order` must be a total order
    * (add a unique tiebreaker) so results are deterministic. */
  def topKByKey(df: DataFrame, key: Column, order: Seq[Column], k: Int,
      nSalts: Int = 16, saltOn: Column): DataFrame = {
    Markers.requireFree(df, "topKByKey input", "_salt", "_lrn", "_grn")
    val salted = df.withColumn("_salt", pmod(xxhash64(saltOn), lit(nSalts)))
    val local = Window.partitionBy(key, col("_salt")).orderBy(order: _*)
    val global = Window.partitionBy(key).orderBy(order: _*)
    salted
      .withColumn("_lrn", row_number().over(local))
      .where(col("_lrn") <= k)
      .withColumn("_grn", row_number().over(global))
      .where(col("_grn") <= k)
      .drop("_salt", "_lrn", "_grn")
  }
}
