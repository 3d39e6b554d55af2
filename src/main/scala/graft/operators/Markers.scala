package graft.operators

import org.apache.spark.sql.DataFrame

/** The operator-contract guard behind the repo rule "operators that stage
  * internal marker/temp columns onto caller input must reject collisions
  * with the caller's own column names": `withColumn("_m", …)` silently
  * REPLACES a caller column named `_m`, so a colliding input corrupts the
  * operator's internal state (a join keys on a constant, a lag reads the
  * caller's data) or drops the caller's column without a trace. One
  * definition so the per-operator guards cannot drift.
  */
object Markers {

  /** Fail loudly when `df`'s columns collide with `markers`. */
  def requireFree(df: DataFrame, what: String, markers: String*): Unit = {
    val bad = df.columns.toSet.intersect(markers.toSet)
    require(bad.isEmpty,
      s"$what column names collide with internal marker columns: " +
        bad.mkString(", "))
  }
}
