package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.execution.LogicalRDD

/** Exact-statistics localCheckpoint for iterative kernels.
  *
  * `Dataset.localCheckpoint()` cuts the LINEAGE but deliberately preserves
  * the plan's ESTIMATED statistics (`LogicalRDD.originStats`). For a loop
  * whose per-round plan joins the previous round's checkpoint against
  * itself-derived state, those estimates COMPOUND multiplicatively: the
  * size-only join estimate is left·right, so round t's sizeInBytes is a
  * product of round t-1 products — the BigInt's digit count doubles every
  * round, and by round ~25 the driver spends minutes inside
  * `BigInteger.multiplyToomCook3` just folding statistics (observed as a
  * silent stall in the delta-iteration CC kernel on a 30-node chain).
  *
  * This bridge replaces the inherited estimate with the TRUTH: the
  * checkpoint has already materialized the RDD, so one cheap job over the
  * in-memory blocks counts the real rows, and the rebuilt `LogicalRDD`
  * carries `Statistics(rows·rowBytes, rows)`. Two birds: the compounding
  * resets every round, and the optimizer sees the real (usually shrinking)
  * delta size — a tiny frontier is broadcast even at static planning time,
  * not just after AQE's runtime correction.
  *
  * Lives in the `org.apache.spark.sql` package because `LogicalRDD`'s
  * session parameter and `Dataset.ofRows` are `private[sql]` (same
  * convention as [[ColumnBridge]] / [[DatasetBridge]]).
  */
object CheckpointBridge {

  /** Materialize `df` via eager localCheckpoint, count the materialized
    * blocks, and return the dataset rebuilt with exact statistics plus the
    * row count (callers use it as their convergence signal — no separate
    * isEmpty job). `rowBytes` is the caller's estimate of one row's width;
    * only relative magnitude matters (it gates broadcast thresholds). */
  def checkpointExact(df: DataFrame, rowBytes: Long): (DataFrame, Long) = {
    val ck = df.localCheckpoint()
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val n = lr.rdd.count()
        val stats = Statistics(
          sizeInBytes = BigInt(math.max(rowBytes, n * rowBytes)),
          rowCount = Some(BigInt(n)))
        val fixed = new LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          Some(stats), None)
        (DatasetBridge.ofRows(df.sparkSession, fixed), n)
      case _ =>
        // not reachable for localCheckpoint, but degrade soundly
        (ck, ck.count())
    }
  }
}
