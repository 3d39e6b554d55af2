package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame lifter for custom operators.
  *
  * Like [[ColumnBridge]], the constructor (`classic.Dataset.ofRows`) is
  * `private[sql]` in Spark 4; this shim is the conventional way for a library
  * to hand its own logical plans to the session's QueryExecution.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
