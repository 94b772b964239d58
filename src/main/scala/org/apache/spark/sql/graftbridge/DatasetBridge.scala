package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Companion to [[ColumnBridge]]: wrapping a custom LogicalPlan back into
  * a DataFrame needs `classic.Dataset.ofRows`, which is private[sql] in
  * Spark 4 — re-exported here for graft's whole-operator extensions
  * (e.g. [[graft.plans.TopKPerKey]]).
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
