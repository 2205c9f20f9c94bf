package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** LogicalPlan → DataFrame bridge for custom operators: Spark 4 keeps
  * `Dataset.ofRows` private[sql], so this one-file subpackage re-exposes
  * exactly the constructor a custom LogicalPlan (e.g. graft.plans.AsOfJoin)
  * needs to surface as a DataFrame. Also exposes the analyzed plan of a
  * DataFrame so builders can wire resolved child outputs into the node.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
