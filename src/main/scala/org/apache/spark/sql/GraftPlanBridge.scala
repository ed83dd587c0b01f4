package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor — the standard
  * extension-library shim (every Spark-native library that ships custom
  * logical plans carries one): a DataFrame wrapping an arbitrary
  * LogicalPlan is how a custom operator node enters and leaves the
  * Catalyst pipeline. This file is the ONLY place that touches Spark's
  * package-private surface.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (public alternative to the
    * package-private `df.logicalPlan`). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
