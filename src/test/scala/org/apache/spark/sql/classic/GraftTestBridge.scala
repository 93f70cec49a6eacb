package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into `private[sql]` surface: execute a
  * hand-transformed LogicalPlan as a DataFrame. Lives in the Spark
  * package namespace solely to reach `Dataset.ofRows` — the standard
  * shim pattern for Spark-library test suites. */
object GraftTestBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
