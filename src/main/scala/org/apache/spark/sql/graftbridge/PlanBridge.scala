package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** LogicalPlan → DataFrame bridge. `Dataset.ofRows` is `private[sql]` in
  * Spark 4, so libraries that build custom logical operators place a shim
  * inside the `org.apache.spark.sql` package — the same pattern as
  * [[ColumnBridge]].
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
