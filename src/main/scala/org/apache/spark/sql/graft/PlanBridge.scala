package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Wraps a raw Catalyst [[LogicalPlan]] into a [[DataFrame]].
  *
  * `Dataset.ofRows` is `private[sql]`, so libraries that add custom
  * logical operators (graft's as-of join) need one file inside the
  * `org.apache.spark.sql` package tree to bridge it — the standard
  * idiom used by Spark connector/extension libraries. This is the ONLY
  * file outside the `graft` package, and it contains no logic.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
