package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` plan plumbing: parse a SQL statement to
  * its logical plan and wrap an (unresolved) plan as a DataFrame — the two
  * hooks the raw-SQL write surface ([[graft.store.ExecuteRaw]]) needs to
  * reuse Spark's own parser instead of hand-rolling one. */
object PlanBridge {
  def parsePlan(spark: SparkSession, sql: String): LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame's resolved logical plan — the child a custom logical
    * node wraps (custom whole-operator tier, [[graft.plans]]). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
