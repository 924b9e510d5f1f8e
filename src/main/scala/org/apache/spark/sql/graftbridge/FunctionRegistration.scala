package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` session function registry — lets the
  * library register its custom Catalyst expressions as SQL functions. */
object FunctionRegistration {
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
