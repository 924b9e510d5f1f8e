package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` session function registry — lets the
  * library register its custom Catalyst expressions as SQL functions. */
object FunctionRegistration {
  /** Idempotent: a name already present in the session registry is left
    * alone instead of replaced — re-registration is always the same
    * builder here (the registration sites are static), and the replace
    * path logs a WARN per call that turns repeated query runs into log
    * noise. */
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(name)))
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
