package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge into the `private[sql]` InternalRow plumbing: lets an operator
  * run a per-partition pass over a DataFrame's Tungsten rows and rebuild a
  * DataFrame WITHOUT deserializing to external `Row`s (`df.rdd` +
  * `Row.fromSeq` boxes every field of every row — round 2 measured the
  * round-trip at 6× the cost of the underlying shuffle). The RDD handle
  * also pins one physical plan, so two jobs over it share the same shuffle
  * output (range-exchange boundary sampling is seeded per RDD id and would
  * differ between separately-planned executions). */
object InternalRowBridge {
  def toRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.toRdd

  /** Wrap an InternalRow RDD as a DataFrame. Rows may be any InternalRow
    * implementation (the scan node applies an UnsafeProjection). */
  def fromRdd(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
