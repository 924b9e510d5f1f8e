package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for repeated-join workloads.
  *
  * A join between two tables bucketed on the same key with the same bucket
  * count is shuffle-free: each task zips matching buckets. At 100 TB this
  * is the difference between re-shuffling the fact table on every run and
  * shuffling once at write time — the engine's answer to the reference's
  * secondary indexes (`migration.sql:77-90`): pay at write, win at read.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned without
    * an Exchange on either side (verify with `.explain`). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
