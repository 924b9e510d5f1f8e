package graft

/** One place for the known-spurious Spark logger noise the engine's
  * sessions silence (test base + the Verify/Bench mains).
  *
  * `org.apache.spark.sql.execution.LogicalRDD` warns "The output columns
  * are expected to the same (for name and type) for output …" on every
  * `localCheckpoint` whose origin plan prints its output in a different
  * Seq container (ArraySeq vs List) — a Spark-internal rewrite-assoc
  * miss that only costs the stats/constraints carry-over, never
  * correctness. It is not fixable from user code (the comparison happens
  * inside `LogicalRDD.rewriteStatsAndConstraints`), so the logger is
  * pinned to ERROR to keep green logs WARN-free.
  */
object GraftLogging {
  /** Call BEFORE SparkSession creation where possible — NativeCodeLoader
    * fires its one startup WARN (no native hadoop lib in this container,
    * builtin-java classes are fine) during context init. */
  def silenceKnownNoise(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.LogicalRDD",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.hadoop.util.NativeCodeLoader",
      org.apache.logging.log4j.Level.ERROR)
  }
}
