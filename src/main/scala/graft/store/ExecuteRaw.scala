package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

import graft.query.RawCol

/** The `\$executeRaw` analog (`/root/reference/src/db/client/internal/class.ts:118-153`,
  * wrapped at `effect.ts:398-428`): execute a raw SQL **mutation** —
  * `INSERT INTO` / `UPDATE … SET … [WHERE …]` / `DELETE FROM … [WHERE …]`
  * — against registered store tables, returning the affected row count.
  *
  * Spark-first shape: the statement is parsed by Spark's OWN SQL parser
  * (no hand-rolled grammar — identical quoting/escaping/expression rules
  * to the `\$queryRaw` read surface), and the resulting unresolved plan is
  * routed into the copy-on-write store surface:
  *
  *   - `InsertIntoStatement`  → [[Txn.createMany]] (the INSERT's source
  *     query — a `VALUES` list or a full `SELECT` over temp views — runs
  *     as a regular DataFrame, so `INSERT INTO t SELECT …` is distributed
  *     end to end);
  *   - `UpdateTable`          → [[Txn.updateMany]] (SET expressions and
  *     the WHERE predicate become Columns, codegen'd like every other
  *     update);
  *   - `DeleteFromTable`      → [[Txn.deleteMany]].
  *
  * All referential machinery applies unchanged — FK checks, RESTRICT,
  * ON DELETE/UPDATE CASCADE — because the routes land on the same staged
  * statement surface the typed API uses. Statements batched through
  * [[executeMany]] stage in ONE transaction and publish atomically
  * (`\$transaction([$executeRaw…, $executeRaw…])`).
  */
object ExecuteRaw {

  /** One statement, auto-committed. Returns the affected row count. */
  def execute(spark: SparkSession, tables: Map[String, GraftTable],
              sql: String): Long = {
    require(tables.nonEmpty, "executeRaw: no tables registered")
    val catalog = tables.values.head.catalog
    Txn.run(catalog)(txn => executeIn(txn, spark, tables, sql))
  }

  /** A batch of statements staged in ONE transaction (atomic publish).
    * Returns per-statement affected counts. */
  def executeMany(spark: SparkSession, tables: Map[String, GraftTable],
                  sqls: Seq[String]): Seq[Long] = {
    require(tables.nonEmpty, "executeRaw: no tables registered")
    val catalog = tables.values.head.catalog
    Txn.run(catalog)(txn => sqls.map(executeIn(txn, spark, tables, _)))
  }

  /** One statement staged into an open transaction. */
  def executeIn(txn: Txn, spark: SparkSession,
                tables: Map[String, GraftTable], sql: String): Long =
    PlanBridge.parsePlan(spark, sql) match {
      case ins: InsertIntoStatement =>
        val t = resolve(tables, ins.table, sql)
        if (ins.overwrite)
          throw new IllegalArgumentException(
            s"executeRaw: INSERT OVERWRITE is not a store mutation: $sql")
        val src = PlanBridge.ofRows(spark, ins.query)
        val named =
          if (ins.userSpecifiedCols.nonEmpty) {
            // INSERT INTO t (a, b) …: name the source columns, default the
            // rest (Postgres column-list semantics; defaults here = NULL,
            // createdAt/updatedAt are touched by the store itself)
            require(ins.userSpecifiedCols.length == src.columns.length,
              s"executeRaw: ${ins.userSpecifiedCols.length} target columns " +
                s"but ${src.columns.length} source columns: $sql")
            val renamed = src.toDF(ins.userSpecifiedCols: _*)
            t.schema.fieldNames.foldLeft(renamed)((d, f) =>
              if (d.columns.contains(f)) d
              else d.withColumn(f, lit(null).cast(t.schema(f).dataType)))
          } else {
            require(src.columns.length == t.schema.fieldNames.length,
              s"executeRaw: INSERT arity ${src.columns.length} != table " +
                s"arity ${t.schema.fieldNames.length}: $sql")
            src.toDF(t.schema.fieldNames.toIndexedSeq: _*)
          }
        // INSERT type coercion: cast each source column to the declared
        // column type (the parser types a bare `1` as INT; the column may
        // be BIGINT — Postgres coerces, so does this surface)
        val coerced = named.select(t.schema.fields.toIndexedSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        txn.createMany(t, coerced, skipDuplicates = false)

      case UpdateTable(table, assignments, condition) =>
        val t = resolve(tables, table, sql)
        val set = assignments.map { a =>
          val name = a.key match {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              u.nameParts.last
            case other =>
              throw new IllegalArgumentException(
                s"executeRaw: unsupported SET target $other in: $sql")
          }
          require(t.schema.fieldNames.contains(name),
            s"executeRaw: unknown column $name in: $sql")
          name -> ColumnBridge.column(a.value)
        }.toMap
        txn.updateMany(t, RawCol(whereOf(condition)), set)

      case DeleteFromTable(table, condition) =>
        val t = resolve(tables, table, sql)
        txn.deleteMany(t, RawCol(whereOf(condition)))

      case other =>
        throw new IllegalArgumentException(
          s"executeRaw: not a mutation statement (${other.getClass.getSimpleName}) " +
            s"— use the \\$$queryRaw read surface for queries: $sql")
    }

  /** DELETE parses a missing WHERE as a TrueLiteral in some Spark
    * versions and as None via the statement builder in others — either
    * way, absence means "all rows" (the SQL contract). */
  private def whereOf(condition: Any): Column = condition match {
    case Some(e: org.apache.spark.sql.catalyst.expressions.Expression) =>
      ColumnBridge.column(e)
    case None => lit(true)
    case e: org.apache.spark.sql.catalyst.expressions.Expression =>
      ColumnBridge.column(e)
    case _ => lit(true)
  }

  private def resolve(tables: Map[String, GraftTable], table: LogicalPlan,
                      sql: String): GraftTable = table match {
    case u: UnresolvedRelation =>
      tables.getOrElse(u.multipartIdentifier.last,
        throw new IllegalArgumentException(
          s"executeRaw: table ${u.multipartIdentifier.mkString(".")} is not " +
            s"a registered store table: $sql"))
    case SubqueryAlias(_, child) => resolve(tables, child, sql)
    case other =>
      throw new IllegalArgumentException(
        s"executeRaw: unsupported target ${other.getClass.getSimpleName}: $sql")
  }
}
