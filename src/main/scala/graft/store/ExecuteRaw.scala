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
              sql: String): Long =
    Txn.run(sharedCatalog(tables))(txn => executeIn(txn, spark, tables, sql))

  /** A batch of statements staged in ONE transaction (atomic publish).
    * Returns per-statement affected counts. */
  def executeMany(spark: SparkSession, tables: Map[String, GraftTable],
                  sqls: Seq[String]): Seq[Long] =
    Txn.run(sharedCatalog(tables))(txn => sqls.map(executeIn(txn, spark, tables, _)))

  /** All registered tables must live in ONE catalog — a transaction
    * publishes one manifest; a table from another catalog would stage
    * into the wrong store and its write would silently vanish. */
  private def sharedCatalog(tables: Map[String, GraftTable]): Catalog = {
    require(tables.nonEmpty, "executeRaw: no tables registered")
    val catalog = tables.values.head.catalog
    require(tables.values.forall(_.catalog eq catalog),
      "executeRaw: registered tables span multiple catalogs — one " +
        "transaction publishes one manifest; register per-catalog maps")
    catalog
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
        // INSERT INTO t (a, b) … names the source columns; BY NAME takes
        // them from the source query's own output names. Either way each
        // name must resolve (case-insensitively, like the rest of the
        // analyzer) to a declared column — a typo'd name is an error, not
        // a silently-dropped value. Unnamed columns default to NULL
        // (createdAt/updatedAt are touched by the store itself).
        val listed: Option[Seq[String]] =
          if (ins.userSpecifiedCols.nonEmpty) Some(ins.userSpecifiedCols)
          else if (ins.byName) Some(src.columns.toIndexedSeq)
          else None
        val named = listed match {
          case Some(cols) =>
            require(cols.length == src.columns.length,
              s"executeRaw: ${cols.length} target columns " +
                s"but ${src.columns.length} source columns: $sql")
            val canonical = cols.map(fieldOf(t, _, sql))
            require(canonical.distinct.length == canonical.length,
              s"executeRaw: duplicate target column in: $sql")
            val renamed = src.toDF(canonical: _*)
            t.schema.fieldNames.foldLeft(renamed)((d, f) =>
              if (canonical.contains(f)) d
              else d.withColumn(f, lit(null).cast(t.schema(f).dataType)))
          case None =>
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
        val setSeq = assignments.map { a =>
          val name = a.key match {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              fieldOf(t, u.nameParts.last, sql)
            case other =>
              throw new IllegalArgumentException(
                s"executeRaw: unsupported SET target $other in: $sql")
          }
          name -> ColumnBridge.column(a.value)
        }
        // Postgres raises "multiple assignments to the same column"; a
        // silent last-wins .toMap would diverge from the INSERT path's
        // duplicate-column strictness on the same surface.
        val dups = setSeq.map(_._1.toLowerCase).groupBy(identity)
          .collect { case (n, hits) if hits.size > 1 => n }
        require(dups.isEmpty,
          s"executeRaw: multiple assignments to the same column " +
            s"(${dups.mkString(", ")}) in: $sql")
        txn.updateMany(t, RawCol(whereOf(condition, sql)), setSeq.toMap)

      case DeleteFromTable(table, condition) =>
        val t = resolve(tables, table, sql)
        txn.deleteMany(t, RawCol(whereOf(condition, sql)))

      case other =>
        throw new IllegalArgumentException(
          s"executeRaw: not a mutation statement (${other.getClass.getSimpleName}) " +
            s"— use the \\$$queryRaw read surface for queries: $sql")
    }

  /** DELETE parses a missing WHERE as a TrueLiteral in some Spark
    * versions and as None via the statement builder in others — either
    * way, ABSENCE means "all rows" (the SQL contract). Anything else
    * unrecognized must THROW: a guard whose miss semantics are
    * mutate-everything can never fail open to `lit(true)`. */
  private def whereOf(condition: Any, sql: String): Column = condition match {
    case Some(e: org.apache.spark.sql.catalyst.expressions.Expression) =>
      ColumnBridge.column(e)
    case None => lit(true)
    case e: org.apache.spark.sql.catalyst.expressions.Expression =>
      ColumnBridge.column(e)
    case other =>
      throw new IllegalArgumentException(
        s"executeRaw: unrecognized WHERE shape ${other.getClass.getName}: $sql")
  }

  /** Case-insensitive column resolution to the declared field name (the
    * analyzer's default `spark.sql.caseSensitive=false` semantics;
    * ambiguity under folding is a schema-design error worth refusing). */
  private def fieldOf(t: GraftTable, name: String, sql: String): String = {
    val hits = t.schema.fieldNames.filter(_.equalsIgnoreCase(name))
    hits.toSeq match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"executeRaw: unknown column $name on ${t.name}: $sql")
      case many => throw new IllegalArgumentException(
        s"executeRaw: column $name is ambiguous on ${t.name} " +
          s"(${many.mkString(",")}): $sql")
    }
  }

  private def resolve(tables: Map[String, GraftTable], table: LogicalPlan,
                      sql: String): GraftTable = table match {
    case u: UnresolvedRelation =>
      val want = u.multipartIdentifier.last
      tables.collect { case (k, t) if k.equalsIgnoreCase(want) => t }.toSeq match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"executeRaw: table ${u.multipartIdentifier.mkString(".")} is not " +
            s"a registered store table: $sql")
        case _ => throw new IllegalArgumentException(
          s"executeRaw: table name $want is ambiguous across registered tables: $sql")
      }
    case SubqueryAlias(_, child) => resolve(tables, child, sql)
    case other =>
      throw new IllegalArgumentException(
        s"executeRaw: unsupported target ${other.getClass.getSimpleName}: $sql")
  }
}
