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

  /** `CREATE TABLE <name> AS SELECT …` — the reference's `\$executeRaw`
    * accepts arbitrary SQL including DDL (`class.ts:118-153`); this is
    * the store's CTAS. The SELECT resolves through Spark's analyzer
    * (temp views, registered functions — the same contract as the
    * INSERT source query), its result schema becomes the table schema,
    * and the rows land in ONE auto-committed transaction. Returns the
    * created table handle — unique keys and partition columns are
    * STORAGE knowledge the SQL text does not carry, so they are
    * parameters, not parsed. */
  def executeCreate(spark: SparkSession, catalog: Catalog, sql: String,
                    uniqueKeys: Seq[Seq[String]] = Nil,
                    partitionCols: Seq[String] = Nil): GraftTable =
    PlanBridge.parsePlan(spark, sql) match {
      case ctas: CreateTableAsSelect =>
        val name = ctas.name match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
              if u.nameParts.length == 1 => u.nameParts.head
          case other => throw new IllegalArgumentException(
            s"executeRaw: CREATE TABLE needs a single-part table name, " +
              s"got $other: $sql")
        }
        require(ctas.partitioning.isEmpty,
          s"executeRaw: declare storage partitioning via the " +
            s"partitionCols parameter, not PARTITIONED BY: $sql")
        require(!ctas.ignoreIfExists,
          s"executeRaw: IF NOT EXISTS is unsupported — an existing " +
            s"table's schema cannot be recovered from this statement: $sql")
        require(!catalog.manifest().contains(name),
          s"executeRaw: table $name already exists in this catalog: $sql")
        val df = PlanBridge.ofRows(spark, ctas.query)
        val t = new GraftTable(spark, catalog, name, df.schema,
          uniqueKeys = uniqueKeys, partitionCols = partitionCols)
        Txn.run(catalog)(txn => txn.createMany(t, df, skipDuplicates = false))
        t

      case other => throw new IllegalArgumentException(
        s"executeRaw: not a CREATE TABLE AS SELECT " +
          s"(${other.getClass.getSimpleName}): $sql")
    }

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
        val dups = setSeq.map(_._1.toLowerCase(java.util.Locale.ROOT)).groupBy(identity)
          .collect { case (n, hits) if hits.size > 1 => n }
        require(dups.isEmpty,
          s"executeRaw: multiple assignments to the same column " +
            s"(${dups.mkString(", ")}) in: $sql")
        txn.updateMany(t, RawCol(whereOf(condition, sql)), setSeq.toMap)

      case DeleteFromTable(table, condition) =>
        val t = resolve(tables, table, sql)
        txn.deleteMany(t, RawCol(whereOf(condition, sql)))

      case m: MergeIntoTable =>
        executeMerge(txn, spark, tables, m, sql)

      case _: CreateTableAsSelect =>
        throw new IllegalArgumentException(
          s"executeRaw: CREATE TABLE AS SELECT goes through " +
            s"ExecuteRaw.executeCreate — it returns the new table handle: $sql")

      case other =>
        throw new IllegalArgumentException(
          s"executeRaw: not a mutation statement (${other.getClass.getSimpleName}) " +
            s"— use the \\$$queryRaw read surface for queries: $sql")
    }

  /** `MERGE INTO` routed onto the staged statement surface — the last DML
    * side of the `\$executeRaw` triangle (`effect.ts:398-428` accepts
    * arbitrary SQL; `upsert` already exists underneath,
    * `effect.ts:495-541`). Spark's parser yields [[MergeIntoTable]]; each
    * action decomposes onto an existing staged statement so ALL
    * referential machinery (FK checks, RESTRICT, cascades, P2000/P2011
    * value validation) applies unchanged:
    *
    *   - `WHEN MATCHED [AND c] THEN UPDATE SET …` → full updated rows
    *     computed on the target⋈source join, staged via [[Txn.upsert]];
    *   - `WHEN MATCHED [AND c] THEN DELETE` → matched target keys,
    *     staged via [[Txn.deleteWhereKeysIn]];
    *   - `WHEN NOT MATCHED [AND c] THEN INSERT …` → source anti-join
    *     target, staged via [[Txn.createMany]];
    *   - `WHEN NOT MATCHED BY SOURCE …` → target anti-join source,
    *     update/delete as above.
    *
    * Matched actions apply FIRST-CLAUSE-WINS per row (the SQL contract):
    * each action's eligible set excludes rows claimed by earlier clauses.
    * All eligible sets derive from STATEMENT-START state, so a row
    * updated by clause 1 is not re-examined by clause 2. The standard
    * cardinality rule is enforced: a target row matched by MORE than one
    * source row cannot be updated/deleted deterministically — refused
    * up front (Postgres: "MERGE command cannot affect row a second
    * time", SQLSTATE 21000). Returns total affected rows.
    *
    * The ON clause must be a conjunction of column equalities between
    * target and source (the key-pairing the staged surface routes on);
    * general ON predicates and `WITH SCHEMA EVOLUTION` are refused
    * loudly rather than half-applied.
    */
  private def executeMerge(txn: Txn, spark: SparkSession,
                           tables: Map[String, GraftTable],
                           m: MergeIntoTable, sql: String): Long = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    require(!m.withSchemaEvolution,
      s"executeRaw: MERGE WITH SCHEMA EVOLUTION is not supported: $sql")
    val t = resolve(tables, m.targetTable, sql)

    def aliasOf(plan: LogicalPlan, fallback: String): String = plan match {
      case SubqueryAlias(id, _) => id.name
      case _ => fallback
    }
    val ta = aliasOf(m.targetTable, t.name)
    // source: a registered store table reads through THIS transaction's
    // staged state (same-store MERGE composes with earlier statements);
    // anything else (temp view, VALUES, subquery) resolves through
    // Spark's analyzer like the INSERT source query does
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, child) => unwrap(child)
      case other => other
    }
    val (src0, sa) = unwrap(m.sourceTable) match {
      case u: UnresolvedRelation
          if tables.keys.exists(_.equalsIgnoreCase(u.multipartIdentifier.last)) =>
        val st = resolve(tables, u, sql)
        (txn.read(st), aliasOf(m.sourceTable, st.name))
      case _ =>
        (PlanBridge.ofRows(spark, m.sourceTable),
          aliasOf(m.sourceTable, "__merge_src"))
    }
    require(!ta.equalsIgnoreCase(sa),
      s"executeRaw: MERGE target and source aliases collide ($ta): $sql")

    // ON decomposition: conjunction of target-col = source-col equalities
    def sideOf(a: UnresolvedAttribute): (String, String) = a.nameParts match {
      case Seq(q, c) if q.equalsIgnoreCase(ta) => ("t", fieldOf(t, c, sql))
      case Seq(q, c) if q.equalsIgnoreCase(sa) => ("s", c)
      case Seq(c) if t.schema.fieldNames.exists(_.equalsIgnoreCase(c)) &&
        src0.columns.exists(_.equalsIgnoreCase(c)) =>
        throw new IllegalArgumentException(
          s"executeRaw: MERGE ON column $c is ambiguous — qualify it " +
            s"with $ta or $sa: $sql")
      case Seq(c) if t.schema.fieldNames.exists(_.equalsIgnoreCase(c)) =>
        ("t", fieldOf(t, c, sql))
      case Seq(c) => ("s", c)
      case other => throw new IllegalArgumentException(
        s"executeRaw: MERGE ON attribute ${other.mkString(".")} is not " +
          s"resolvable against $ta/$sa: $sql")
    }
    def keyPairs(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[(String, String)] = e match {
      case And(l, r) => keyPairs(l) ++ keyPairs(r)
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute) =>
        (sideOf(l), sideOf(r)) match {
          case (("t", tc), ("s", sc)) => Seq((tc, sc))
          case (("s", sc), ("t", tc)) => Seq((tc, sc))
          case _ => throw new IllegalArgumentException(
            s"executeRaw: MERGE ON equality must pair one target and one " +
              s"source column: $sql")
        }
      case other => throw new IllegalArgumentException(
        s"executeRaw: MERGE ON supports conjunctions of column equalities " +
          s"only, got ${other.getClass.getSimpleName}: $sql")
    }
    val keys = keyPairs(m.mergeCondition)
    require(keys.nonEmpty, s"executeRaw: MERGE ON pairs no columns: $sql")
    val tKeys = keys.map(_._1)

    val tgt = txn.read(t).alias(ta)
    val src = src0.alias(sa)
    val joinCond = keys.map { case (tc, sc) =>
      col(s"$ta.$tc") === col(s"$sa.$sc")
    }.reduce(_ && _)

    def condCol(c: Option[org.apache.spark.sql.catalyst.expressions.Expression]): Column =
      c.map(ColumnBridge.column).getOrElse(lit(true))
    def setOf(assignments: Seq[Assignment]): Map[String, Column] = {
      val pairs = assignments.map { a =>
        val name = a.key match {
          case u: UnresolvedAttribute => fieldOf(t, u.nameParts.last, sql)
          case other => throw new IllegalArgumentException(
            s"executeRaw: unsupported MERGE SET target $other in: $sql")
        }
        name -> ColumnBridge.column(a.value)
      }
      val dups = pairs.map(_._1.toLowerCase(java.util.Locale.ROOT)).groupBy(identity)
        .collect { case (n, hits) if hits.size > 1 => n }
      require(dups.isEmpty,
        s"executeRaw: multiple MERGE assignments to the same column " +
          s"(${dups.mkString(", ")}) in: $sql")
      pairs.toMap
    }
    // `UPDATE SET * / INSERT *`: every target column from the same-named
    // source column
    def starSet: Map[String, Column] =
      t.schema.fieldNames.map(f => f -> col(s"$sa.$f")).toMap
    // SQL MERGE updates the matched row IN PLACE — but the staged apply
    // pairs rows by ON key, so a SET that rewrites an ON-key column would
    // insert the projected row as a NEW key and leave the matched row
    // untouched (silent duplication). Refuse explicit key assignments
    // loudly; for `SET *` drop the key columns from the assignment set
    // instead (under a same-named ON pair the star assignment was the
    // identity anyway, and in-place semantics keep the target's key).
    def requireNoKeyAssign(set: Map[String, Column], branch: String): Unit = {
      val hit = set.keys.filter(n => tKeys.exists(_.equalsIgnoreCase(n)))
      require(hit.isEmpty,
        s"executeRaw: MERGE $branch UPDATE may not assign ON-key " +
          s"column(s) ${hit.mkString(", ")} — the update is keyed on them: $sql")
    }
    def starSetForUpdate: Map[String, Column] = {
      // Dropping an ON-key from SET * is only the identity when the
      // same-named source column IS that key's ON pair (ON t.k = s.k).
      // Under a cross-named pairing (ON t.k = s.j) with a source column
      // named k also present, SQL star semantics would assign s.k — a
      // key rewrite. Keeping the target key there would diverge
      // SILENTLY, while the explicit form is refused loudly; refuse the
      // star form just as loudly.
      keys.foreach { case (tc, sc) =>
        val sameNamed = src0.columns.find(_.equalsIgnoreCase(tc))
        require(sameNamed.forall(_.equalsIgnoreCase(sc)),
          s"executeRaw: MERGE UPDATE SET * would assign ON-key column " +
            s"$tc from source column ${sameNamed.getOrElse(tc)}, which is " +
            s"not its ON pair ($sc) — list the assignments explicitly: $sql")
      }
      starSet.filterNot { case (n, _) => tKeys.exists(_.equalsIgnoreCase(n)) }
    }
    def project(rows: DataFrame, set: Map[String, Column],
                defaults: String => Column): DataFrame =
      rows.select(t.schema.fields.toIndexedSeq.map { f =>
        set.getOrElse(f.name, defaults(f.name)).cast(f.dataType).as(f.name)
      }: _*)

    var affected = 0L
    if (m.matchedActions.nonEmpty) {
      val joined = tgt.join(src, joinCond, "inner")
      // cardinality rule — one bounded limit(1) probe on the matched set
      val dup = joined.groupBy(tKeys.map(k => col(s"$ta.$k")): _*)
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1).limit(1).count()
      require(dup == 0,
        s"executeRaw: MERGE cardinality violation — a target row matches " +
          s"more than one source row: $sql")
      var prior: Column = lit(false)
      m.matchedActions.foreach { action =>
        val cond = action match {
          case UpdateAction(c, _, _)   => condCol(c)
          case DeleteAction(c)         => condCol(c)
          case UpdateStarAction(c)     => condCol(c)
          case other => throw new IllegalArgumentException(
            s"executeRaw: unsupported MATCHED action $other: $sql")
        }
        val eligible = joined.filter(cond && !prior)
        prior = prior || coalesce(cond, lit(false))
        action match {
          case UpdateAction(_, assignments, fromStar) =>
            val set = if (fromStar) starSetForUpdate
                      else { requireNoKeyAssign(setOf(assignments),
                               "WHEN MATCHED"); setOf(assignments) }
            affected += txn.upsert(t, tKeys,
              project(eligible, set, f => col(s"$ta.$f")))
          case UpdateStarAction(_) =>
            affected += txn.upsert(t, tKeys,
              project(eligible, starSetForUpdate, f => col(s"$ta.$f")))
          case DeleteAction(_) =>
            affected += txn.deleteWhereKeysIn(t, tKeys,
              eligible.select(tKeys.map(k => col(s"$ta.$k").as(k)): _*))
        }
      }
    }
    if (m.notMatchedActions.nonEmpty) {
      val srcOnly = src.join(tgt, joinCond, "left_anti")
      var prior: Column = lit(false)
      m.notMatchedActions.foreach { action =>
        val cond = action match {
          case InsertAction(c, _)  => condCol(c)
          case InsertStarAction(c) => condCol(c)
          case other => throw new IllegalArgumentException(
            s"executeRaw: unsupported NOT MATCHED action $other: $sql")
        }
        val eligible = srcOnly.filter(cond && !prior)
        prior = prior || coalesce(cond, lit(false))
        val set = action match {
          case InsertAction(_, assignments) => setOf(assignments)
          case _ => starSet
        }
        affected += txn.createMany(t,
          project(eligible, set, f => lit(null)), skipDuplicates = false)
      }
    }
    if (m.notMatchedBySourceActions.nonEmpty) {
      val tgtOnly = tgt.join(src, joinCond, "left_anti")
      // cardinality rule, target-only side: the apply path pairs rows BY
      // ON KEY (stagedUpsert dropDuplicates / deleteWhereKeysIn), so two
      // target-only rows sharing ON-key values would silently collapse
      // into one update (row loss) or co-delete under one row's
      // condition. Same bounded limit(1) probe as the matched branch.
      val dupT = tgtOnly.groupBy(tKeys.map(k => col(s"$ta.$k")): _*)
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1).limit(1).count()
      require(dupT == 0,
        s"executeRaw: MERGE cardinality violation — ON-key values " +
          s"identify more than one target-only row: $sql")
      var prior: Column = lit(false)
      m.notMatchedBySourceActions.foreach { action =>
        val cond = action match {
          case UpdateAction(c, _, _) => condCol(c)
          case DeleteAction(c)       => condCol(c)
          case other => throw new IllegalArgumentException(
            s"executeRaw: unsupported NOT MATCHED BY SOURCE action $other: $sql")
        }
        val eligible = tgtOnly.filter(cond && !prior)
        prior = prior || coalesce(cond, lit(false))
        action match {
          case UpdateAction(_, assignments, fromStar) =>
            val set = if (fromStar) starSetForUpdate
                      else { requireNoKeyAssign(setOf(assignments),
                               "WHEN NOT MATCHED BY SOURCE"); setOf(assignments) }
            affected += txn.upsert(t, tKeys,
              project(eligible, set, f => col(s"$ta.$f")))
          case DeleteAction(_) =>
            affected += txn.deleteWhereKeysIn(t, tKeys,
              eligible.select(tKeys.map(k => col(s"$ta.$k").as(k)): _*))
        }
      }
    }
    affected
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
