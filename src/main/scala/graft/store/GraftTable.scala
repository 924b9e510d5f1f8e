package graft.store

import graft.query.Where
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The write side of the Prisma model surface (SURVEY §2.A #6–14, #19)
  * over a [[Catalog]]-managed copy-on-write table.
  *
  * Mutations never touch existing files: each op computes the next table
  * state as a DataFrame and stages a new version; [[Txn.commit]] (or the
  * auto-commit wrappers here) publishes staged versions atomically.
  *
  * Unique keys are enforced engine-side (parquet has no indexes): inserts
  * anti-join the incoming batch against the current snapshot and against
  * itself. `skipDuplicates=true` mirrors `createMany({skipDuplicates})`
  * (`effect.ts:479-485`) and the swallowed unique-violation insert of
  * `extractGooglePlaces.ts:305-317`; `false` throws the P2002 equivalent.
  *
  * Timestamps: `createdAt` defaults to now() on insert, `updatedAt` is
  * touched on every write that changes a row — the `@default(now())` /
  * `@updatedAt` behavior of `schema.prisma:26-27`.
  */
final class GraftTable(
    val spark: SparkSession,
    val catalog: Catalog,
    val name: String,
    val schema: StructType,
    val uniqueKeys: Seq[Seq[String]] = Nil,
    val timestampCols: Seq[String] = Nil,
    /** Physical layout: every version is written partitioned by these
      * columns, so selective reads (e.g. the `status IS NULL` poll slice,
      * `runner/locator.ts:61-67`) prune partitions at the scan — the
      * SURVEY §4.2 "partition status-polled tables by status/date"
      * requirement for the 100 TB layout. */
    val partitionCols: Seq[String] = Nil) {

  private def emptyDf: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Current committed snapshot (empty DataFrame before first insert).
    * Columns re-aligned to the declared order (partitioned reads surface
    * partition columns last). */
  def snapshot(): DataFrame =
    catalog.currentDir(name)
      .map(d => spark.read.schema(schema).parquet(d)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*))
      .getOrElse(emptyDf)

  private def touch(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.filter(timestampCols.contains).filter(schema.fieldNames.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, current_timestamp()))

  private def align(df: DataFrame): DataFrame =
    df.select(schema.fieldNames.map(col).toIndexedSeq: _*)

  // ---------- single-op auto-commit surface ----------

  def create(rows: DataFrame): Long = autoCommit(_.create(this, rows))
  def createMany(rows: DataFrame, skipDuplicates: Boolean = false): Long =
    autoCommit(_.createMany(this, rows, skipDuplicates))
  /** createManyAndReturn (`effect.ts:487-493`): bulk insert returning the
    * actually-inserted rows (duplicates excluded under skipDuplicates). */
  def createManyAndReturn(rows: DataFrame, skipDuplicates: Boolean = false): DataFrame = {
    val txn = new Txn(catalog)
    val out = txn.createManyAndReturn(this, rows, skipDuplicates)
    txn.commit()
    out
  }
  /** updateManyAndReturn (`effect.ts:527-533`): bulk update returning the
    * post-update state of every matched row. */
  def updateManyAndReturn(where: Where, set: Map[String, Column]): DataFrame = {
    val txn = new Txn(catalog)
    val out = txn.updateManyAndReturn(this, where, set)
    txn.commit()
    out
  }
  def update(where: Where, set: Map[String, Column]): Long =
    autoCommit(_.update(this, where, set))
  def updateMany(where: Where, set: Map[String, Column]): Long =
    autoCommit(_.updateMany(this, where, set))
  def delete(where: Where): Long = autoCommit(_.delete(this, where))
  def deleteMany(where: Where): Long = autoCommit(_.deleteMany(this, where))
  def upsert(keyCols: Seq[String], rows: DataFrame): Long =
    autoCommit(_.upsert(this, keyCols, rows))

  private def autoCommit(f: Txn => Long): Long = {
    val txn = new Txn(catalog)
    val n = f(txn)
    txn.commit()
    n
  }

  // ---------- staged (transactional) computation ----------

  private[store] def stagedCreate(current: DataFrame, rows: DataFrame,
                                  skipDuplicates: Boolean, failOnDup: Boolean): (DataFrame, Long) = {
    var incoming = touch(align(rows), timestampCols)
    // in-batch dedup per unique key (first occurrence wins)
    uniqueKeys.foreach { uk => incoming = incoming.dropDuplicates(uk) }
    // cross-check against the current snapshot
    var clean = incoming
    uniqueKeys.foreach { uk =>
      clean = clean.join(current.select(uk.map(col): _*), uk, "left_anti")
    }
    if (failOnDup) {
      val dropped = incoming.count() - clean.count()
      if (dropped > 0 || rows.count() != incoming.count())
        throw new UniqueViolationException(
          s"$name: unique constraint would be violated on ${uniqueKeys.mkString(",")}")
    }
    val n = clean.count()
    (current.unionByName(clean), n)
  }

  /** stagedCreate variant that also returns the inserted slice
    * (createManyAndReturn, `effect.ts:487-493`). */
  private[store] def stagedCreateReturning(current: DataFrame, rows: DataFrame,
                                           skipDuplicates: Boolean): (DataFrame, DataFrame, Long) = {
    var incoming = touch(align(rows), timestampCols)
    uniqueKeys.foreach { uk => incoming = incoming.dropDuplicates(uk) }
    var clean = incoming
    uniqueKeys.foreach { uk =>
      clean = clean.join(current.select(uk.map(col): _*), uk, "left_anti")
    }
    if (!skipDuplicates) {
      val dropped = incoming.count() - clean.count()
      if (dropped > 0 || rows.count() != incoming.count())
        throw new UniqueViolationException(
          s"$name: unique constraint would be violated on ${uniqueKeys.mkString(",")}")
    }
    val n = clean.count()
    (current.unionByName(clean), clean, n)
  }

  /** stagedUpdate variant that also returns the post-update matched slice
    * (updateManyAndReturn, `effect.ts:527-533`). */
  private[store] def stagedUpdateReturning(current: DataFrame, where: Where,
                                           set: Map[String, Column]): (DataFrame, DataFrame, Long) = {
    val rawCond = Where.compile(where, current.apply)
    val matched = current.filter(rawCond).count()
    val withCond = current.withColumn("__upd", coalesce(rawCond, lit(false)))
    val cond = col("__upd")
    val updated = current.columns.foldLeft(withCond) { (df, c) =>
      set.get(c) match {
        case Some(newVal) => df.withColumn(c, when(cond, newVal).otherwise(col(c)))
        case None if schema.fieldNames.contains("updatedAt") && c == "updatedAt" &&
          timestampCols.contains("updatedAt") =>
          df.withColumn(c, when(cond, current_timestamp()).otherwise(col(c)))
        case None => df
      }
    }
    (updated.drop("__upd"), updated.filter(cond).drop("__upd"), matched)
  }

  private[store] def stagedUpdate(current: DataFrame, where: Where,
                                  set: Map[String, Column], single: Boolean): (DataFrame, Long) = {
    val rawCond = Where.compile(where, current.apply)
    val matched = current.filter(rawCond).count()
    if (single && matched == 0)
      throw new RecordNotFoundException(s"$name: update found no row")
    // materialize the predicate BEFORE any column is rewritten — a `when`
    // chain re-resolving the condition against already-updated columns
    // would silently stop matching mid-update
    val withCond = current.withColumn("__upd", coalesce(rawCond, lit(false)))
    val cond = col("__upd")
    val next = current.columns.foldLeft(withCond) { (df, c) =>
      set.get(c) match {
        case Some(newVal) => df.withColumn(c, when(cond, newVal).otherwise(col(c)))
        case None if schema.fieldNames.contains("updatedAt") && c == "updatedAt" &&
          timestampCols.contains("updatedAt") =>
          df.withColumn(c, when(cond, current_timestamp()).otherwise(col(c)))
        case None => df
      }
    }.drop("__upd")
    (next, matched)
  }

  /** Join-based bulk update: set `set` on rows whose `keyCol` appears in
    * `keys` (and that satisfy `extraCond`). Distributed equivalent of
    * `UPDATE … WHERE id IN (SELECT …)` — used by the pipeline to flip
    * statuses for a whole processed slice without collecting ids to the
    * driver (the keys side is a small DataFrame → AQE broadcasts it). */
  private[store] def stagedUpdateWhereIn(current: DataFrame, keyCol: String,
                                         keys: DataFrame, extraCond: Column,
                                         set: Map[String, Column]): (DataFrame, Long) = {
    val marker = keys.select(col(keyCol)).distinct().withColumn("__match", lit(true))
    // materialize the predicate before rewriting columns (see stagedUpdate)
    val joined = current.join(marker, Seq(keyCol), "left")
      .withColumn("__upd", coalesce(col("__match"), lit(false)) && coalesce(extraCond, lit(false)))
    val cond = col("__upd")
    val matched = joined.filter(cond).count()
    val next = current.columns.foldLeft(joined) { (df, c) =>
      set.get(c) match {
        case Some(newVal) => df.withColumn(c, when(cond, newVal).otherwise(col(c)))
        case None if timestampCols.contains(c) && c == "updatedAt" &&
          schema.fieldNames.contains("updatedAt") =>
          df.withColumn(c, when(cond, current_timestamp()).otherwise(col(c)))
        case None => df
      }
    }.drop("__match", "__upd")
    (next, matched)
  }

  private[store] def stagedDelete(current: DataFrame, where: Where,
                                  single: Boolean): (DataFrame, Long) = {
    val cond = Where.compile(where, current.apply)
    val matched = current.filter(cond).count()
    if (single && matched == 0)
      throw new RecordNotFoundException(s"$name: delete found no row")
    (current.filter(!coalesce(cond, lit(false))), matched)
  }

  /** MERGE: rows whose key exists replace the existing row (update wins),
    * the rest append — Prisma `upsert` (`effect.ts:535-541`). */
  private[store] def stagedUpsert(current: DataFrame, keyCols: Seq[String],
                                  rows: DataFrame): (DataFrame, Long) = {
    val incoming = touch(align(rows), timestampCols).dropDuplicates(keyCols)
    val kept = current.join(incoming.select(keyCols.map(col): _*), keyCols, "left_anti")
    val n = incoming.count()
    (kept.unionByName(incoming), n)
  }
}

/** Multi-statement transaction: stage any number of table mutations, then
  * publish all new versions in one atomic manifest swap — the engine's
  * `\$transaction` (`effect.ts:369-396`). If any statement throws, nothing
  * was published. */
final class Txn(catalog: Catalog) {
  private var base: Map[String, Option[String]] = Map.empty
  private var staged: Map[String, String] = Map.empty
  // table -> working state (chains statements within the txn)
  private var working: Map[String, DataFrame] = Map.empty

  private def stateOf(t: GraftTable): DataFrame =
    working.getOrElse(t.name, {
      base += (t.name -> t.catalog.manifest().get(t.name))
      t.snapshot()
    })

  private def stage(t: GraftTable, next: DataFrame): Unit = {
    val (v, dir) = catalog.newVersionDir(t.name)
    val writer = next.write.mode("overwrite")
    (if (t.partitionCols.nonEmpty) writer.partitionBy(t.partitionCols: _*) else writer)
      .parquet(dir)
    // re-read what we wrote: the staged version is now immutable on disk,
    // so later statements in the txn build on real files, not a recompute
    val persisted = t.spark.read.schema(t.schema).parquet(dir)
      .select(t.schema.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    working += (t.name -> persisted)
    staged += (t.name -> v)
  }

  def create(t: GraftTable, rows: DataFrame): Long = {
    val (next, n) = t.stagedCreate(stateOf(t), rows, skipDuplicates = false, failOnDup = true)
    stage(t, next); n
  }

  def createMany(t: GraftTable, rows: DataFrame, skipDuplicates: Boolean): Long = {
    val (next, n) = t.stagedCreate(stateOf(t), rows, skipDuplicates, failOnDup = !skipDuplicates)
    stage(t, next); n
  }

  def createManyAndReturn(t: GraftTable, rows: DataFrame, skipDuplicates: Boolean): DataFrame = {
    val (next, inserted, _) = t.stagedCreateReturning(stateOf(t), rows, skipDuplicates)
    // evaluate the inserted slice against pre-stage state before publishing
    val out = inserted.cache()
    out.count()
    stage(t, next); out
  }

  def updateManyAndReturn(t: GraftTable, where: Where, set: Map[String, Column]): DataFrame = {
    val (next, updated, _) = t.stagedUpdateReturning(stateOf(t), where, set)
    val out = updated.cache()
    out.count()
    stage(t, next); out
  }

  def update(t: GraftTable, where: Where, set: Map[String, Column]): Long = {
    val (next, n) = t.stagedUpdate(stateOf(t), where, set, single = true)
    stage(t, next); n
  }

  def updateMany(t: GraftTable, where: Where, set: Map[String, Column]): Long = {
    val (next, n) = t.stagedUpdate(stateOf(t), where, set, single = false)
    stage(t, next); n
  }

  def updateWhereIn(t: GraftTable, keyCol: String, keys: DataFrame,
                    extraCond: Column, set: Map[String, Column]): Long = {
    val (next, n) = t.stagedUpdateWhereIn(stateOf(t), keyCol, keys, extraCond, set)
    stage(t, next); n
  }

  /** Join-based bulk delete: drop rows whose `keyCol` appears in `keys`. */
  def deleteWhereIn(t: GraftTable, keyCol: String, keys: DataFrame): Long = {
    val cur = stateOf(t)
    val marker = keys.select(org.apache.spark.sql.functions.col(keyCol)).distinct()
    val n = cur.join(marker, Seq(keyCol), "left_semi").count()
    val next = cur.join(marker, Seq(keyCol), "left_anti")
    stage(t, next); n
  }

  def delete(t: GraftTable, where: Where): Long = {
    val (next, n) = t.stagedDelete(stateOf(t), where, single = true)
    stage(t, next); n
  }

  def deleteMany(t: GraftTable, where: Where): Long = {
    val (next, n) = t.stagedDelete(stateOf(t), where, single = false)
    stage(t, next); n
  }

  def upsert(t: GraftTable, keyCols: Seq[String], rows: DataFrame): Long = {
    val (next, n) = t.stagedUpsert(stateOf(t), keyCols, rows)
    stage(t, next); n
  }

  /** Read within the transaction (sees staged, uncommitted state). */
  def read(t: GraftTable): DataFrame = stateOf(t)

  def commit(): Unit = if (staged.nonEmpty) catalog.commit(base, staged)
}

object Txn {
  /** Interactive-transaction closure (`\$transaction(async tx => …)`):
    * stage inside, commit on success, publish nothing on failure. */
  def run[A](catalog: Catalog)(body: Txn => A): A = {
    val txn = new Txn(catalog)
    val out = body(txn)
    txn.commit()
    out
  }
}
