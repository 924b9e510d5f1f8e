package graft.store

import org.apache.spark.sql.DataFrame

/** Nested relation writes — the engine's generic equivalent of Prisma's
  * `create({data: {..., relation: {create | connectOrCreate: ...}}})`
  * surface (declared at `src/db/client/effect.ts:471-477`; used by every
  * write in the reference: nested M-N create + connectOrCreate in
  * `scrapeWebsite.ts:215-241`, nested 1-1 create in `syncCrm.ts:156-163`).
  *
  * Batch-first translation: the incoming parent batch may carry extra
  * payload columns (arrays, structs — the nested input). The parent create
  * aligns them away; each nested write receives the batch slice that was
  * ACTUALLY inserted (parent unique-key semi-join, mirroring Prisma's
  * per-created-record nested semantics) with payload columns intact, and
  * derives the child rows from it. All writes stage inside one
  * transaction — parent and children publish atomically.
  */
sealed trait NestedWrite

/** 1-1 / 1-N nested create: derive child rows from the inserted parent
  * slice (`relation: {create: ...}`). */
final case class NestedCreate(
    table: GraftTable,
    rows: DataFrame => DataFrame,
    skipDuplicates: Boolean = false) extends NestedWrite

/** M-N `connectOrCreate` + link: ensure the related rows exist (create the
  * missing ones, by the relation table's unique key — `skipDuplicates`
  * create), then create the join-table rows. Mirrors
  * `scrapeWebsite.ts:224-236` (tags connectOrCreate by unique name). */
final case class ConnectOrCreate(
    relation: GraftTable,
    ensure: DataFrame => DataFrame,
    link: GraftTable,
    links: DataFrame => DataFrame) extends NestedWrite
