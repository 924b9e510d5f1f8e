package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change data feed: the row-level difference between two committed
  * versions of a [[GraftTable]] — Delta/Iceberg `table_changes()` for
  * the COW store, and the incremental hand-off a training pipeline uses
  * to reprocess ONLY what moved between two corpus snapshots (re-embed
  * changed docs, invalidate dedup clusters, ship a delta to a feature
  * store) instead of re-reading 100 TB.
  *
  * Scale shape: the manifest diff prunes FIRST — a slice whose version
  * pointer is identical in both commits is byte-identical under COW
  * (mutations never rewrite untouched slices), so only MOVED slices are
  * read on either side. A status-flip commit on a 10k-slice table diffs
  * exactly the flipped slices, not the table. What survives pruning
  * diffs through ONE full-outer sort-merge join on the primary key
  * (both sides shuffle once, partition-count bounded by the changed
  * data, never the table), and classification + pre/post-image fan-out
  * are codegen'd expressions on the joined row.
  *
  * Row classification (the Delta CDF vocabulary): `insert`, `delete`,
  * and for value changes an `update_preimage` + `update_postimage`
  * pair. A slice rewrite that leaves a row byte-equal (e.g. an UPDATE
  * whose SET matches the old value, or compaction) emits nothing —
  * membership in a rewritten slice is not a change.
  */
object ChangeFeed {

  /** Commit 0 is the empty pre-history manifest (no archived file), a
    * legitimate CDF lower bound: the feed from 0 is "everything, as
    * inserts". */
  private def dirsAt(t: GraftTable, id: Long): Map[String, String] =
    if (id == 0) Map.empty else t.catalog.dirsAt(t.name, id)

  /** Slice keys whose version pointer moved between the two commits —
    * the file-skipping set (public so specs and operators can assert
    * the pruning really happened). */
  def changedSliceKeys(t: GraftTable, fromId: Long, toId: Long): Set[String] = {
    val o = dirsAt(t, fromId)
    val n = dirsAt(t, toId)
    (o.keySet ++ n.keySet).filter(k => o.get(k) != n.get(k))
  }

  /** The change feed from commit `fromId` to commit `toId` (both must be
    * within vacuum retention). Output: the table's columns (image values
    * — old for delete/preimage, new for insert/postimage) plus
    * `_change_type`. Requires a unique key to pair rows across versions.
    */
  def changesBetween(t: GraftTable, fromId: Long, toId: Long): DataFrame = {
    val pk: Seq[String] = t.uniqueKeys.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"${t.name}: changesBetween needs a unique key to pair row versions"))
    val cols = t.schema.fieldNames.toSeq
    val others = cols.filterNot(pk.contains)

    val oldDirs = dirsAt(t, fromId)
    val newDirs = dirsAt(t, toId)
    val keys = changedSliceKeys(t, fromId, toId).toSeq.sorted
    def side(dirs: Map[String, String], tag: String) =
      others.foldLeft(
        t.readDirs(keys.flatMap(dirs.get))
          .withColumn(s"__${tag}_present", lit(true))) {
        (d, c) => d.withColumnRenamed(c, s"__${tag}_$c")
      }

    val j = side(oldDirs, "o").join(side(newDirs, "n"), pk, "full_outer")

    def img(tag: String) = struct(cols.map { c =>
      if (pk.contains(c)) col(c) else col(s"__${tag}_$c").as(c)
    }: _*)
    def ev(tag: String, t0: String) =
      struct(img(tag).as("row"), lit(t0).as("ct"))

    val valueChanged = others
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    val evs = when(col("__n_present").isNull, array(ev("o", "delete")))
      .when(col("__o_present").isNull, array(ev("n", "insert")))
      .when(valueChanged,
        array(ev("o", "update_preimage"), ev("n", "update_postimage")))
      .otherwise(lit(null)) // byte-equal row in a rewritten slice: no event

    j.select(explode(evs).as("e"))
      .select((cols.map(c => col(s"e.row.$c")) :+
        col("e.ct").as("_change_type")): _*)
  }
}
