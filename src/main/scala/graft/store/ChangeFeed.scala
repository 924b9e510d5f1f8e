package graft.store

import org.apache.spark.sql.{Column, DataFrame}
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
    // markers are "__present_<tag>", NOT "__<tag>_present": the per-side
    // renames produce "__<tag>_<col>", so a column literally named
    // "present" would collide with the old marker spelling (GraftTable
    // additionally rejects "__"-prefixed schema columns, so the rename
    // targets themselves can never collide)
    // Null-keyed handling only exists when the schema can even PRODUCE a
    // null key — for the (common) non-nullable key, the filters and the
    // whole multiset subtree below are statically elided.
    val pkNullable = pk.exists(k => t.schema(k).nullable)
    def side(dirs: Map[String, String], tag: String) = {
      val base = t.readDirs(keys.flatMap(dirs.get))
      val keyed =
        if (!pkNullable) base
        else base.filter(pk.map(col(_).isNotNull).reduce(_ && _))
      others.foldLeft(keyed.withColumn(s"__present_$tag", lit(true))) {
        (d, c) => d.withColumnRenamed(c, s"__${tag}_$c")
      }
    }

    // NULL-keyed rows (a nullable unique key admits many of them) have no
    // pairing identity — a key join would either strand byte-identical
    // rows into spurious delete+insert (null-unsafe) or cross-pair every
    // old null row with every new one (null-safe). They diff as a
    // MULTISET on the full row instead: GROUP BY treats NULLs as equal,
    // so byte-equal rows cancel (no event, honoring the contract) and
    // only the count surplus emits deletes/inserts. Update pairing is
    // inherently undefined without identity.
    def nullKeyed(dirs: Map[String, String]) =
      t.readDirs(keys.flatMap(dirs.get))
        .filter(pk.map(col(_).isNull).reduce(_ || _))

    val j = side(oldDirs, "o").join(side(newDirs, "n"), pk, "full_outer")

    def img(tag: String) = struct(cols.map { c =>
      if (pk.contains(c)) col(c) else col(s"__${tag}_$c").as(c)
    }: _*)
    def ev(tag: String, t0: String) =
      struct(img(tag).as("row"), lit(t0).as("ct"))

    // Per-column change test. <=> rejects MapType (no defined ordering),
    // so map-bearing columns compare through a canonical JSON rendering
    // with the TOP-LEVEL map's keys sorted; maps nested deeper compare in
    // stored entry order — a reordered-but-equal nested map can emit a
    // spurious update pair (conservative direction: an extra event,
    // never a missed change).
    def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
    def canon(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case _: org.apache.spark.sql.types.MapType =>
        // sort entries by KEY ONLY (map keys are always orderable; a
        // default struct sort would also compare values, which may
        // themselves be maps — unorderable)
        to_json(map_from_entries(array_sort(map_entries(c), (l, r) =>
          when(l("key") < r("key"), lit(-1))
            .when(l("key") > r("key"), lit(1)).otherwise(lit(0)))))
      case _ => to_json(struct(c))
    }
    val valueChanged = others
      .map { c =>
        val dt = t.schema(c).dataType
        if (containsMap(dt))
          !(canon(col(s"__o_$c"), dt) <=> canon(col(s"__n_$c"), dt))
        else !(col(s"__o_$c") <=> col(s"__n_$c"))
      }
      .reduceOption(_ || _).getOrElse(lit(false))

    val evs = when(col("__present_n").isNull, array(ev("o", "delete")))
      .when(col("__present_o").isNull, array(ev("n", "insert")))
      .when(valueChanged,
        array(ev("o", "update_preimage"), ev("n", "update_postimage")))
      .otherwise(lit(null)) // byte-equal row in a rewritten slice: no event

    val keyedEvents = j.select(explode(evs).as("e"))
      .select((cols.map(c => col(s"e.row.$c")) :+
        col("e.ct").as("_change_type")): _*)

    if (!pkNullable) return keyedEvents

    // map-bearing columns cannot be GROUP BY keys — group on their
    // canonical rendering and carry a representative image. Non-map
    // columns are constant within a group, so first() is deterministic
    // for them; a map-bearing column's STORED entry order can differ
    // across canonically-equal rows, so first() would let the emitted
    // row image (and any hash over it) flap across runs/plans — those
    // take min_by over the raw JSON rendering instead: a deterministic
    // function of the group's value multiset, plan-independent.
    val unioned = nullKeyed(newDirs).withColumn("__w", lit(1L))
      .unionByName(nullKeyed(oldDirs).withColumn("__w", lit(-1L)))
    val groupKeys = cols.zipWithIndex.map { case (c, i) =>
      val dt = t.schema(c).dataType
      (if (containsMap(dt)) canon(col(c), dt) else col(c)).as(s"__k$i")
    }
    val nullDelta = unioned.groupBy(groupKeys: _*)
      .agg(sum(col("__w")).as("__d"), cols.map { c =>
        if (containsMap(t.schema(c).dataType))
          min_by(col(c), to_json(struct(col(c)))).as(c)
        else first(col(c)).as(c)
      }: _*)
      .filter(col("__d") =!= 0L)
    val nullEvents = nullDelta.select(
        (explode(array_repeat(
          when(col("__d") > 0, lit("insert")).otherwise(lit("delete")),
          abs(col("__d")).cast("int"))).as("_change_type") +:
          cols.map(col)): _*)
      .select((cols.map(col) :+ col("_change_type")): _*)

    keyedEvents.unionByName(nullEvents)
  }
}
