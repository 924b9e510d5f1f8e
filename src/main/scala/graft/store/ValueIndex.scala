package graft.store

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PERSISTENT secondary value index — the engine's answer to Prisma's
  * `@@index([col])` (the reference schema declares these on its hot
  * lookup columns) and the fourth leg of the persistent-index tier,
  * beside [[DedupIndex]] (near-dup sketches), [[AnnIndex]] (dense
  * vectors), and [[Bm25Index]] (keyword postings).
  *
  * The store already answers selective point predicates three ways —
  * partition pruning, zone-map sidecars, parquet blooms
  * ([[SliceStats]]) — but all three are LAYOUT-dependent: a predicate
  * on a column the table is neither partitioned nor clustered by
  * degrades to opening every slice's footer. A 100 TB table ordered by
  * ingest time answering `findMany(where: {source: "x"})` is exactly
  * Prisma's un-indexed-column story, and the fix is the same: a
  * secondary index.
  *
  *   - `__vidx_<name>_post` — (value, id), unique on (value, id),
  *     PARTITIONED BY `bucket` (stable xxhash64 of the value folded
  *     into `nBuckets`): a lookup reads ONLY the slices its probe
  *     values hash into, and a refresh rewrites only the buckets its
  *     delta's values touch;
  *   - `__vidx_<name>_meta` — one row (n_buckets) pinning the fan-out
  *     so a reopened handle routes probes exactly as the build did.
  *
  * Both commit atomically with the change-feed cursor pinned to the
  * indexed commit; [[refresh]] = [[CdfTail.drainOnce]] with ONE
  * combined MERGE staging (arriving images insert their new (value,
  * id) row, leaving images retire their old one — an update whose
  * value moved lands in the new value's bucket and leaves the old) —
  * crash-safe, exactly-once, OCC-fenced, the same lifecycle already
  * proven on the other three index families (RESTORE reaches the index
  * as inverse deltas; cursor-aware vacuum pins its preimages).
  *
  * NULL values are NOT indexed ([[postingsOf]] drops them): SQL
  * equality never selects NULL, and `IS NULL` probes keep their
  * zone-map path (null counts are in every sidecar).
  *
  * [[lookupIds]] is the query side: probe values route to buckets
  * through Spark's own xxhash64 (one LocalTableScan job), the postings
  * scan is partition-pruned to those buckets, and the result is the
  * matching id set — ZERO source-table jobs. [[fetch]] hydrates: the
  * id set semi-joins the source snapshot (broadcast — a selective
  * lookup's ids are small by definition; pair the source with an
  * id-clustered layout ([[GraftTable.compact]] `zorderBy`) so the
  * semi-join itself prunes slices via the sidecar stats).
  */
final class ValueIndex private (
    val src: GraftTable, val name: String,
    val valCol: String, val idCol: String,
    val post: GraftTable, val meta: GraftTable) {

  private def consumerId = s"vidx:$name"

  /** Pinned bucket fan-out — one bounded meta row. */
  def nBuckets(): Int = {
    val r = meta.snapshot().collect()
    require(r.length == 1, s"${meta.name}: no persisted meta — build first")
    r(0).getAs[Int]("n_buckets")
  }

  /** Source commit id the postings are current through. */
  def currentThrough(): Long = CdfTail.cursor(src, consumerId)

  /** Catch the postings up with the source's change feed — one drained
    * window, or None when caught up. Only the delta is re-projected;
    * only its values' buckets rewrite. */
  def refresh(): Option[(Long, Long)] = {
    val nb = nBuckets()
    CdfTail.drainOnce(src, consumerId) { (txn, ch, _, _) =>
      val chk = ch.localCheckpoint()
      val arriving = chk.filter(
        col("_change_type").isin("insert", "update_postimage"))
      val leaving = chk.filter(
        col("_change_type").isin("delete", "update_preimage"))
      val newPosts = ValueIndex.bucketed(
        ValueIndex.postingsOf(arriving, valCol, idCol), nb)
      val oldPosts = ValueIndex.bucketed(
        ValueIndex.postingsOf(leaving, valCol, idCol), nb)
        .localCheckpoint()
      txn.applyChanges(post,
        newPosts.withColumn("_change_type", lit("insert"))
          .unionByName(oldPosts.withColumn("_change_type", lit("delete"))))
      ()
    }
  }

  /** The id set asserting any of `values`, from the PERSISTED postings:
    * (value, id), partition-pruned to the probe values' buckets — zero
    * source-table jobs, lookup cost ∝ the probed values' posting rows. */
  def lookupIds(values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "no probe values")
    val probe = values.distinct
    val nb = nBuckets()
    // value → bucket through Spark's OWN hash on the indexed TYPE (one
    // LocalTableScan job) — a driver-side xxhash64 could silently drift
    val lits = probe.map(v => lit(v).cast(src.schema(valCol).dataType))
    val buckets = src.spark.range(1)
      .select(array(lits.map(l =>
        pmod(xxhash64(l), lit(nb)).cast("int")): _*).as("bs"))
      .select(explode(col("bs")))
      .distinct().collect().map(_.getInt(0)).toSeq
    post.snapshotWhere(
      col("bucket").isin(buckets.map(Int.box): _*) &&
        col("value").isin(probe: _*))
      .select(col("value"), col("id"))
  }

  /** Hydrated lookup: the source rows whose `valCol` is in `values` —
    * the index supplies the id set, a broadcast semi-join fetches the
    * rows. Equality with `snapshotWhere(col(valCol).isin(...))` is the
    * index's correctness contract (gate-audited). */
  def fetch(values: Seq[Any]): DataFrame =
    src.snapshot().join(
      broadcast(lookupIds(values).select(col("id").as(idCol)).distinct()),
      Seq(idCol), "left_semi")
}

object ValueIndex {

  private def metaSchema = StructType(Seq(
    StructField("mid", IntegerType, nullable = false),
    StructField("n_buckets", IntegerType, nullable = false)))

  /** (value, id) rows of the delta — NULL values are not indexed. */
  private[store] def postingsOf(rows: DataFrame, valCol: String,
                                idCol: String): DataFrame =
    rows.filter(col(valCol).isNotNull)
      .select(col(valCol).as("value"), col(idCol).as("id"))

  /** Stable value→slice routing (the [[Bm25Index.bucketed]] idea on the
    * raw value): the same value lands in the same bucket across builds
    * and refreshes. */
  private[store] def bucketed(posts: DataFrame, nBuckets: Int): DataFrame =
    posts.withColumn("bucket",
      pmod(xxhash64(col("value")), lit(nBuckets)).cast("int"))

  private def postTable(src: GraftTable, name: String, valCol: String,
                        idCol: String): GraftTable =
    new GraftTable(src.spark, src.catalog, s"__vidx_${name}_post",
      StructType(Seq(
        StructField("value", src.schema(valCol).dataType, nullable = false),
        StructField("id", src.schema(idCol).dataType, nullable = false),
        StructField("bucket", IntegerType, nullable = false))),
      uniqueKeys = Seq(Seq("value", "id")), partitionCols = Seq("bucket"))

  private def metaTable(src: GraftTable, name: String): GraftTable =
    new GraftTable(src.spark, src.catalog, s"__vidx_${name}_meta",
      metaSchema, uniqueKeys = Seq(Seq("mid")))

  /** Project the source's CURRENT snapshot and commit postings + meta +
    * the change-feed cursor in one transaction. */
  def build(src: GraftTable, name: String, valCol: String, idCol: String,
            nBuckets: Int = 16): ValueIndex = {
    require(nBuckets >= 1, s"nBuckets $nBuckets must be positive")
    val c0 = src.catalog.currentCommitId()
    val snap = src.snapshotAt(c0)
    val post = postTable(src, name, valCol, idCol)
    val meta = metaTable(src, name)
    val txn = new Txn(src.catalog)
    txn.createMany(post, bucketed(postingsOf(snap, valCol, idCol), nBuckets),
      skipDuplicates = false)
    txn.createMany(meta, src.spark.createDataFrame(
      java.util.Arrays.asList(Row(0, nBuckets)), metaSchema),
      skipDuplicates = false)
    txn.recordStreamBatch(src, s"cdf:vidx:$name", c0,
      src.catalog.manifest().get(Catalog.StreamTable))
    txn.commit()
    new ValueIndex(src, name, valCol, idCol, post, meta)
  }

  /** Re-open a previously built index — the fan-out comes from the meta
    * row; no project-the-corpus path exists here by construction. */
  def open(src: GraftTable, name: String, valCol: String,
           idCol: String): ValueIndex = {
    val idx = new ValueIndex(src, name, valCol, idCol,
      postTable(src, name, valCol, idCol), metaTable(src, name))
    idx.nBuckets() // fail fast when never built
    idx
  }
}
