package graft.store

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Planning-time file skipping for the COW store, as a Spark `FileIndex`
  * — the Delta/Iceberg integration shape: instead of asking callers to
  * route predicates through [[GraftTable.snapshotWhere]], the snapshot
  * becomes a `HadoopFsRelation` over this index, and `FileSourceStrategy`
  * hands the index every pushed-down data filter at PLANNING time. Any
  * `.filter` composed anywhere downstream of the scan — DataFrame API,
  * SQL over a registered view, a join's pushed-through predicate — prunes
  * slices and files before the first task launches, and the scan itself
  * is Spark's own vectorized parquet reader with the same filters pushed
  * to row-group level (`PushedFilters` in explain).
  *
  * The index PINS one manifest snapshot at construction (COW dirs are
  * immutable, so a pinned listing can never see torn writes — the same
  * snapshot-isolation argument as [[GraftTable.snapshot]]); `refresh()`
  * is a no-op because a new read should build a new relation, not mutate
  * a plan another query may still hold. Pruning reuses the
  * [[SliceStats]] sidecar domain at both granularities — slice merged
  * ranges first, then per-file footer ranges (what a z-order
  * [[GraftTable.compact]] sharpens) — and anything the stats domain
  * cannot prove falls back to scanning (missing sidecar, unrecognized
  * conjunct: correctness never depends on skipping). At 100 TB the win
  * is the same as [[GraftTable.snapshotWhere]]'s, minus the API coupling:
  * non-matching slices are dropped before file listing reaches the scan.
  */
class GraftFileIndex(spark: SparkSession, tableName: String,
                     dirs: Seq[String], dataSchema: StructType)
    extends FileIndex {

  // pinned at construction: slice dir -> (sidecar stats, parquet files).
  // Listing up front is one metadata pass over a bounded dir set (the
  // manifest's slice list), not a recursive crawl.
  private val slices: Seq[(String, Option[SliceStats.Stats], Array[FileStatus])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.map { dir =>
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.exists(p))
          fs.listStatus(p).filter(s =>
            s.isFile && s.getPath.getName.endsWith(".parquet"))
        else Array.empty[FileStatus]
      (dir, SliceStats.readSidecar(dir), files)
    }
  }

  /** Last planning decision (kept vs total files) — spec/report
    * instrumentation, mirrors [[GraftTable.prunedPaths]]'s skip ratio. */
  @volatile private[graft] var lastKeptFiles: Int = -1
  @volatile private[graft] var lastTotalFiles: Int = -1

  override def rootPaths: Seq[Path] = dirs.map(new Path(_))

  // no partition columns at the relation level: slice layout is a store
  // detail, so EVERY predicate arrives as a data filter and the stats
  // domain (which understands partition values too — they are ordinary
  // columns in the sidecar) decides
  override def partitionSchema: StructType = StructType(Nil)

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = slices.iterator
    .flatMap(_._3.iterator.map(_.getLen)).sum

  override def inputFiles: Array[String] =
    slices.flatMap(_._3.map(_.getPath.toString)).toArray

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val cs = (partitionFilters ++ dataFilters).flatMap(SliceStats.conjuncts)
    var total = 0
    val kept = slices.flatMap { case (dir, sidecar, files) =>
      total += files.length
      sidecar match {
        case Some(st) =>
          if (!cs.forall(c => SliceStats.mayMatch(c, st))) Nil
          else if (st.files.isEmpty) files.toSeq // legacy sidecar: whole slice
          else files.toSeq.filter { f =>
            st.files.get(f.getPath.getName) match {
              case Some(fst) => fst.rows > 0 &&
                cs.forall(c => SliceStats.mayMatch(c,
                  SliceStats.Stats(fst.rows, fst.cols))) &&
                // point-lookup layer: per-file bloom rejection on
                // equality/IN conjuncts (ranges overlap, membership not)
                cs.forall(c => SliceStats.bloomMayMatch(c, fst))
              case None => true // file unknown to the sidecar: never skip
            }
          }
        case None => files.toSeq // no sidecar: never skip
      }
    }
    lastKeptFiles = kept.size
    lastTotalFiles = total
    if (kept.isEmpty) Nil
    else Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}
