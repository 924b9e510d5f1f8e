package graft.store

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

object Catalog {
  /** Partition key used for tables with no declared partition columns —
    * the whole table is one slice. */
  val AllKey = "__all__"

  /** Encoded form of a NULL partition value (parquet partition dirs need a
    * token; mirrors Hive's default-partition idea with a private name). */
  val NullToken = "__NULL__"

  /** Filesystem/JSON-safe encoding of one partition value. MUST agree with
    * the Spark-side expression in [[GraftTable.partKeyCol]]
    * (`url_encode(cast(col as string))`, which is `URLEncoder.encode` with
    * UTF-8 underneath). */
  def encodeValue(v: Any): String = v match {
    case null    => NullToken
    case None    => NullToken
    case Some(x) => encodeValue(x)
    case other   => URLEncoder.encode(other.toString, StandardCharsets.UTF_8.name())
  }
}

/** Versioned, copy-on-write table catalog — the mutable-table layer the
  * reference gets from PostgreSQL (SURVEY §4.3).
  *
  * Spark DataFrames are immutable and parquet has no constraints, but the
  * reference mutates rows in place (`update`/`delete`/`upsert`,
  * `effect.ts:495-541`) and relies on unique indexes
  * (`migrations/20260102130331_init/migration.sql:77-90`) plus
  * `\$transaction` batches (`effect.ts:369-396`). This layer provides those
  * semantics Iceberg-style, minimally — and, crucially for 100 TB,
  * **partition-scoped**:
  *
  *   - the unit of copy-on-write is a (table, partition) slice, not the
  *     table: each slice version is a fresh immutable parquet directory
  *     `root/<table>/<partitionKey>/<version-uuid>/` (unpartitioned tables
  *     use the single slice `__all__`);
  *   - the catalog state is ONE manifest file mapping
  *     table → (partition key → current version), swapped atomically
  *     (write temp + POSIX rename), so a multi-table transaction commits
  *     all-or-nothing — the Spark analog of `\$transaction`'s sequential
  *     batch;
  *   - a mutation rewrites ONLY the slices it touches (computed from the
  *     mutation's predicate / incoming keys in [[GraftTable]]); a status
  *     flip on a status-partitioned 100 TB queue table rewrites two
  *     partitions, not 100 TB. Untouched slices keep their version id and
  *     their files are never opened for write — byte-identical across the
  *     commit;
  *   - readers resolve the manifest once per query → snapshot isolation
  *     (old versions remain readable until vacuumed);
  *   - optimistic concurrency: a commit re-reads the manifest and fails if
  *     the base version-map of any touched table moved (the driver is
  *     single-writer here; on a real cluster the same manifest would live
  *     in an object store with a CAS primitive or a lock service).
  */
final class Catalog(val root: String) {
  private val rootPath: Path = Paths.get(root)
  private val manifestPath: Path = rootPath.resolve("manifest.json")
  Files.createDirectories(rootPath)

  /** table name → (partition key → current version id), or empty map. */
  def manifest(): Map[String, Map[String, String]] =
    if (!Files.exists(manifestPath)) Map.empty
    else parse(Files.readString(manifestPath))

  /** Current partition-key → version map for one table. */
  def partVersions(table: String): Map[String, String] =
    manifest().getOrElse(table, Map.empty)

  def versionDir(table: String, partKey: String, version: String): String =
    rootPath.resolve(table).resolve(partKey).resolve(version).toString

  /** partition key → current slice directory for a table. */
  def currentDirs(table: String): Map[String, String] =
    partVersions(table).map { case (pk, v) => pk -> versionDir(table, pk, v) }

  /** Allocate a fresh (not-yet-committed) version directory for one
    * (table, partition) slice. */
  def newVersionDir(table: String, partKey: String): (String, String) = {
    val v = UUID.randomUUID().toString.replace("-", "")
    (v, versionDir(table, partKey, v))
  }

  /** Atomically publish new slice versions for a set of tables, verifying
    * each table's base version-map has not moved since the caller read it
    * (optimistic concurrency — the engine analog of Prisma's Serializable
    * isolation option, `internal/prismaNamespace.ts:885-892`).
    *
    * `updates`: table → (partition key → Some(newVersion) | None to drop
    * the slice — a partition emptied by delete / partition-moving update).
    */
  def commit(expectedBase: Map[String, Option[Map[String, String]]],
             updates: Map[String, Map[String, Option[String]]]): Unit = synchronized {
    val cur = manifest()
    expectedBase.foreach { case (t, expected) =>
      val actual = cur.get(t)
      if (actual != expected)
        throw new ConcurrentModificationException(
          s"table $t moved: expected ${expected.getOrElse("<none>")}, found ${actual.getOrElse("<none>")}")
    }
    val next = updates.foldLeft(cur) { case (m, (t, parts)) =>
      val merged = parts.foldLeft(m.getOrElse(t, Map.empty[String, String])) {
        case (pm, (pk, Some(v))) => pm + (pk -> v)
        case (pm, (pk, None))    => pm - pk
      }
      if (merged.isEmpty) m - t else m + (t -> merged)
    }
    val tmp = rootPath.resolve(s".manifest.${UUID.randomUUID()}.tmp")
    Files.write(tmp, render(next).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop all non-current slice version directories (snapshot GC). */
  def vacuum(): Unit = {
    val cur = manifest()
    if (Files.exists(rootPath)) {
      Files.list(rootPath).iterator().asScala
        .filter(p => Files.isDirectory(p)).foreach { tableDir =>
          val table = tableDir.getFileName.toString
          val keep = cur.getOrElse(table, Map.empty)
          Files.list(tableDir).iterator().asScala
            .filter(p => Files.isDirectory(p)).foreach { partDir =>
              val pk = partDir.getFileName.toString
              Files.list(partDir).iterator().asScala
                .filter(p => Files.isDirectory(p))
                .filter(p => !keep.get(pk).contains(p.getFileName.toString))
                .foreach(deleteRecursively)
            }
        }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  // minimal two-level JSON: {"table": {"partKey": "version", ...}, ...}
  // (partition keys are url-encoded → never contain `"` `{` `}`)
  private def render(m: Map[String, Map[String, String]]): String =
    m.toSeq.sortBy(_._1).map { case (t, parts) =>
      val inner = parts.toSeq.sorted
        .map { case (pk, v) => s""""$pk": "$v"""" }.mkString("{", ", ", "}")
      s""""$t": $inner"""
    }.mkString("{", ", ", "}")

  private def parse(s: String): Map[String, Map[String, String]] = {
    val tbl = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
    val pair = """"([^"]+)"\s*:\s*"([^"]+)"""".r
    tbl.findAllMatchIn(s).map { m =>
      m.group(1) -> pair.findAllMatchIn(m.group(2))
        .map(p => p.group(1) -> p.group(2)).toMap
    }.toMap
  }
}

final class ConcurrentModificationException(msg: String) extends RuntimeException(msg)
/** Prisma error P2002 equivalent (unique constraint violation). */
final class UniqueViolationException(msg: String) extends RuntimeException(msg)
/** Prisma error P2025 equivalent (record not found). */
final class RecordNotFoundException(msg: String) extends RuntimeException(msg)
