package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Versioned, copy-on-write table catalog — the mutable-table layer the
  * reference gets from PostgreSQL (SURVEY §4.3).
  *
  * Spark DataFrames are immutable and parquet has no constraints, but the
  * reference mutates rows in place (`update`/`delete`/`upsert`,
  * `effect.ts:495-541`) and relies on unique indexes
  * (`migrations/20260102130331_init/migration.sql:77-90`) plus
  * `\$transaction` batches (`effect.ts:369-396`). This layer provides those
  * semantics Iceberg-style, minimally:
  *
  *   - every table version is a fresh immutable parquet directory
  *     `root/<table>/<version-uuid>/`;
  *   - the catalog state is ONE manifest file mapping table → current
  *     version, swapped atomically (write temp + POSIX rename), so a
  *     multi-table transaction commits all-or-nothing — the Spark analog of
  *     `\$transaction`'s sequential batch;
  *   - readers resolve the manifest once per query → snapshot isolation
  *     (old versions remain readable until vacuumed);
  *   - optimistic concurrency: a commit re-reads the manifest and fails if
  *     the base version of any touched table moved (the driver is
  *     single-writer here; on a real cluster the same manifest would live
  *     in an object store with a CAS primitive or a lock service).
  *
  * At 100 TB the per-version directories are partitioned table roots and the
  * copy-on-write rewrite narrows to touched partitions; the manifest/commit
  * protocol is unchanged.
  */
final class Catalog(val root: String) {
  private val rootPath: Path = Paths.get(root)
  private val manifestPath: Path = rootPath.resolve("manifest.json")
  Files.createDirectories(rootPath)

  /** table name → current version id (uuid string), or empty map. */
  def manifest(): Map[String, String] =
    if (!Files.exists(manifestPath)) Map.empty
    else parse(Files.readString(manifestPath))

  def versionDir(table: String, version: String): String =
    rootPath.resolve(table).resolve(version).toString

  def currentDir(table: String): Option[String] =
    manifest().get(table).map(v => versionDir(table, v))

  /** Allocate a fresh (not-yet-committed) version directory for a table. */
  def newVersionDir(table: String): (String, String) = {
    val v = UUID.randomUUID().toString.replace("-", "")
    (v, versionDir(table, v))
  }

  /** Atomically publish new versions for a set of tables, verifying each
    * table's base version has not moved since the caller read it
    * (optimistic concurrency — the engine analog of Prisma's
    * Serializable isolation option, `internal/prismaNamespace.ts:885-892`). */
  def commit(expectedBase: Map[String, Option[String]],
             newVersions: Map[String, String]): Unit = synchronized {
    val cur = manifest()
    expectedBase.foreach { case (t, expected) =>
      val actual = cur.get(t)
      if (actual != expected)
        throw new ConcurrentModificationException(
          s"table $t moved: expected ${expected.getOrElse("<none>")}, found ${actual.getOrElse("<none>")}")
    }
    val next = cur ++ newVersions
    val tmp = rootPath.resolve(s".manifest.${UUID.randomUUID()}.tmp")
    Files.write(tmp, render(next).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop all non-current version directories (snapshot GC). */
  def vacuum(): Unit = {
    val cur = manifest()
    if (Files.exists(rootPath)) {
      Files.list(rootPath).iterator().asScala
        .filter(p => Files.isDirectory(p)).foreach { tableDir =>
          val table = tableDir.getFileName.toString
          val keep = cur.get(table)
          Files.list(tableDir).iterator().asScala
            .filter(p => Files.isDirectory(p))
            .filter(p => !keep.contains(p.getFileName.toString))
            .foreach(deleteRecursively)
        }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  // minimal flat string->string JSON (keys are table names, values uuids)
  private def render(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s""""$k": "$v"""" }
      .mkString("{", ", ", "}")

  private def parse(s: String): Map[String, String] = {
    val pair = """"([^"]+)"\s*:\s*"([^"]+)"""".r
    pair.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap
  }
}

final class ConcurrentModificationException(msg: String) extends RuntimeException(msg)
/** Prisma error P2002 equivalent (unique constraint violation). */
final class UniqueViolationException(msg: String) extends RuntimeException(msg)
/** Prisma error P2025 equivalent (record not found). */
final class RecordNotFoundException(msg: String) extends RuntimeException(msg)
