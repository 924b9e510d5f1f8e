package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.statistics._
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** Slice-level column statistics for manifest-side data skipping — the
  * Iceberg/Delta file-skipping idea applied to the store's unit of
  * copy-on-write (a partition slice version).
  *
  * Collection is O(files), not O(rows): the numbers come out of the parquet
  * FOOTERS the write already produced (min / max / null count per column
  * chunk, merged across row groups and files) and are pinned into one tiny
  * `_graft_stats.json` sidecar inside the slice version directory. The
  * sidecar shares the slice's lifecycle for free: it becomes visible with
  * the same atomic manifest commit that publishes the version, is immutable
  * afterwards, and [[Catalog.vacuum]] reclaims it with the directory. The
  * leading underscore keeps every parquet reader (Spark's included) from
  * picking it up as data.
  *
  * Reading side: [[GraftTable.snapshotWhere]] evaluates a predicate's
  * simple conjuncts (`col op literal`, `IN`, `IS [NOT] NULL`) against each
  * slice's ranges and SKIPS slices that provably cannot match — before any
  * parquet footer of the slice itself is opened. At 100 TB that's the
  * difference between "open 2 M footers to learn 1.9 M are irrelevant" and
  * "read 10 K sidecar summaries": scan-side row-group pruning still happens
  * afterwards, this layer just removes whole slices from the listing.
  * Stats are a PRUNING AID only, never a correctness dependency: the full
  * predicate is always re-applied to what survives, an absent/stale sidecar
  * or an unparseable conjunct merely disables skipping for that slice or
  * clause.
  */
object SliceStats {

  val SidecarName = "_graft_stats.json"

  /** Merged per-column footer statistics of one slice or file.
    * `min`/`max` are None when parquet omitted them (all-null chunk, NaN
    * poisoning, or oversized binary values) — such a column still prunes
    * IS [NOT] NULL via the counts when those are complete. */
  final case class ColStats(min: Option[Any], max: Option[Any],
                            nulls: Option[Long])

  /** Per-file parquet bloom filters of one column: the physical-type tag
    * the hash must encode against (`i32`/`i64`/`f32`/`f64`/`bin`) and one
    * split-block bitset per row group. Only trusted when EVERY row group
    * of the file carries a filter — a bloom-less row group could hold the
    * probed value, so a partial set must not reject the file. */
  final case class ColBlooms(ptype: String, bitsets: Seq[Array[Byte]])

  final case class FileStats(rows: Long, cols: Map[String, ColStats],
                             blooms: Map[String, ColBlooms] = Map.empty)

  /** Slice totals + the per-file breakdown. File granularity is what makes
    * z-order compaction pay: the slice-level range of a clustered column
    * is unchanged, but each FILE covers a narrow band the read can skip. */
  final case class Stats(rows: Long, cols: Map[String, ColStats],
                         files: Map[String, FileStats] = Map.empty)

  // ---------------------------------------------------------------- collect

  private type Acc = Map[String, Option[(Any, Any, Long)]]

  private def mergeAcc(a: Acc, b: Acc): Acc =
    (a.keySet ++ b.keySet).map { k =>
      k -> ((a.get(k), b.get(k)) match {
        case (Some(Some((m0, x0, n0))), Some(Some((m1, x1, n1)))) =>
          Some((mergeMin(m0, m1), mergeMax(x0, x1), n0 + n1))
        case (Some(e), None) => e
        case (None, Some(e)) => e
        case _ => None // anything unknown poisons the column
      })
    }.toMap

  private def finish(acc: Acc): Map[String, ColStats] =
    acc.collect { case (c, Some((mn, mx, n))) =>
      c -> ColStats(Option(mn), Option(mx), Some(n))
    }

  /** Physical-type tag the bloom hash must encode against; None = no
    * bloom support for this column (boolean/INT96/FLBA/decimal — decimal
    * literals only survive to the read side as scaled doubles, which
    * cannot reproduce the unscaled plain encoding the writer hashed). */
  private def bloomTag(tpe: org.apache.parquet.schema.PrimitiveType): Option[String] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    if (decimalScale(tpe).isDefined) None
    else tpe.getPrimitiveTypeName match {
      case INT32  => Some("i32")
      case INT64  => Some("i64")
      case FLOAT  => Some("f32")
      case DOUBLE => Some("f64")
      case BINARY => Some("bin")
      case _      => None
    }
  }

  /** A chunk the writer left FULLY DICTIONARY-ENCODED carries no bloom
    * filter — parquet-mr drops it by design, the dictionary already
    * being an exact membership list. (Observed concretely: a corpus
    * whose values repeat ~10× dictionary-encodes and loses every bloom;
    * the same column with unique values falls back to plain and keeps
    * them.) Scan-time readers exploit the dictionary; our PLANNING-time
    * index cannot, so point lookups on such files lost all pruning.
    * Synthesize the bitset FROM the dictionary entries instead: bounded
    * driver work (dictionary entries only — capped by parquet's dict
    * page size), same split-block format and XXH64 the writer uses, and
    * exactly as precise as a writer bloom at the same 1% FPP because the
    * inputs are the chunk's true value set. Only columns the table
    * DECLARED for blooms pay (`wantBloom`). */
  private def dictBloom(reader: ParquetFileReader,
                        block: org.apache.parquet.hadoop.metadata.BlockMetaData,
                        cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
                        tag: String): Option[(String, Array[Byte])] = {
    val es = cc.getEncodingStats
    if (es == null || es.hasNonDictionaryEncodedPages || !es.hasDictionaryPages)
      return None
    try {
      val desc = reader.getFileMetaData.getSchema
        .getColumnDescription(cc.getPath.toArray)
      // widen to the public interface: the concrete reader class is
      // package-private in parquet-mr
      val store: org.apache.parquet.column.page.DictionaryPageReadStore =
        reader.getDictionaryReader(block)
      val page = store.readDictionaryPage(desc)
      if (page == null) return None
      val dict = page.getEncoding.initDictionary(desc, page)
      val n = dict.getMaxId + 1
      if (n <= 0) return None // empty dictionary: nothing to vouch for
      import org.apache.parquet.column.values.bloomfilter.BlockSplitBloomFilter
      val bf = new BlockSplitBloomFilter(
        BlockSplitBloomFilter.optimalNumOfBits(n.toLong, 0.01) / 8)
      var i = 0
      while (i < n) {
        bf.insertHash(tag match {
          case "bin" => bf.hash(dict.decodeToBinary(i))
          case "i32" => bf.hash(dict.decodeToInt(i))
          case "i64" => bf.hash(dict.decodeToLong(i))
          case "f32" => bf.hash(dict.decodeToFloat(i))
          case _     => bf.hash(dict.decodeToDouble(i))
        })
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream(bf.getBitsetSize)
      bf.writeTo(bos)
      Some((tag, bos.toByteArray))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def collectFile(f: java.io.File, conf: Configuration,
                          wantBloom: Set[String] = Set.empty): FileStats = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
    val reader = ParquetFileReader.open(in)
    var rows = 0L
    var acc: Acc = Map.empty
    // col -> Some(tag, one bitset per row group) | None once poisoned
    var blooms = Map.empty[String, Option[(String, Vector[Array[Byte]])]]
    try {
      reader.getFooter.getBlocks.asScala.foreach { block =>
        rows += block.getRowCount
        var blockAcc: Acc = Map.empty
        val bloomReader = reader.getBloomFilterDataReader(block)
        block.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          if (!name.contains('.')) { // nested columns: not prunable here
            val s = cc.getStatistics
            val usable = s != null && !s.isEmpty &&
              (s.hasNonNullValue || s.getNumNulls == block.getRowCount) &&
              s.isNumNullsSet
            val entry: Option[(Any, Any, Long)] =
              if (!usable) None
              else if (!s.hasNonNullValue) Some((null, null, s.getNumNulls))
              else decode(s, decimalScale(cc.getPrimitiveType))
                     .map { case (mn, mx) => (mn, mx, s.getNumNulls) }
            blockAcc += (name -> entry)
            // lift the writer-built bloom (no data read — the filter
            // bytes sit after the row groups, sized by bloomNdv). Any
            // block lacking one poisons the column for the whole file.
            val lifted = bloomTag(cc.getPrimitiveType).flatMap { tag =>
              val written =
                try Option(bloomReader.readBloomFilter(cc)).map { bf =>
                  val bos = new java.io.ByteArrayOutputStream(bf.getBitsetSize)
                  bf.writeTo(bos)
                  (tag, bos.toByteArray)
                } catch { case scala.util.control.NonFatal(_) => None }
              // no writer bloom + fully-dict chunk + declared column →
              // synthesize from the dictionary (see dictBloom)
              written.orElse(
                if (wantBloom.contains(name)) dictBloom(reader, block, cc, tag)
                else None)
            }
            blooms += (name -> ((blooms.get(name), lifted) match {
              case (Some(None), _) | (_, None) => None
              case (Some(Some((t, bs))), Some((t2, b)))
                  if t == t2 => Some((t, bs :+ b))
              case (Some(Some(_)), Some(_)) => None // type flip: poison
              case (None, Some((t, b))) =>
                // first sighting only counts if this is the first block —
                // a column absent from earlier blocks cannot be vouched for
                if (rows == block.getRowCount) Some((t, Vector(b))) else None
            }))
          }
        }
        acc = if (acc.isEmpty && rows == block.getRowCount) blockAcc
              else mergeAcc(acc, blockAcc)
      }
    } finally reader.close()
    val fb = blooms.collect { case (c, Some((t, bs))) => c -> ColBlooms(t, bs) }
    FileStats(rows, finish(acc), fb)
  }

  /** Read every data file's footer under `dir`; per-file stats plus the
    * slice-level merge. Driver-side, no Spark job. */
  def collect(dir: String, conf: Configuration,
              wantBloom: Set[String] = Set.empty): Stats = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    val perFile = files.map(f => f.getName -> collectFile(f, conf, wantBloom)).toMap
    val rows = perFile.valuesIterator.map(_.rows).sum
    // slice-level merge: a column must carry usable stats in EVERY
    // non-empty file (a zero-row part file has no chunks at all — it must
    // not poison the merge; the read side skips it by its row count)
    val dataFiles = perFile.filter(_._2.rows > 0)
    val sliceCols =
      if (dataFiles.isEmpty) Map.empty[String, ColStats]
      else dataFiles.values.map(fs => fs.cols.view.mapValues(cs =>
          Option((cs.min.orNull, cs.max.orNull, cs.nulls.getOrElse(0L)))).toMap: Acc)
        .reduce { (a, b) =>
          // a column missing from either side is unknown there → poison
          (a.keySet ++ b.keySet).map { k =>
            k -> ((a.get(k).flatten, b.get(k).flatten) match {
              case (Some((m0, x0, n0)), Some((m1, x1, n1))) =>
                Some((mergeMin(m0, m1), mergeMax(x0, x1), n0 + n1))
              case _ => None
            })
          }.toMap
        } match { case acc =>
          acc.collect { case (c, Some((mn, mx, n))) =>
            c -> ColStats(Option(mn), Option(mx), Some(n)) }
        }
    Stats(rows, sliceCols, perFile)
  }

  /** Decimal-annotated chunks carry UNSCALED integers (or unscaled
    * big-endian bytes for BINARY/FLBA); the comparison domain litValue
    * uses is the scaled Double. Returns the scale so decode can land
    * decimal stats in that domain instead of leaking raw unscaled values
    * that would wrongly prune (e.g. decimal(5,2) 123.45 stored as 12345). */
  private def decimalScale(tpe: org.apache.parquet.schema.PrimitiveType): Option[Int] =
    tpe.getLogicalTypeAnnotation match {
      case d: org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
        Some(d.getScale)
      case _ => None
    }

  /** Correctly-rounded double of the exact decimal value — the same result
    * as Spark's `Decimal.toDouble` on the literal side, and MONOTONIC, so
    * m <= L <= M implies dm <= dL <= dM and boundary rounding can only
    * under-prune, never skip a matching slice. */
  private def scaled(unscaled: java.math.BigInteger, scale: Int): Double =
    new java.math.BigDecimal(unscaled, scale).doubleValue

  /** Typed min/max out of a parquet Statistics object. Double/Float NaN
    * poisoning → None (parquet NaN ordering is unreliable). Binary stats
    * are exact when present (parquet-mr omits them beyond the size cap). */
  private def decode(s: Statistics[_], decScale: Option[Int]): Option[(Any, Any)] =
    (s, decScale) match {
      case (i: IntStatistics, Some(sc)) =>
        Some((scaled(java.math.BigInteger.valueOf(i.getMin.toLong), sc),
              scaled(java.math.BigInteger.valueOf(i.getMax.toLong), sc)))
      case (l: LongStatistics, Some(sc)) =>
        Some((scaled(java.math.BigInteger.valueOf(l.getMin), sc),
              scaled(java.math.BigInteger.valueOf(l.getMax), sc)))
      case (b: BinaryStatistics, Some(sc)) =>
        // unscaled two's-complement big-endian bytes (FLBA / BINARY decimal)
        Some((scaled(new java.math.BigInteger(b.genericGetMin.getBytes), sc),
              scaled(new java.math.BigInteger(b.genericGetMax.getBytes), sc)))
      case (b: BooleanStatistics, _) => Some((b.getMin, b.getMax))
      case (i: IntStatistics, _)     => Some((i.getMin.toLong, i.getMax.toLong))
      case (l: LongStatistics, _)    => Some((l.getMin, l.getMax))
      case (f: FloatStatistics, _) =>
        if (f.getMin.isNaN || f.getMax.isNaN) None
        else Some((f.getMin.toDouble, f.getMax.toDouble))
      case (d: DoubleStatistics, _) =>
        if (d.getMin.isNaN || d.getMax.isNaN) None
        else Some((d.getMin, d.getMax))
      case (b: BinaryStatistics, _) =>
        // UTF-8 decode; non-string binary (raw bytes) won't be matched by
        // any literal we compare (orderings differ) — the read side only
        // consults these for StringType literals.
        Some((b.genericGetMin.toStringUsingUTF8, b.genericGetMax.toStringUsingUTF8))
      case _ => None
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)       => java.lang.Long.compare(x, y)
    case (x: Double, y: Double)   => java.lang.Double.compare(x, y)
    // UTF-8 byte order — same collation note as [[utf8Cmp]]: merging
    // per-file ranges in UTF-16 order can shrink a string range and
    // wrongly prune
    case (x: String, y: String)   => utf8Cmp(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => 0
  }
  private def mergeMin(a: Any, b: Any): Any = if (cmp(b, a) < 0) b else a
  private def mergeMax(a: Any, b: Any): Any = if (cmp(b, a) > 0) b else a

  // ------------------------------------------------------------- sidecar IO

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    // braces are escaped so every stats object stays a BRACE-FREE leaf
    // (the parser depends on it) even when a string min/max is JSON text
    case '{'  => "\\u007b"
    case '}'  => "\\u007d"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def renderValue(v: Any): String = v match {
    case s: String  => "\"s:" + esc(s) + "\""
    case b: Boolean => "\"b:" + b + "\""
    case l: Long    => "\"l:" + l + "\""
    case d: Double  => "\"d:" + java.lang.Double.toHexString(d) + "\""
    case other      => "\"s:" + esc(other.toString) + "\""
  }

  private def parseValue(s: String): Option[Any] = {
    val body = s.drop(2)
    s.take(2) match {
      case "s:" => Some(body)
      case "b:" => Some(body.toBoolean)
      case "l:" => body.toLongOption
      case "d:" => try Some(java.lang.Double.parseDouble(body)) catch {
        case _: NumberFormatException => None }
      case _ => None
    }
  }

  private def renderColsObj(cols: Map[String, ColStats],
                            key: String => String): Seq[String] =
    cols.toSeq.sortBy(_._1).map { case (c, cs) =>
      val fields = Seq(
        cs.min.map(v => "\"min\": " + renderValue(v)),
        cs.max.map(v => "\"max\": " + renderValue(v)),
        cs.nulls.map(n => "\"nulls\": " + n)).flatten
      s""""${esc(key(c))}": ${fields.mkString("{", ", ", "}")}"""
    }

  /** Sidecar text for `st`. Format (deliberately FLAT — every stats
    * object is a brace-free leaf, so the reader needs no recursive
    * parser): slice totals under "rows"/"cols", the per-file breakdown
    * under "frows" (file → rows) and "fcols" ("file|column" → stats). */
  def render(st: Stats): String = {
    val cols = renderColsObj(st.cols, identity)
    val frows = st.files.toSeq.sortBy(_._1)
      .map { case (f, fs) => s""""${esc(f)}": ${fs.rows}""" }
    val fcols = st.files.toSeq.sortBy(_._1).flatMap { case (f, fs) =>
      renderColsObj(fs.cols, c => s"$f|$c")
    }
    // bloom bitsets as "ptype:b64,b64" (one b64 per row group) — base64
    // uses no JSON metacharacters, so the section stays a brace-free leaf
    val b64 = java.util.Base64.getEncoder
    val fblooms = st.files.toSeq.sortBy(_._1).flatMap { case (f, fs) =>
      fs.blooms.toSeq.sortBy(_._1).map { case (c, cb) =>
        val body = cb.ptype + ":" +
          cb.bitsets.map(b64.encodeToString).mkString(",")
        s""""${esc(s"$f|$c")}": "$body""""
      }
    }
    s"""{"v": $FormatVersion, "rows": ${st.rows}, """ +
      s""""cols": ${cols.mkString("{", ", ", "}")}, """ +
      s""""frows": ${frows.mkString("{", ", ", "}")}, """ +
      s""""fcols": ${fcols.mkString("{", ", ", "}")}, """ +
      s""""fblooms": ${fblooms.mkString("{", ", ", "}")}}"""
  }

  /** Collect footer stats for `dir` and pin the sidecar. Called right
    * after a slice's parquet write, before the manifest commit.
    * `wantBloom` names the table's declared bloom columns — the ones
    * that get a dictionary-synthesized bitset when the writer dropped
    * the bloom for a fully-dict chunk. */
  def writeSidecar(spark: SparkSession, dir: String,
                   wantBloom: Set[String] = Set.empty): Unit =
    Files.write(Paths.get(dir, SidecarName),
      render(collect(dir, spark.sessionState.newHadoopConf(), wantBloom))
        .getBytes(StandardCharsets.UTF_8))

  /** Sidecar format version. v2: decimal min/max are SCALED doubles (v1
    * leaked raw unscaled integers that wrongly pruned). v3 adds the
    * per-file "fblooms" section (parquet split-block bloom bitsets for
    * the table's bloomCols). Readers refuse any other version — an old
    * sidecar degrades to "never skip" until the next write/compaction
    * rebuilds it, never to a wrong skip. */
  val FormatVersion = 3

  /** Parse sidecar text; None on anything corrupt or on a sidecar
    * written by a different format version (stats are a pruning aid —
    * unreadable means keep, not guess). */
  def parseStats(s: String): Option[Stats] =
    try {
      val ver = """"v":\s*(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt)
      if (!ver.contains(FormatVersion)) None
      else parseStatsBody(s)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def parseStatsBody(s: String): Option[Stats] =
    try {
      val rows = """"rows":\s*(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      // leaf objects only (no nested braces) — the "cols"/"fcols" wrapper
      // bodies contain braces so they can never match and swallow a column
      val colRe = """"((?:[^"\\]|\\.)+)":\s*\{([^{}]*)\}""".r
      val fRe = """"(min|max|nulls)":\s*("(?:[^"\\]|\\.)*"|\d+)""".r
      val wrappers = Set("cols", "fcols", "frows", "fblooms")
      val leaves = colRe.findAllMatchIn(s).flatMap { m =>
        val name = unescape(m.group(1))
        if (wrappers.contains(name)) None
        else {
          var mn: Option[Any] = None; var mx: Option[Any] = None
          var nl: Option[Long] = None
          fRe.findAllMatchIn(m.group(2)).foreach { f =>
            val raw = f.group(2)
            val v = if (raw.startsWith("\""))
              parseValue(unescape(raw.substring(1, raw.length - 1)))
            else raw.toLongOption
            f.group(1) match {
              case "min"   => mn = v
              case "max"   => mx = v
              case "nulls" => nl = v.collect { case l: Long => l }
            }
          }
          Some(name -> ColStats(mn, mx, nl))
        }
      }.toSeq
      // "file|col" keys are the per-file section; a real column name with
      // '|' is only mistaken for one if its prefix also ends in .parquet
      def isFileKey(n: String): Boolean = {
        val i = n.indexOf('|')
        i > 0 && n.substring(0, i).endsWith(".parquet")
      }
      val cols = leaves.collect {
        case (n, cs) if !isFileKey(n) => n -> cs }.toMap
      // anchored on the ", \"fcols\"" that render always emits right
      // after it — a COLUMN literally named "frows" renders a stats leaf
      // '"frows": {...}' inside the cols wrapper (earlier in the text),
      // and an unanchored findFirst would read that leaf as the per-file
      // row map: phantom files, real data files silently dropped from
      // pruned reads
      val frows = """"frows":\s*\{([^{}]*)\},\s*"fcols"""".r.findFirstMatchIn(s)
        .map(_.group(1)).map { body =>
          """"((?:[^"\\]|\\.)+)":\s*(\d+)""".r.findAllMatchIn(body)
            .map(m => unescape(m.group(1)) -> m.group(2).toLong).toMap
        }.getOrElse(Map.empty[String, Long])
      val fcols = leaves.collect {
        case (n, cs) if isFileKey(n) =>
          val i = n.indexOf('|')
          (n.substring(0, i), n.substring(i + 1), cs)
      }.groupBy(_._1).map { case (f, xs) =>
        f -> xs.map(x => x._2 -> x._3).toMap
      }
      // bloom section: anchored at the END of the sidecar (render always
      // emits it last) so a column literally named "fblooms" — which
      // renders a leaf earlier in the text — can never be mistaken for it
      val b64 = java.util.Base64.getDecoder
      val validTags = Set("i32", "i64", "f32", "f64", "bin")
      val fblooms = """"fblooms":\s*\{([^{}]*)\}\s*\}\s*$""".r
        .findFirstMatchIn(s).map(_.group(1)).map { body =>
          """"((?:[^"\\]|\\.)+)":\s*"([^"]*)"""".r.findAllMatchIn(body)
            .flatMap { m =>
              val key = unescape(m.group(1))
              val i = key.indexOf('|')
              val colon = m.group(2).indexOf(':')
              if (i <= 0 || colon <= 0) None
              else {
                val tag = m.group(2).substring(0, colon)
                val parts = m.group(2).substring(colon + 1).split(",", -1)
                if (!validTags.contains(tag) || parts.exists(_.isEmpty)) None
                else try Some((key.substring(0, i), key.substring(i + 1),
                  ColBlooms(tag, parts.toIndexedSeq.map(b64.decode))))
                catch { case _: IllegalArgumentException => None }
              }
            }.toSeq.groupBy(_._1).map { case (f, xs) =>
              f -> xs.map(x => x._2 -> x._3).toMap
            }
        }.getOrElse(Map.empty[String, Map[String, ColBlooms]])
      val files = frows.map { case (f, r) =>
        f -> FileStats(r, fcols.getOrElse(f, Map.empty),
          fblooms.getOrElse(f, Map.empty))
      }
      rows.map(Stats(_, cols, files))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Load a slice's sidecar; None (no skipping) when absent/corrupt. */
  def readSidecar(dir: String): Option[Stats] = {
    val p = Paths.get(dir, SidecarName)
    if (!Files.exists(p)) None
    else parseStats(Files.readString(p))
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------- predicate

  /** Split a predicate into AND-conjuncts. */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Can any row of a slice with `stats` match conjunct `e`?
    * Conservative: anything unrecognized answers true (no skipping). */
  def mayMatch(e: Expression, stats: Stats): Boolean = e match {
    // literal-first forms normalize to attr-first with the op mirrored.
    // The !Literal guards matter: a literal-vs-literal conjunct (the
    // analyzer does NOT constant-fold `1 = 1`; only the optimizer does)
    // would otherwise rebuild itself forever → StackOverflowError. Such
    // conjuncts fall to the conservative `case _ => true`.
    case EqualTo(l: Literal, a) if !a.isInstanceOf[Literal] =>
      mayMatch(EqualTo(a, l), stats)
    case LessThan(l: Literal, a) if !a.isInstanceOf[Literal] =>
      mayMatch(GreaterThan(a, l), stats)
    case LessThanOrEqual(l: Literal, a) if !a.isInstanceOf[Literal] =>
      mayMatch(GreaterThanOrEqual(a, l), stats)
    case GreaterThan(l: Literal, a) if !a.isInstanceOf[Literal] =>
      mayMatch(LessThan(a, l), stats)
    case GreaterThanOrEqual(l: Literal, a) if !a.isInstanceOf[Literal] =>
      mayMatch(LessThanOrEqual(a, l), stats)
    case EqualTo(a, l)            => cmpPrune(a, l)(stats)
    case LessThan(a, l)           => ltPrune(a, l, orEq = false, stats)
    case LessThanOrEqual(a, l)    => ltPrune(a, l, orEq = true, stats)
    case GreaterThan(a, l)        => gtPrune(a, l, orEq = false, stats)
    case GreaterThanOrEqual(a, l) => gtPrune(a, l, orEq = true, stats)
    case In(a, vs) if vs.forall(v => v.isInstanceOf[Literal] ||
                                     (v.isInstanceOf[Cast] && v.foldable)) =>
      attrName(a) match {
        case Some(_) =>
          vs.exists(v => cmpPrune(a, v)(stats))
        case None => true
      }
    case IsNull(a) => attrName(a).flatMap(stats.cols.get) match {
      case Some(cs) => cs.nulls.forall(_ > 0)
      case None     => true
    }
    case IsNotNull(a) => attrName(a).flatMap(stats.cols.get) match {
      case Some(cs) => cs.nulls.forall(_ < stats.rows)
      case None     => true
    }
    case _ => true
  }

  private def attrName(e: Expression): Option[String] = e match {
    case UnresolvedAttribute(parts) if parts.length == 1 => Some(parts.head)
    case a: AttributeReference => Some(a.name)
    // The analyzer widens comparison operands: `decimal(12,2)Col >
    // 99999.99` becomes `Cast(col) > Cast(lit)`. A lossless NUMERIC
    // up-cast is monotonic and lands in the same Long/Double stats
    // domain as the un-cast column, so pruning through it stays safe.
    // Non-numeric casts (date→timestamp etc.) change the encoded domain
    // (days vs micros) — refuse those and keep the slice.
    case c: Cast
        if c.child.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
           c.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
           Cast.canUpCast(c.child.dataType, c.dataType) =>
      attrName(c.child)
    case _ => None
  }

  /** Literal → the comparison domain the stats use (Long / Double /
    * String / Boolean). Dates (int days) and timestamps (long micros)
    * land in Long — the same encoding the footers carry for them. */
  private def litValue(e: Expression): Option[Any] = e match {
    case Literal(null, _) => None
    case Literal(v, _) => domainValue(v)
    // analyzer-inserted cast around a literal: fold it and convert the
    // RESULT (ANSI cast may throw on overflow → treat as unreadable)
    case c: Cast if c.foldable =>
      val v = try c.eval(null) catch { case _: Exception => null }
      if (v == null) None else domainValue(v)
    case _ => None
  }

  private def domainValue(v: Any): Option[Any] = v match {
    case i: java.lang.Integer => Some(i.longValue)
    case l: java.lang.Long    => Some(l.longValue)
    case s: java.lang.Short   => Some(s.longValue)
    case b: java.lang.Byte    => Some(b.longValue)
    case d: java.lang.Double  => if (d.isNaN) None else Some(d.doubleValue)
    case f: java.lang.Float   => if (f.isNaN) None else Some(f.doubleValue)
    case u: UTF8String        => Some(u.toString)
    case b: java.lang.Boolean => Some(b.booleanValue)
    case d: Decimal           => Some(d.toDouble)
    case _ => None
  }

  /** Unsigned UTF-8 byte order — the collation parquet footers order
    * binary min/max by AND Spark's UTF8String comparison uses. Java's
    * String.compareTo is UTF-16 code-unit order, which DISAGREES beyond
    * the BMP (a supplementary character's surrogate pair sorts below
    * U+E000..U+FFFF in UTF-16 but above in UTF-8 bytes) — comparing
    * stats in the wrong collation wrongly PRUNES slices whose rows
    * match, i.e. silently drops result rows. */
  private def utf8Cmp(x: String, y: String): Int = {
    val a = x.getBytes(StandardCharsets.UTF_8)
    val b = y.getBytes(StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Ordered compare across the stats domain; None = not comparable. */
  private def ordCmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long)     => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double)   => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Long)   => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(utf8Cmp(x, y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  private def cmpPrune(a: Expression, l: Expression)
                      (stats: Stats): Boolean =
    (for {
      name <- attrName(a)
      cs   <- stats.cols.get(name)
      v    <- litValue(l)
    } yield cs match {
      case ColStats(Some(mn), Some(mx), _) =>
        (ordCmp(v, mn), ordCmp(v, mx)) match {
          case (Some(c1), Some(c2)) => c1 >= 0 && c2 <= 0
          case _ => true
        }
      case ColStats(None, None, Some(n)) if n == stats.rows => false // all null
      case _ => true
    }).getOrElse(true)

  private def ltPrune(a: Expression, l: Expression, orEq: Boolean,
                      stats: Stats): Boolean =
    (for {
      name <- attrName(a); cs <- stats.cols.get(name); v <- litValue(l)
    } yield cs match {
      case ColStats(Some(mn), _, _) => ordCmp(mn, v) match {
        case Some(c) => if (orEq) c <= 0 else c < 0
        case None    => true
      }
      case ColStats(None, None, Some(n)) if n == stats.rows => false
      case _ => true
    }).getOrElse(true)

  private def gtPrune(a: Expression, l: Expression, orEq: Boolean,
                      stats: Stats): Boolean =
    (for {
      name <- attrName(a); cs <- stats.cols.get(name); v <- litValue(l)
    } yield cs match {
      case ColStats(_, Some(mx), _) => ordCmp(mx, v) match {
        case Some(c) => if (orEq) c >= 0 else c > 0
        case None    => true
      }
      case ColStats(None, None, Some(n)) if n == stats.rows => false
      case _ => true
    }).getOrElse(true)

  // ------------------------------------------------------------- blooms

  /** Can any row of a file with blooms `fs` match conjunct `e`?
    * Point-lookup complement of [[mayMatch]]: only equality and IN
    * conjuncts consult the per-file bloom filters; everything else (and
    * every column without a trusted bloom) answers true. A bloom "no" is
    * definitive — the writer inserted every value of the file — so false
    * skips the file; a bloom "maybe" keeps it and the re-applied
    * predicate does the exact work. */
  def bloomMayMatch(e: Expression, fs: FileStats): Boolean = e match {
    case EqualTo(l: Literal, a) if !a.isInstanceOf[Literal] =>
      bloomMayMatch(EqualTo(a, l), fs)
    case EqualTo(a, l) => bloomContains(a, l, fs)
    case In(a, vs) if vs.forall(v => v.isInstanceOf[Literal] ||
                                     (v.isInstanceOf[Cast] && v.foldable)) =>
      attrName(a) match {
        case Some(_) => vs.exists(v => bloomContains(a, v, fs))
        case None    => true
      }
    case _ => true
  }

  private def bloomContains(a: Expression, l: Expression,
                            fs: FileStats): Boolean =
    (for {
      name <- attrName(a)
      cb   <- fs.blooms.get(name)
      v    <- litValue(l)
    } yield {
      import org.apache.parquet.column.values.bloomfilter.BlockSplitBloomFilter
      val filters = cb.bitsets.map(new BlockSplitBloomFilter(_))
      bloomHash(filters.head, cb.ptype, v) match {
        // present iff ANY row group's filter may contain it
        case Some(h) => filters.exists(_.findHash(h))
        case None    => true // unhashable pairing: no bloom verdict
      }
    }).getOrElse(true)

  /** XXH64 of the value's parquet PLAIN encoding under the column's
    * physical type — the exact bytes the writer hashed. Pairings that
    * cannot reproduce those bytes exactly (range overflow, non-integral
    * double against an int column, float that does not round-trip)
    * return None → no pruning, min/max still applies. */
  private def bloomHash(f: org.apache.parquet.column.values.bloomfilter.BloomFilter,
                        ptype: String, v: Any): Option[Long] = (ptype, v) match {
    case ("i32", l: Long) if l >= Int.MinValue && l <= Int.MaxValue =>
      Some(f.hash(l.toInt))
    case ("i64", l: Long)   => Some(f.hash(l))
    case ("bin", s: String) =>
      Some(f.hash(org.apache.parquet.io.api.Binary.fromString(s)))
    case ("f64", d: Double) => Some(f.hash(d))
    case ("f32", d: Double) if d.toFloat.toDouble == d => Some(f.hash(d.toFloat))
    case _ => None
  }
}
