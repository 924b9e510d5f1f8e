package graft.store

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Secondary value index ([[ValueIndex]]): lookup/fetch equality with the
  * plain predicate, delta-priced refresh incl. value-moving updates and
  * deletes, NULL exclusion, bucket isolation, and fail-fast opens. */
class ValueIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshSrc(): GraftTable = {
    val cat = new Catalog(
      Files.createTempDirectory("graft-vidx-spec").toString)
    new GraftTable(spark, cat, "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))
  }

  private def rows(r: (Long, String)*) =
    r.toSeq.toDF("id", "v")

  test("fetch equals the plain predicate after build") {
    val src = freshSrc()
    src.createMany(rows(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "c"))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    val got = idx.fetch(Seq("a", "c")).orderBy($"id").collect().toSeq
    val want = src.snapshot().filter($"v".isin("a", "c"))
      .orderBy($"id").collect().toSeq
    assert(got == want && got.size == 3)
  }

  test("refresh prices the delta: inserts, value-moving updates, deletes") {
    val src = freshSrc()
    src.createMany(rows(1L -> "a", 2L -> "b", 3L -> "a"))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    src.createMany(rows(4L -> "a"))
    src.updateMany(graft.query.RawCol($"id" === 1L), Map("v" -> lit("z")))
    src.deleteMany(graft.query.RawCol($"id" === 3L))
    assert(idx.refresh().nonEmpty)
    assert(idx.refresh().isEmpty, "caught up")
    // old value's posting left, new value's landed, delete's gone
    assert(idx.lookupIds(Seq("a")).select($"id").as[Long].collect().toSet
      == Set(4L))
    assert(idx.lookupIds(Seq("z")).select($"id").as[Long].collect().toSet
      == Set(1L))
    // row-for-row equal to a fresh derivation of the current snapshot
    val fresh = ValueIndex.bucketed(
      ValueIndex.postingsOf(src.snapshot(), Seq("v"), "id"), Seq("v"), 4)
    assert(idx.post.snapshot().exceptAll(fresh).isEmpty &&
      fresh.exceptAll(idx.post.snapshot()).isEmpty)
  }

  test("groupCounts: postings-only census incl. NULL group, maintained") {
    import graft.query.RawCol
    val src = freshSrc()
    src.createMany(rows(1L -> "a", 2L -> "b", 3L -> "a", 4L -> null))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    assert(idx.nullCount() == 1L) // counted at build
    def census(): Map[Option[String], Long] =
      idx.groupCounts(None).collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(census() == Map(Some("a") -> 2L, Some("b") -> 1L, None -> 1L))
    // probed form: equality never selects NULL
    assert(idx.groupCounts(Some(Seq("a", "b"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 1L))
    // refresh transfers: value→NULL move, NULL→value move, null insert,
    // null delete
    src.updateMany(RawCol($"id" === 1L),
      Map("v" -> lit(null).cast("string")))           // a → NULL
    src.updateMany(RawCol($"id" === 4L), Map("v" -> lit("b"))) // NULL → b
    src.createMany(rows(5L -> null, 6L -> "c"))
    src.deleteMany(RawCol($"id" === 5L))
    assert(idx.refresh().nonEmpty)
    assert(idx.nullCount() == 1L) // +1 (id1) +1 (id5) −1 (id4) −1 (id5)
    assert(census() ==
      Map(Some("a") -> 1L, Some("b") -> 2L, Some("c") -> 1L, None -> 1L))
    // equals the hydrated groupBy exactly
    val want = src.snapshot().groupBy($"v").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(census() == want)
    // the IS NULL count answers from the same meta census — zero jobs
    assert(idx.countNulls() == 1L)
    assert(idx.countNulls() ==
      src.snapshot().filter($"v".isNull).count())
    // stale: a fresh commit past the cursor falls back to the scan
    src.createMany(rows(7L -> null))
    assert(idx.countNulls() == 2L) // scan truth, not the stale meta
    assert(idx.refresh().nonEmpty)
    assert(idx.nullCount() == 2L && idx.countNulls() == 2L)
  }

  test("NULL values are not indexed; equality probes never see them") {
    val src = freshSrc()
    src.createMany(Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("id", "v"))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 2)
    assert(idx.post.snapshot().count() == 1)
    assert(idx.fetch(Seq("a")).count() == 1)
  }

  test("a one-value probe reads exactly one bucket partition") {
    val src = freshSrc()
    src.createMany(rows((1L to 40L).map(i => i -> s"v${i % 10}"): _*))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 8)
    val files = idx.lookupIds(Seq("v3")).inputFiles
    val buckets = files.map(_.replaceAll(".*/bucket=([0-9]+)/.*", "$1")).distinct
    assert(files.nonEmpty && buckets.length == 1, buckets.toSeq)
  }

  test("Model routes plain equality/IN through the index, falls back otherwise") {
    import graft.query._
    val src = freshSrc()
    src.createMany(rows(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "A"))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    val model = new Model(df = () => src.snapshot(), primaryKey = "id",
      indexSources = Map("v" -> (vs => idx.fetch(vs))))

    def routed(w: Where): Boolean =
      model.findMany(QueryArgs(where = Some(w)))
        .inputFiles.exists(_.contains("__vidx_"))

    assert(routed(Field("v", StringF(equals = Some(Some("a"))))))
    assert(routed(Field("v", StringF(in = Some(Seq("a", "b"))))))
    assert(routed(And(Seq(Field("v", StringF(equals = Some(Some("a")))),
      Field("id", CmpF(gte = Some(2L)))))))
    // insensitive / range / negation / OR shapes must NOT route
    assert(!routed(Field("v",
      StringF(equals = Some(Some("a")), insensitive = true))))
    assert(!routed(Field("v", StringF(gte = Some("a")))))
    assert(!routed(Field("v", StringF(equals = Some(Some("a")),
      not = Some(StringF(equals = Some(Some("b"))))))))
    assert(!routed(Or(Seq(Field("v", StringF(equals = Some(Some("a")))),
      Field("id", CmpF(equals = Some(Some(2L))))))))

    // the FULL where tree still applies on the routed path
    val got = model.findMany(QueryArgs(
      where = Some(And(Seq(Field("v", StringF(equals = Some(Some("a")))),
        Field("id", CmpF(gte = Some(2L)))))),
      orderBy = Seq(OrderBy("id")))).select($"id").as[Long].collect().toSeq
    assert(got == Seq(3L))
    // case-sensitive: "A" is a different indexed value
    assert(model.findMany(QueryArgs(where = Some(Field("v",
      StringF(equals = Some(Some("A"))))))).count() == 1)
  }

  test("stale index: fetch/countIds fall back to the scan, lookupIds stays as-of") {
    val src = freshSrc()
    src.createMany(rows(1L -> "a", 2L -> "b"))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    assert(idx.isFresh())
    // rows arriving AFTER the last refresh: source-snapshot truth moves,
    // postings truth does not
    src.createMany(rows(3L -> "a"))
    src.updateMany(graft.query.RawCol($"id" === 2L), Map("v" -> lit("a")))
    assert(!idx.isFresh())
    // fetch promises snapshot truth — the guard must surface 2 and 3
    assert(idx.fetch(Seq("a")).select($"id").as[Long].collect().toSet
      == Set(1L, 2L, 3L))
    assert(idx.countIds(Seq("a")) == 3L)
    // lookupIds is documented as-of the last refresh: still only id 1
    assert(idx.lookupIds(Seq("a")).select($"id").as[Long].collect().toSet
      == Set(1L))
    // refresh restores the index path (and the same answers)
    assert(idx.refresh().nonEmpty && idx.isFresh())
    assert(idx.fetch(Seq("a")).count() == 3 && idx.countIds(Seq("a")) == 3L)
    assert(idx.lookupIds(Seq("a")).select($"id").as[Long].collect().toSet
      == Set(1L, 2L, 3L))
  }

  test("index-only count answers from postings without touching the source") {
    val src = freshSrc()
    src.createMany(rows((1L to 30L).map(i => i -> s"v${i % 5}"): _*))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    assert(idx.countIds(Seq("v2")) == 6L)
    assert(idx.countIds(Seq("v2", "v3")) == 12L)
    // the posting read is bucket-pruned and never opens a source slice
    val files = idx.lookupIds(Seq("v2")).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("__vidx_")))
  }

  test("composite index: full-tuple probes, refresh, arity checks") {
    val cat = new Catalog(
      Files.createTempDirectory("graft-vidx-spec").toString)
    val src = new GraftTable(spark, cat, "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", StringType, nullable = true),
      StructField("b", LongType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))
    src.createMany(Seq((1L, "x", 10L), (2L, "x", 20L), (3L, "y", 10L),
      (4L, "x", 10L), (5L, null.asInstanceOf[String], 10L))
      .toDF("id", "a", "b")
      .unionByName(Seq(7L).toDF("id")
        .select($"id", lit("x").as("a"), lit(null).cast("long").as("b"))))
    val idx = ValueIndex.build(src, "ab", Seq("a", "b"), "id", nBuckets = 4)
    // LEADING null (id 5) → not indexed; a NULL in a NON-leading
    // component (id 7) stays indexed — a prefix probe must return it
    assert(idx.post.snapshot().count() == 5)
    assert(idx.nullCount() == 1L)
    assert(idx.fetchTuples(Seq(Seq("x", 10L))).select($"id").as[Long]
      .collect().toSet == Set(1L, 4L)) // equality never matches NULL b
    assert(idx.countTupleIds(Seq(Seq("x", 10L), Seq("y", 10L))) == 3L)
    // the composite bucket hash covers the LEADING column: a one-tuple
    // probe still reads exactly one bucket partition
    val files = idx.lookupTupleIds(Seq(Seq("x", 10L))).inputFiles
    val buckets = files.map(_.replaceAll(".*/bucket=([0-9]+)/.*", "$1")).distinct
    assert(files.nonEmpty && buckets.length == 1, buckets.toSeq)
    // …and a LEADING-PREFIX probe prunes to the same single bucket
    val pfiles = idx.lookupTupleIds(Seq(Seq("x"))).inputFiles
    val pbuckets =
      pfiles.map(_.replaceAll(".*/bucket=([0-9]+)/.*", "$1")).distinct
    assert(pfiles.nonEmpty && pbuckets.sameElements(buckets), pbuckets.toSeq)
    // prefix probes: ids, hydrate, count — the NULL-b row (7) is in
    assert(idx.idsOfTuples(Seq(Seq("x"))).as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 7L))
    assert(idx.fetchTuples(Seq(Seq("y"))).select($"id").as[Long]
      .collect().toSet == Set(3L))
    assert(idx.countTupleIds(Seq(Seq("x"), Seq("y"))) == 5L)
    // prefix equality == the plain scan predicate, NULL-b row included
    assert(idx.fetchTuples(Seq(Seq("x"))).select($"id").as[Long]
      .collect().toSet ==
      src.snapshot().filter($"a" === "x").select($"id").as[Long]
        .collect().toSet)
    // refresh: moves, inserts, deletes on the tuple
    src.createMany(Seq((6L, "y", 20L)).toDF("id", "a", "b"))
    src.updateMany(graft.query.RawCol($"id" === 1L), Map("b" -> lit(30L)))
    src.deleteMany(graft.query.RawCol($"id" === 3L))
    assert(idx.refresh().nonEmpty)
    assert(idx.lookupTupleIds(Seq(Seq("x", 10L))).select($"id").as[Long]
      .collect().toSet == Set(4L))
    assert(idx.lookupTupleIds(Seq(Seq("x", 30L))).select($"id").as[Long]
      .collect().toSet == Set(1L))
    // over-arity and mixed-arity probes fail loudly
    assertThrows[IllegalArgumentException] {
      idx.lookupTupleIds(Seq(Seq("x", 10L, 99L)))
    }
    assertThrows[IllegalArgumentException] {
      idx.lookupTupleIds(Seq(Seq("x"), Seq("x", 10L)))
    }
    // single-col accessor refuses on a composite index
    assertThrows[IllegalArgumentException] { idx.valCol }
  }

  test("Model: composite routing serves leading prefixes; non-leading falls back") {
    import graft.query._
    val cat = new Catalog(
      Files.createTempDirectory("graft-vidx-spec").toString)
    val src = new GraftTable(spark, cat, "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))
    src.createMany(Seq((1L, "x", "p"), (2L, "x", "q"), (3L, "y", "p"))
      .toDF("id", "a", "b"))
    val idx = ValueIndex.build(src, "ab", Seq("a", "b"), "id", nBuckets = 4)
    val model = new Model(df = () => src.snapshot(), primaryKey = "id",
      compositeIndexSources = Map(Seq("a", "b") ->
        (ts => idx.fetchTuples(ts))))

    def routed(w: Where): Boolean =
      model.findMany(QueryArgs(where = Some(w)))
        .inputFiles.exists(_.contains("__vidx_"))

    // both columns routable → routes (cross product of IN lists)
    assert(routed(And(Seq(Field("a", StringF(equals = Some(Some("x")))),
      Field("b", StringF(in = Some(Seq("p", "q"))))))))
    // a LEADING-prefix probe (a only) routes too — r16 bucketing
    assert(routed(Field("a", StringF(equals = Some(Some("x"))))))
    // a non-routable leaf on b (range) demotes to the [a] prefix, which
    // still routes; the range re-applies on top
    val ranged = model.findMany(QueryArgs(
      where = Some(And(Seq(Field("a", StringF(equals = Some(Some("x")))),
        Field("b", StringF(gte = Some("q")))))),
      orderBy = Seq(OrderBy("id"))))
    assert(ranged.inputFiles.exists(_.contains("__vidx_")))
    assert(ranged.select($"id").as[Long].collect().toSeq == Seq(2L))
    // a NON-LEADING column alone (b) has no prefix → falls back
    assert(!routed(Field("b", StringF(equals = Some(Some("p"))))))
    // the routed read still applies the full tree
    val got = model.findMany(QueryArgs(
      where = Some(And(Seq(Field("a", StringF(equals = Some(Some("x")))),
        Field("b", StringF(in = Some(Seq("p", "q")))),
        Field("id", CmpF(gte = Some(2L)))))),
      orderBy = Seq(OrderBy("id")))).select($"id").as[Long].collect().toSeq
    assert(got == Seq(2L))
    // prefix length 1 defers to a DEDICATED single-column index on `a`
    val single = ValueIndex.build(src, "aonly", Seq("a"), "id", nBuckets = 4)
    val both = new Model(df = () => src.snapshot(), primaryKey = "id",
      indexSources = Map("a" -> (vs => single.fetch(vs))),
      compositeIndexSources = Map(Seq("a", "b") ->
        (ts => idx.fetchTuples(ts))))
    val viaSingle = both.findMany(QueryArgs(
      where = Some(Field("a", StringF(equals = Some(Some("x")))))))
    assert(viaSingle.inputFiles.exists(_.contains("__vidx_aonly_")))
  }

  test("Model: index-only count never plans the source; residuals hydrate") {
    import graft.query._
    val src = freshSrc()
    src.createMany(rows(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "c"))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    var touched = false
    val model = new Model(df = () => { touched = true; src.snapshot() },
      primaryKey = "id",
      indexCountSources = Map("v" -> (vs => idx.countIds(vs))))
    assert(model.count(Some(Field("v",
      StringF(in = Some(Seq("a", "c")))))) == 3L)
    assert(!touched, "index-only count must not invoke df()")
    // a second conjunct forces the hydrated path
    assert(model.count(Some(And(Seq(Field("v",
      StringF(equals = Some(Some("a")))),
      Field("id", CmpF(gte = Some(2L))))))) == 1L)
    assert(touched)
    // a non-routable single leaf hydrates too
    touched = false
    assert(model.count(Some(Field("v", StringF(gte = Some("b"))))) == 2L)
    assert(touched)
  }

  test("Model: ids-projection findMany routes postings-only; richer shapes hydrate") {
    import graft.query._
    val src = freshSrc()
    src.createMany(rows(1L -> "a", 2L -> "b", 3L -> "a", 4L -> "a"))
    val idx = ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    var touched = false
    val model = new Model(df = () => { touched = true; src.snapshot() },
      primaryKey = "id",
      indexIdsSources = Map("v" -> (vs => idx.idsOf(vs))))
    val out = model.findMany(QueryArgs(
      where = Some(Field("v", StringF(equals = Some(Some("a"))))),
      select = Seq("id"), orderBy = Seq(OrderBy("id")), take = Some(2)))
    assert(out.as[Long].collect().toSeq == Seq(1L, 3L))
    assert(!touched, "ids projection must not invoke df()")
    assert(out.inputFiles.forall(_.contains("__vidx_")))
    // a wider select hydrates
    assert(model.findMany(QueryArgs(
      where = Some(Field("v", StringF(equals = Some(Some("a"))))),
      select = Seq("id", "v"))).count() == 3)
    assert(touched)
    // an extra conjunct hydrates too
    touched = false
    assert(model.findMany(QueryArgs(
      where = Some(And(Seq(Field("v", StringF(equals = Some(Some("a")))),
        Field("id", CmpF(gte = Some(3L)))))),
      select = Seq("id"))).count() == 2)
    assert(touched)
    // staleness: post-refresh rows still surface through the guard
    src.createMany(rows(5L -> "a"))
    touched = false
    assert(model.findMany(QueryArgs(
      where = Some(Field("v", StringF(equals = Some(Some("a"))))),
      select = Seq("id"),
      orderBy = Seq(OrderBy("id")))).as[Long].collect().toSeq
      == Seq(1L, 3L, 4L, 5L))
  }

  test("open before build fails loudly; open routes like the build") {
    val src = freshSrc()
    assertThrows[IllegalArgumentException] {
      ValueIndex.open(src, "nope", "v", "id")
    }
    src.createMany(rows(1L -> "a"))
    ValueIndex.build(src, "v1", "v", "id", nBuckets = 4)
    val re = ValueIndex.open(src, "v1", "v", "id")
    assert(re.nBuckets() == 4)
    assert(re.fetch(Seq("a")).count() == 1)
  }
}
