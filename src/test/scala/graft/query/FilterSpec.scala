package graft.query

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Prisma filter-algebra semantics, esp. tri-state nullables
  * (SURVEY §2.B; reference `commonInputTypes.ts`). */
class FilterSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // tri-state status table like GooglePlaceUrlToScrape (schema.prisma:16-28)
  lazy val urls: DataFrame = Seq(
    ("u1", "https://a.example", Some("NY"), Option.empty[Boolean]),
    ("u2", "https://b.example", Some("SF"), Some(true)),
    ("u3", "https://c.example", None, Some(false)),
    ("u4", "HTTPS://D.EXAMPLE", None, Option.empty[Boolean])
  ).toDF("id", "url", "location", "status")

  def ids(w: Where): Set[String] =
    urls.filter(Where.compile(w, urls.apply)).select("id").as[String].collect().toSet

  test("BoolF equals null = IS NULL (pending poll, runner/locator.ts:61-67)") {
    assert(ids(F.bool("status", BoolF(equals = Some(None)))) == Set("u1", "u4"))
  }
  test("BoolF equals true / false") {
    assert(ids(F.bool("status", BoolF(equals = Some(Some(true))))) == Set("u2"))
    assert(ids(F.bool("status", BoolF(equals = Some(Some(false))))) == Set("u3"))
  }
  test("BoolF not null = IS NOT NULL") {
    assert(ids(F.bool("status", BoolF(not = Some(None)))) == Set("u2", "u3"))
  }
  test("BoolF not true excludes nulls (SQL three-valued logic)") {
    assert(ids(F.bool("status", BoolF(not = Some(Some(true))))) == Set("u3"))
  }

  test("StringF equals null on nullable column") {
    assert(ids(F.str("location", StringF(equals = Some(None)))) == Set("u3", "u4"))
  }
  test("StringF not: null = IS NOT NULL (runner/syncCrm.ts:63)") {
    assert(ids(F.str("location", StringF(not = Some(StringF(equals = Some(None)))))) == Set("u1", "u2"))
  }
  test("StringF contains / startsWith / endsWith") {
    assert(ids(F.str("url", StringF(contains = Some("b.ex")))) == Set("u2"))
    assert(ids(F.str("url", StringF(startsWith = Some("https://")))) == Set("u1", "u2", "u3"))
    assert(ids(F.str("url", StringF(endsWith = Some("example")))) == Set("u1", "u2", "u3"))
  }
  test("StringF insensitive mode lowercases both sides") {
    assert(ids(F.str("url", StringF(startsWith = Some("https://"), insensitive = true))) ==
      Set("u1", "u2", "u3", "u4"))
    assert(ids(F.str("url", StringF(equals = Some(Some("https://d.example")), insensitive = true))) ==
      Set("u4"))
  }
  test("StringF nested not excludes nulls like SQL NOT LIKE") {
    // location NOT contains 'N' → 'SF' matches; NULL locations excluded
    assert(ids(F.str("location", StringF(not = Some(StringF(contains = Some("N")))))) == Set("u2"))
  }
  test("StringF in / notIn") {
    assert(ids(F.str("id", StringF(in = Some(Seq("u1", "u3"))))) == Set("u1", "u3"))
    assert(ids(F.str("id", StringF(notIn = Some(Seq("u1", "u3"))))) == Set("u2", "u4"))
  }

  test("AND / OR / NOT connectors compose") {
    val pending = F.bool("status", BoolF(equals = Some(None)))
    val hasLoc = F.str("location", StringF(not = Some(StringF(equals = Some(None)))))
    assert(ids(pending.and(hasLoc)) == Set("u1"))
    assert(ids(pending.or(hasLoc)) == Set("u1", "u2", "u4"))
    assert(ids(!pending) == Set("u2", "u3"))
  }

  test("empty And = true, empty Or = false") {
    assert(ids(And(Nil)) == Set("u1", "u2", "u3", "u4"))
    assert(ids(Or(Nil)) == Set.empty)
  }

  test("CmpF range + not-nested") {
    val ev = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    def evIds(w: Where): Set[Long] =
      ev.filter(Where.compile(w, ev.apply)).select("id").as[Long].collect().toSet
    assert(evIds(F.cmp("v", CmpF(gte = Some(15.0), lt = Some(30.0)))) == Set(2L))
    assert(evIds(F.cmp("v", CmpF(not = Some(CmpF(equals = Some(Some(20.0))))))) == Set(1L, 3L))
  }

  test("JsonF path + numeric predicate (commonInputTypes.ts:126-148)") {
    val n = Seq(
      ("n1", """{"k": 5, "tags": ["a","b"], "s": "hello"}"""),
      ("n2", """{"k": 50, "tags": ["c"], "s": "world"}"""),
      ("n3", null.asInstanceOf[String])
    ).toDF("id", "metadata")
    def nIds(w: Where): Set[String] =
      n.filter(Where.compile(w, n.apply)).select("id").as[String].collect().toSet
    assert(nIds(F.json("metadata", JsonF(path = Seq("k"), gt = Some(10)))) == Set("n2"))
    assert(nIds(F.json("metadata", JsonF(path = Seq("s"), stringContains = Some("ell")))) == Set("n1"))
    assert(nIds(F.json("metadata", JsonF(path = Seq("tags"), arrayContains = Some("b")))) == Set("n1"))
    assert(nIds(F.json("metadata", JsonF(isDbNull = Some(true)))) == Set("n3"))
  }

  test("JsonF completeness: array ends, null kinds, insensitive mode") {
    val n = Seq(
      ("n1", """{"k": 5, "tags": ["a","b"], "s": "Hello"}"""),
      ("n2", """{"k": 50, "tags": ["c"], "s": "world"}"""),
      ("n3", null.asInstanceOf[String]),
      ("n4", """{"k": 1, "tags": null, "s": null}"""),
      ("n5", """{"k": 2}"""),
      ("n6", """{"k": 3, "tags": []}""")
    ).toDF("id", "metadata")
    def nIds(w: Where): Set[String] =
      n.filter(Where.compile(w, n.apply)).select("id").as[String].collect().toSet
    // array_starts_with / array_ends_with — an EMPTY array (n6) simply
    // does not match (must not throw under ANSI element_at)
    assert(nIds(F.json("metadata", JsonF(path = Seq("tags"), arrayStartsWith = Some("a")))) == Set("n1"))
    assert(nIds(F.json("metadata", JsonF(path = Seq("tags"), arrayEndsWith = Some("b")))) == Set("n1"))
    assert(nIds(F.json("metadata", JsonF(path = Seq("tags"), arrayEndsWith = Some("c")))) == Set("n2"))
    // DbNull (column) vs JsonNull (value at path) vs AnyNull — and the
    // missing key (n5) counts as NEITHER db-null nor json-null
    assert(nIds(F.json("metadata", JsonF(path = Seq("tags"), isJsonNull = Some(true)))) == Set("n4"))
    assert(nIds(F.json("metadata", JsonF(isDbNull = Some(true)))) == Set("n3"))
    assert(nIds(F.json("metadata", JsonF(path = Seq("tags"), isAnyNull = Some(true)))) == Set("n3", "n4"))
    assert(nIds(F.json("metadata", JsonF(path = Seq("tags"), isJsonNull = Some(false)))) == Set("n1", "n2", "n3", "n5", "n6"))
    // insensitive string mode
    assert(nIds(F.json("metadata", JsonF(path = Seq("s"), stringStartsWith = Some("HELLO"),
      insensitive = true))) == Set("n1"))
    assert(nIds(F.json("metadata", JsonF(path = Seq("s"), equals = Some("WORLD"),
      insensitive = true))) == Set("n2"))
  }

  test("JsonF equalsJson: JSONB value equality (numbers by value, keys sorted)") {
    val n = Seq(
      ("j1", """{"cfg": {"b": 1, "a": [1.0, 2]}}"""),
      ("j2", """{"cfg": {"a": [1, 2.000], "b": 1.0}}"""),
      ("j3", """{"cfg": {"a": [1, 2], "b": 2}}"""),
      ("j4", """{"cfg": 1e2}"""),
      ("j5", """{"cfg": null}"""),
      ("j6", null.asInstanceOf[String])
    ).toDF("id", "metadata")
    def nIds(w: Where): Set[String] =
      n.filter(Where.compile(w, n.apply)).select("id").as[String].collect().toSet
    // representation-insensitive, like the reference's Postgres JSONB:
    // 1 vs 1.0, 2 vs 2.000, object key order — all the same value
    assert(nIds(F.json("metadata", JsonF(path = Seq("cfg"),
      equalsJson = Some("""{"a": [1, 2], "b": 1}""")))) == Set("j1", "j2"))
    // scalar numbers by value: 1e2 == 100
    assert(nIds(F.json("metadata", JsonF(path = Seq("cfg"),
      equalsJson = Some("100")))) == Set("j4"))
    // recursive not: JSON null at path is a VALUE (unequal → matches the
    // negation, j5); a db-null column is three-valued (matches neither, j6)
    assert(nIds(F.json("metadata", JsonF(path = Seq("cfg"),
      not = Some(JsonF(equalsJson = Some("""{"a": [1, 2], "b": 1}""")))))) ==
      Set("j3", "j4", "j5"))
    // a malformed filter literal is a caller bug → plan-time error
    intercept[IllegalArgumentException] {
      nIds(F.json("metadata", JsonF(path = Seq("cfg"), equalsJson = Some("{nope"))))
    }
  }

  test("EnumF validates against the service-name domain (schema.prisma:101-105)") {
    val notif = Seq(("m1", "Places_Locator"), ("m2", "CRM_Sync")).toDF("id", "serviceName")
    def nIds(w: Where): Set[String] =
      notif.filter(Where.compile(w, notif.apply)).select("id").as[String].collect().toSet
    assert(nIds(F.enum_("serviceName", EnumF(equals = Some("CRM_Sync")))) == Set("m2"))
    assert(nIds(F.enum_("serviceName", EnumF(in = Some(Seq("Places_Locator", "Website_Content_Scrapper"))))) == Set("m1"))
  }

  test("filters compile to pushed-down parquet predicates") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val plan = li.filter(Where.compile(
      F.cmp("l_quantity", CmpF(gt = Some(40.0))), li.apply))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"expected pushdown in plan:\n$plan")
  }
}
