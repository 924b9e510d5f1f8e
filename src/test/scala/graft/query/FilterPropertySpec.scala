package graft.query

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Test => SCTest, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5.4): the Spark-compiled filter algebra is
  * checked against an independent three-valued-logic reference evaluator
  * on randomized rows and randomized filter trees — the Prisma null
  * semantics (`equals:null` → IS NULL, value comparisons never match
  * NULL) must agree under arbitrary AND/OR/NOT composition. */
class FilterPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // fixed randomized corpus: nullable string + nullable boolean + long
  private val rnd = new scala.util.Random(1234)
  private val rows: Seq[(Long, Option[String], Option[Boolean])] =
    (0L until 40L).map { i =>
      val s = if (rnd.nextInt(5) == 0) None
        else Some(Seq("alpha", "beta", "gamma", "ALPHA", "alphabet")(rnd.nextInt(5)))
      val b = rnd.nextInt(3) match {
        case 0 => None; case 1 => Some(true); case 2 => Some(false)
      }
      (i, s, b)
    }
  private lazy val df: DataFrame = {
    val d = rows.toDF("id", "s", "b").cache(); d.count(); d
  }

  // ---- independent reference evaluator (Kleene three-valued logic) ----
  private def evalRef(w: Where, row: (Long, Option[String], Option[Boolean])): Option[Boolean] = w match {
    case And(ps) =>
      val vs = ps.map(evalRef(_, row))
      if (vs.contains(Some(false))) Some(false)
      else if (vs.contains(None)) None else Some(true)
    case Or(ps) =>
      val vs = ps.map(evalRef(_, row))
      if (vs.contains(Some(true))) Some(true)
      else if (vs.contains(None)) None else Some(false)
    case Not(p) => evalRef(p, row).map(!_)
    case Field("s", f: StringF) => evalStrClean(f, row._2)
    case Field("b", f: BoolF) => evalBool(f, row._3)
    case other => fail(s"unexpected $other")
  }

  private def evalStrClean(f: StringF, v: Option[String]): Option[Boolean] = {
    def side(x: String) = if (f.insensitive) x.toLowerCase else x
    def cmp(p: String => Boolean): Option[Boolean] = v match {
      case None => None // SQL: NULL op x => NULL
      case Some(s) => Some(p(s))
    }
    val parts = Seq(
      f.equals.map {
        case Some(x) => cmp(s => side(s) == side(x))
        case None    => Some(v.isEmpty) // IS NULL: definite
      },
      f.in.map(xs => cmp(s => xs.map(side).contains(side(s)))),
      f.notIn.map(xs => cmp(s => !xs.map(side).contains(side(s)))),
      f.contains.map(x => cmp(s => side(s).contains(side(x)))),
      f.startsWith.map(x => cmp(s => side(s).startsWith(side(x)))),
      f.endsWith.map(x => cmp(s => side(s).endsWith(side(x)))),
      f.not.map {
        case StringF(Some(None), None, None, None, None, None, None, None, None, None, _, None) =>
          Some(v.isDefined) // not: null => IS NOT NULL: definite
        case nested =>
          evalStrClean(nested.copy(insensitive = nested.insensitive || f.insensitive), v).map(!_)
      }
    ).flatten
    if (parts.isEmpty) Some(true)
    else if (parts.contains(Some(false))) Some(false)
    else if (parts.contains(None)) None
    else Some(true)
  }

  private def evalBool(f: BoolF, v: Option[Boolean]): Option[Boolean] = {
    val parts = Seq(
      f.equals.map {
        case Some(x) => v match { case None => None; case Some(b) => Some(b == x) }
        case None    => Some(v.isEmpty)
      },
      f.not.map {
        case Some(x) => v match { case None => None; case Some(b) => Some(b != x) }
        case None    => Some(v.isDefined)
      }
    ).flatten
    if (parts.isEmpty) Some(true)
    else if (parts.contains(Some(false))) Some(false)
    else if (parts.contains(None)) None
    else Some(true)
  }

  // ---- filter generators ----
  private val genStrF: Gen[StringF] = for {
    eq <- Gen.option(Gen.oneOf(Gen.const(None),
      Gen.oneOf("alpha", "beta", "zzz", "ALPHA").map(Some(_))))
    in <- Gen.option(Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma")).map(_.take(3)))
    ct <- Gen.option(Gen.oneOf("alp", "et", "q"))
    sw <- Gen.option(Gen.oneOf("al", "ga", "Z"))
    ins <- Gen.oneOf(true, false)
    notNull <- Gen.option(Gen.oneOf(true, false))
  } yield StringF(equals = eq, in = in, contains = ct, startsWith = sw,
    insensitive = ins,
    not = notNull.map(nn => if (nn) StringF(equals = Some(None))
                            else StringF(contains = Some("a"))))

  private val genBoolF: Gen[BoolF] = for {
    eq <- Gen.option(Gen.oneOf(Gen.const(None), Gen.oneOf(true, false).map(Some(_))))
    nt <- Gen.option(Gen.oneOf(Gen.const(None), Gen.oneOf(true, false).map(Some(_))))
  } yield BoolF(equals = eq, not = nt)

  private def genWhere(depth: Int): Gen[Where] =
    if (depth <= 0) Gen.oneOf(genStrF.map(Field("s", _)), genBoolF.map(Field("b", _)))
    else Gen.frequency(
      3 -> genStrF.map(Field("s", _)),
      3 -> genBoolF.map(Field("b", _)),
      2 -> Gen.listOfN(2, genWhere(depth - 1)).map(And(_)),
      2 -> Gen.listOfN(2, genWhere(depth - 1)).map(Or(_)),
      1 -> genWhere(depth - 1).map(Not(_)))

  private def sparkIds(w: Where): Set[Long] =
    df.filter(Where.compile(w, df.apply)).select("id").as[Long].collect().toSet

  private def refIds(w: Where): Set[Long] =
    rows.filter(r => evalRef(w, r).contains(true)).map(_._1).toSet

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("Spark filter == reference three-valued evaluator on random trees") {
    checkProp(Prop.forAll(genWhere(2)) { w => sparkIds(w) == refIds(w) })
  }

  test("excluded middle splits into p, not-p, and null(p)") {
    checkProp(Prop.forAll(genWhere(1)) { w =>
      val p = sparkIds(w); val np = sparkIds(Not(w))
      val nullIds = rows.filter(r => evalRef(w, r).isEmpty).map(_._1).toSet
      (p intersect np).isEmpty &&
        (p union np union nullIds) == rows.map(_._1).toSet
    })
  }

  test("De Morgan holds under SQL null semantics") {
    checkProp(Prop.forAll(genWhere(1), genWhere(1)) { (a, b) =>
      sparkIds(Not(And(Seq(a, b)))) == sparkIds(Or(Seq(Not(a), Not(b)))) &&
        sparkIds(Not(Or(Seq(a, b)))) == sparkIds(And(Seq(Not(a), Not(b))))
    })
  }
}
