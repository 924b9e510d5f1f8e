package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prisma-equivalent filter algebra, compiled to Catalyst [[Column]]s.
  *
  * Mirrors the declared filter surface of the reference
  * (`/root/reference/src/db/client/commonInputTypes.ts:17-155` — StringFilter,
  * BoolNullableFilter, DateTimeFilter, JsonNullableFilter, enum filters — and
  * the `AND`/`OR`/`NOT` connectors of `models/Company.ts:212-214`), with the
  * reference's SQL-backed semantics:
  *
  *   - `equals = null` compiles to `IS NULL`; `not = null` to `IS NOT NULL`
  *     (the tri-state `status` poll filter, `runner/locator.ts:61-67`).
  *   - every other operator follows SQL three-valued logic: a NULL field never
  *     matches a value comparison, and `not(contains(x))` excludes NULLs the
  *     same way `NOT (col LIKE …)` does in PostgreSQL.
  *   - `mode = insensitive` lowercases both sides
  *     (`internal/prismaNamespace.ts:990-995`).
  *
  * Everything compiles to built-in codegen'd expressions — no UDFs — so
  * Catalyst pushes the resulting predicates into the parquet scan.
  */
sealed trait Where {
  def and(o: Where): Where = And(Seq(this, o))
  def or(o: Where): Where = Or(Seq(this, o))
  def unary_! : Where = Not(this)
}

final case class And(ps: Seq[Where]) extends Where
final case class Or(ps: Seq[Where]) extends Where
final case class Not(p: Where) extends Where
/** A scalar filter applied to one column. */
final case class Field(name: String, f: ScalarFilter) extends Where
/** Raw escape hatch (the `\$queryRaw` spirit, but still a Column). */
final case class RawCol(c: Column) extends Where

/** Relation predicates — resolved by [[Model]] (they need the related table):
  * `some`/`every`/`none` on M-N / 1-N relations and `is null` on 1-1
  * (`models/FirmService.ts:272-276`, `models/CrmSyncEvent.ts:305-308`). */
final case class RelSome(relation: String, where: Where) extends Where
final case class RelEvery(relation: String, where: Where) extends Where
final case class RelNone(relation: String, where: Where) extends Where
final case class RelIsNull(relation: String, isNull: Boolean = true) extends Where

/** A filter on a single scalar column; `apply` builds the Column predicate. */
sealed trait ScalarFilter { def apply(c: Column): Column }

/** `commonInputTypes.ts:17-45` (+ nullable variant). `equals = Some(None)`
  * means "equals null" → IS NULL. `not` is recursive per the reference. */
final case class StringF(
    equals: Option[Option[String]] = None,
    in: Option[Seq[String]] = None,
    notIn: Option[Seq[String]] = None,
    lt: Option[String] = None, lte: Option[String] = None,
    gt: Option[String] = None, gte: Option[String] = None,
    contains: Option[String] = None,
    startsWith: Option[String] = None,
    endsWith: Option[String] = None,
    insensitive: Boolean = false,
    not: Option[StringF] = None) extends ScalarFilter {

  private def side(c: Column): Column = if (insensitive) lower(c) else c
  private def vl(s: String): Column =
    if (insensitive) lit(s.toLowerCase(java.util.Locale.ROOT)) else lit(s)

  def apply(c: Column): Column = {
    val conds = Seq(
      equals.map { case Some(v) => side(c) === vl(v); case None => c.isNull },
      in.map(vs => side(c).isin(vs.map(v =>
        if (insensitive) v.toLowerCase(java.util.Locale.ROOT) else v): _*)),
      notIn.map(vs => !side(c).isin(vs.map(v =>
        if (insensitive) v.toLowerCase(java.util.Locale.ROOT) else v): _*)),
      lt.map(v => side(c) < vl(v)), lte.map(v => side(c) <= vl(v)),
      gt.map(v => side(c) > vl(v)), gte.map(v => side(c) >= vl(v)),
      contains.map(v => side(c).contains(vl(v))),
      startsWith.map(v => side(c).startsWith(vl(v))),
      endsWith.map(v => side(c).endsWith(vl(v))),
      not.map {
        case StringF(Some(None), None, None, None, None, None, None, None, None, None, _, None) =>
          c.isNotNull // not: null → IS NOT NULL (runner/syncCrm.ts:63)
        case nested => !nested.copy(insensitive = nested.insensitive || insensitive)(c)
      }
    ).flatten
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }
}

/** `commonInputTypes.ts:47-50` — the tri-state nullable Boolean filter
  * (null = pending, true = done, false = failed; `schema.prisma:23`). */
final case class BoolF(
    equals: Option[Option[Boolean]] = None,
    not: Option[Option[Boolean]] = None) extends ScalarFilter {
  def apply(c: Column): Column = {
    val conds = Seq(
      equals.map { case Some(v) => c === lit(v); case None => c.isNull },
      not.map { case Some(v) => !(c === lit(v)); case None => c.isNotNull }
    ).flatten
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }
}

/** Ordered-comparable filter for numerics and timestamps
  * (`commonInputTypes.ts:52-61`). Values are passed as literals (Long,
  * Double, java.sql.Timestamp, ISO date string cast by caller). */
final case class CmpF(
    equals: Option[Option[Any]] = None,
    in: Option[Seq[Any]] = None,
    notIn: Option[Seq[Any]] = None,
    lt: Option[Any] = None, lte: Option[Any] = None,
    gt: Option[Any] = None, gte: Option[Any] = None,
    not: Option[CmpF] = None) extends ScalarFilter {
  def apply(c: Column): Column = {
    val conds = Seq(
      equals.map { case Some(v) => c === lit(v); case None => c.isNull },
      in.map(vs => c.isin(vs: _*)),
      notIn.map(vs => !c.isin(vs: _*)),
      lt.map(v => c < lit(v)), lte.map(v => c <= lit(v)),
      gt.map(v => c > lit(v)), gte.map(v => c >= lit(v)),
      not.map {
        case CmpF(Some(None), None, None, None, None, None, None, None) => c.isNotNull
        case nested => !nested(c)
      }
    ).flatten
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }
}

/** `commonInputTypes.ts:126-148` — JSON path filter. The column holds a JSON
  * document as a string; `path` walks object keys. All predicates compile to
  * the Spark 4 variant reader (`try_parse_json` + `try_variant_get`), which
  * is fully codegen'd — unlike `from_json` (CodegenFallback, interpreted),
  * which round 2 measured at 95 s for a three-predicate filter because each
  * predicate re-parsed the document outside whole-stage codegen.
  *
  * The three null notions Prisma distinguishes (`commonInputTypes.ts` DbNull
  * / JsonNull / AnyNull): `isDbNull` = the COLUMN is SQL NULL; `isJsonNull`
  * = the value AT PATH is a JSON `null` (variant null — `get_json_object`
  * alone cannot tell it from a missing key); `isAnyNull` = either.
  * `insensitive` lowercases both sides of the string predicates
  * (`mode: insensitive`).
  *
  * `equalsJson` is Prisma's `equals: InputJsonValue` on objects/arrays
  * (`commonInputTypes.ts:133`): structural value equality via
  * [[graft.functions.JsonNormKernel]]'s canonical form — minified, object
  * keys sorted, and numbers normalized by VALUE, so `{"a": 1}` equals
  * `{"a": 1.0}` exactly as the reference's Postgres JSONB (numeric-typed
  * numbers) compares them. `not` is the
  * recursive negation of `commonInputTypes.ts:147` with SQL three-valued
  * logic (a NULL/missing value matches neither the filter nor its negation,
  * matching the reference's JSONB-backed semantics). */
final case class JsonF(
    path: Seq[String] = Nil,
    equals: Option[String] = None,
    equalsJson: Option[String] = None,
    stringContains: Option[String] = None,
    stringStartsWith: Option[String] = None,
    stringEndsWith: Option[String] = None,
    arrayContains: Option[String] = None,
    arrayStartsWith: Option[String] = None,
    arrayEndsWith: Option[String] = None,
    lt: Option[Double] = None, lte: Option[Double] = None,
    gt: Option[Double] = None, gte: Option[Double] = None,
    isDbNull: Option[Boolean] = None,
    isJsonNull: Option[Boolean] = None,
    isAnyNull: Option[Boolean] = None,
    insensitive: Boolean = false,
    not: Option[JsonF] = None) extends ScalarFilter {
  private def jsonPath: String = "$" + path.map(p => s".$p").mkString

  def apply(c: Column): Column = applyVariant(c, try_parse_json(c))

  /** Compile against an ALREADY-PARSED variant column. `Model.applyWhere`
    * plans one `try_parse_json` per JSON field behind an [[graft.functions.Barrier]]
    * projection, so N predicates on the same document pay ONE parse per row
    * instead of N — `FilterExec` codegen does no cross-predicate
    * subexpression elimination, and round 3 measured the difference at 33 s
    * vs ~1 s on a three-predicate filter over a derived document. */
  def applyVariant(c: Column, pv: Column): Column = {
    val v = try_variant_get(pv, jsonPath, "string")
    def side(x: Column): Column = if (insensitive) lower(x) else x
    def vl(s: String): Column =
      if (insensitive) lit(s.toLowerCase(java.util.Locale.ROOT)) else lit(s)
    val arr = try_variant_get(pv, jsonPath, "array<string>")
    val num = try_variant_get(pv, jsonPath, "double")
    // JSON null at path: variant-typed extraction preserves the distinction
    // between `{"p": null}` (variant null) and a missing key (SQL NULL)
    lazy val jsonNull = coalesce(
      is_variant_null(try_variant_get(pv, jsonPath, "variant")),
      lit(false))
    val conds = Seq(
      equals.map(x => side(v) === vl(x)),
      // structural VALUE equality: both sides canonicalized (keys sorted,
      // numbers normalized by value) so `{"a":1}` equals `{"a":1.0}`, the
      // JSONB numeric semantics the reference's Postgres gives `equals:
      // InputJsonValue`. The literal canonicalizes once at plan time.
      equalsJson.map(x =>
        graft.functions.JsonNorm.jsonCanonical(
          to_json(try_variant_get(pv, jsonPath, "variant"))) ===
          lit(graft.functions.JsonNormKernel.canonicalLiteral(x))),
      stringContains.map(x => side(v).contains(vl(x))),
      stringStartsWith.map(x => side(v).startsWith(vl(x))),
      stringEndsWith.map(x => side(v).endsWith(vl(x))),
      arrayContains.map(x => array_contains(arr, x)),
      // try_element_at: an empty/absent array simply doesn't match (plain
      // element_at THROWS on out-of-bounds under Spark 4's ANSI default)
      arrayStartsWith.map(x => try_element_at(arr, lit(1)) === lit(x)),
      arrayEndsWith.map(x => try_element_at(arr, lit(-1)) === lit(x)),
      lt.map(x => num < lit(x)), lte.map(x => num <= lit(x)),
      gt.map(x => num > lit(x)), gte.map(x => num >= lit(x)),
      isDbNull.map(b => if (b) c.isNull else c.isNotNull),
      isJsonNull.map(b => if (b) jsonNull else !jsonNull),
      isAnyNull.map(b => if (b) c.isNull || jsonNull else c.isNotNull && !jsonNull),
      // the nested filter of `not` carries no `path` of its own
      // (commonInputTypes.ts:147 — path exists only at the top level), so it
      // ALWAYS applies at the enclosing filter's path
      not.map(nested =>
        !nested.copy(path = path,
            insensitive = nested.insensitive || insensitive)
          .applyVariant(c, pv))
    ).flatten
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }
}

/** `commonInputTypes.ts:150-155` — enum filter (validated string domain). */
final case class EnumF(
    equals: Option[String] = None,
    in: Option[Seq[String]] = None,
    notIn: Option[Seq[String]] = None,
    not: Option[String] = None) extends ScalarFilter {
  def apply(c: Column): Column = {
    val conds = Seq(
      equals.map(v => c === lit(v)),
      in.map(vs => c.isin(vs: _*)),
      notIn.map(vs => !c.isin(vs: _*)),
      not.map(v => !(c === lit(v)))
    ).flatten
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }
}

/** `models/Company.ts:278-292` — ScalarWhereWithAggregatesInput: the typed
  * `having` tree of `groupBy`. A leaf names a column and the aggregate to
  * test (`_count`/`_min`/`_max`/`_sum`/`_avg`, or the GROUP KEY value
  * itself), plus an ordinary scalar filter on the aggregated value;
  * connectors compose. [[Model.groupBy]] compiles the needed aggregates as
  * hidden columns of the same `agg` (Prisma lets `having` reference
  * aggregates the selection doesn't return), filters, and drops them. */
sealed trait HavingW {
  def and(o: HavingW): HavingW = HAnd(Seq(this, o))
  def or(o: HavingW): HavingW = HOr(Seq(this, o))
}
final case class HAnd(ps: Seq[HavingW]) extends HavingW
final case class HOr(ps: Seq[HavingW]) extends HavingW
final case class HNot(p: HavingW) extends HavingW
/** `agg`: one of count | min | max | sum | avg | key. */
final case class HAgg(field: String, agg: String, f: ScalarFilter) extends HavingW

object HavingW {
  /** All (field, agg) leaves in the tree. */
  def leaves(h: HavingW): Seq[(String, String)] = h match {
    case HAnd(ps)         => ps.flatMap(leaves)
    case HOr(ps)          => ps.flatMap(leaves)
    case HNot(p)          => leaves(p)
    case HAgg(f, a, _)    => Seq((f, a))
  }

  /** The aggregate expression a leaf needs, to be computed in the groupBy. */
  def aggColumn(field: String, agg: String): Column = agg match {
    case "count" => count(col(field))
    case "min"   => min(col(field))
    case "max"   => max(col(field))
    case "sum"   => sum(col(field))
    case "avg"   => avg(col(field))
    case "key"   => throw new IllegalArgumentException(
      s"$field: `key` leaves resolve to the group key column, never an aggregate")
    case other   => throw new IllegalArgumentException(s"unknown aggregate $other")
  }

  /** Compile against the aggregated frame; `cols` maps (field, agg) to the
    * (possibly hidden) aggregate column. */
  def compile(h: HavingW, cols: ((String, String)) => Column): Column = h match {
    case HAnd(ps)      => ps.map(compile(_, cols)).reduceOption(_ && _).getOrElse(lit(true))
    case HOr(ps)       => ps.map(compile(_, cols)).reduceOption(_ || _).getOrElse(lit(false))
    case HNot(p)       => !compile(p, cols)
    case HAgg(f, a, sf) => sf(cols((f, a)))
  }
}

object Where {
  /** Compile the scalar part of a predicate tree to one Column. Relation
    * predicates must already have been rewritten away by [[Model]] —
    * hitting one here is a programming error. */
  def compile(w: Where, col: String => Column): Column = w match {
    case And(ps)     => ps.map(compile(_, col)).reduceOption(_ && _).getOrElse(lit(true))
    case Or(ps)      => ps.map(compile(_, col)).reduceOption(_ || _).getOrElse(lit(false))
    case Not(p)      => !compile(p, col)
    case Field(n, f) => f(col(n))
    case RawCol(c)   => c
    case rel         => throw new IllegalStateException(s"unresolved relation predicate: $rel")
  }

  /** Flatten nested ANDs into top-level conjuncts (for split planning). */
  def conjuncts(w: Where): Seq[Where] = w match {
    case And(ps) => ps.flatMap(conjuncts)
    case other   => Seq(other)
  }

  /** Every field that carries a [[JsonF]] predicate anywhere in the tree. */
  def jsonFields(w: Where): Seq[String] = w match {
    case And(ps)            => ps.flatMap(jsonFields)
    case Or(ps)             => ps.flatMap(jsonFields)
    case Not(p)             => jsonFields(p)
    case Field(n, _: JsonF) => Seq(n)
    case _                  => Nil
  }

  /** Rewrite JSON predicates to read a pre-parsed variant column (one
    * `try_parse_json` per field per row, planned by the caller) instead of
    * re-parsing inside every predicate. */
  def substituteJson(w: Where, pv: Map[String, Column], col: String => Column): Where = w match {
    case And(ps) => And(ps.map(substituteJson(_, pv, col)))
    case Or(ps)  => Or(ps.map(substituteJson(_, pv, col)))
    case Not(p)  => Not(substituteJson(p, pv, col))
    case Field(n, jf: JsonF) if pv.contains(n) => RawCol(jf.applyVariant(col(n), pv(n)))
    case other => other
  }

  /** Collect every relation predicate in the tree (for flag planning). */
  def relationPreds(w: Where): Seq[Where] = w match {
    case And(ps) => ps.flatMap(relationPreds)
    case Or(ps)  => ps.flatMap(relationPreds)
    case Not(p)  => relationPreds(p)
    case r @ (_: RelSome | _: RelEvery | _: RelNone | _: RelIsNull) => Seq(r)
    case _ => Nil
  }

  /** Replace relation predicates with boolean flag-column references. */
  def substituteRels(w: Where, flags: Map[Where, String]): Where = w match {
    case And(ps) => And(ps.map(substituteRels(_, flags)))
    case Or(ps)  => Or(ps.map(substituteRels(_, flags)))
    case Not(p)  => Not(substituteRels(p, flags))
    case r @ (_: RelSome | _: RelEvery | _: RelNone | _: RelIsNull) =>
      RawCol(coalesce(col(flags(r)), lit(false)))
    case other => other
  }
}

/** Convenience constructors: `F.str("c_name").contains("x")` style. */
object F {
  def str(field: String, f: StringF): Where = Field(field, f)
  def bool(field: String, f: BoolF): Where = Field(field, f)
  def cmp(field: String, f: CmpF): Where = Field(field, f)
  def json(field: String, f: JsonF): Where = Field(field, f)
  def enum_(field: String, f: EnumF): Where = Field(field, f)
  def eq(field: String, v: Any): Where = Field(field, CmpF(equals = Some(Option(v))))
  def isNull(field: String): Where = Field(field, CmpF(equals = Some(None)))
  def notNull(field: String): Where = Field(field, CmpF(not = Some(CmpF(equals = Some(None)))))
  def raw(c: Column): Where = RawCol(c)
  val True: Where = And(Nil)
}
