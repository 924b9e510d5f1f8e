package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive interval (point-in-range) join into
  * the bucketed equi-join shape, automatically.
  *
  * [[graft.operators.RangeJoin.bandJoin]] gives users who KNOW about the
  * nested-loop trap an explicit scale-safe band join. But the raw-SQL
  * surface (`$queryRaw`, reference `effect.ts:398-428`) accepts arbitrary
  * SQL, and `FROM a JOIN b ON a.t BETWEEN b.lo AND b.hi` — the sessions/
  * maintenance-windows/IP-range shape — plans as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side fits), the O(|L|·|R|) 100 TB
  * killer. This rule rescues that plan INSIDE the optimizer, where the
  * user can't forget to: quantize the point side into one bucket of width
  * W, explode each interval into its covered buckets, equi-join on the
  * bucket, and keep the ORIGINAL predicate as the exact residual filter.
  *
  * Correctness: if t ∈ [lo, hi] then ⌊t/W⌋ ∈ [⌊lo/W⌋, ⌊hi/W⌋], and the
  * point side owns exactly ONE bucket while an interval's buckets are
  * distinct — so every qualifying pair joins exactly once (no dedup) and
  * no qualifying pair is lost; non-qualifying same-bucket pairs fall to
  * the residual. Strict bounds (`<`/`>`) only widen the bucket range by
  * at most one bucket — the residual keeps the result exact. Intervals
  * with lo > hi or a NULL bound match nothing in the original join and
  * are filtered before the explode (Sequence would throw on a descending
  * range). A NULL point yields a NULL bucket, which an equi-join drops —
  * the same fate the original NULL comparison produced.
  *
  * Scope (deliberately narrow — an optimizer rewrite must never be
  * cleverer than it is correct):
  *   - INNER joins whose condition's conjuncts contain a lower and an
  *     upper bound on the SAME LongType expression, point side and bound
  *     side on opposite children, everything deterministic;
  *   - no cross-side equality conjunct already present (those plans
  *     hash-join fine without help — and the rewritten join's own bucket
  *     equality is what makes the rule idempotent under the optimizer's
  *     fixed point);
  *   - enabled only when `spark.graft.range_join.bucket_width` is a
  *     positive width in the t column's units. Width is workload
  *     knowledge (≈ the typical interval span); a default would silently
  *     explode intervals into thousands of buckets.
  *
  * Registered via `SparkSessionExtensions` ([[graft.GraftExtensions]])
  * or per-session with [[install]] (`spark.experimental
  * .extraOptimizations` — the post-analysis user batch).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.range_join.bucket_width"

  /** Idempotently add the rule to a live session's optimizer. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(WidthConf, "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if cond.deterministic =>
        rewrite(j, w).getOrElse(j)
    }
  }

  /** (point expression, bound expression, bound-is-lower) readings of one
    * comparison conjunct; each inequality bounds BOTH its operands. */
  private def boundReadings(c: Expression): Seq[(Expression, Expression, Boolean)] =
    c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case _                        => Nil
    }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)

    // an existing cross-side equality means ExtractEquiJoinKeys already
    // yields a hash join — and it is how a once-rewritten join opts out
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _ => false
    }
    if (hasEqui) return None

    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left
      val r = e.references
      if (r.isEmpty) None
      else if (r.subsetOf(left.outputSet)) Some(true)
      else if (r.subsetOf(right.outputSet)) Some(false)
      else None
    }

    val readings = conjuncts.flatMap(boundReadings)
    // find a (lower, upper) pair on the same LongType point expression,
    // point on one side, both bounds on the other
    val pair = (for {
      (t1, lo, true) <- readings.iterator
      (t2, hi, false) <- readings.iterator
      if t1.semanticEquals(t2) && !(lo eq hi)
      if t1.dataType == LongType && lo.dataType == LongType && hi.dataType == LongType
      tSideIsLeft <- sideOf(t1)
      loSide = sideOf(lo); hiSide = sideOf(hi)
      // each bound sits on the opposite side (or is a literal), and at
      // least one genuinely references it — two literals is just a filter
      if loSide.forall(_ != tSideIsLeft) && hiSide.forall(_ != tSideIsLeft)
      if loSide.nonEmpty || hiSide.nonEmpty
    } yield (t1, lo, hi, tSideIsLeft)).nextOption()

    pair.map { case (t, lo, hi, tSideIsLeft) =>
      val (tSide, iSide) = if (tSideIsLeft) (left, right) else (right, left)
      // ⌊x/W⌋ in EXACT integer arithmetic. A double floor-division is
      // only exact for |x| < 2^53, and this rule sees arbitrary LongType
      // expressions (hash values, surrogate ids) — past that boundary
      // the point's bucket and the interval's bucket range can disagree
      // and a qualifying pair is silently LOST (the residual filter
      // cannot resurrect a pair that never collided). Spark's `div`
      // truncates toward zero, so correct the negative-with-remainder
      // case down by one (Math.floorDiv). W > 0 is enforced at the
      // config gate, so neither div nor the remainder can overflow.
      // (RangeJoin.bandJoin keeps its double form: its domain is epoch
      // MICROS, provably < 2^53 through year ~2255.)
      def fdiv(e: Expression): Expression = {
        val q = IntegralDivide(e, Literal(w))
        val r = Remainder(e, Literal(w))
        If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
      }
      val tBucket = Alias(fdiv(t), "__graft_bucket_t")()
      val tProj = Project(tSide.output :+ tBucket, tSide)
      val iBucket = AttributeReference("__graft_bucket_i", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: the optimizer runs post-
      // analysis, so the timezone must be pinned here or the plan
      // "becomes unresolved" (integral ranges never consult it)
      val seq = new Sequence(fdiv(lo), fdiv(hi), Literal(1L))
        .withTimeZone(conf.sessionLocalTimeZone)
      val explodeBuckets = Generate(
        Explode(seq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBucket),
        // descending/NULL-bound intervals match nothing and would make
        // Sequence throw — drop them before the explode
        child = Filter(LessThanOrEqual(lo, hi), iSide))
      val newCond = (EqualTo(tBucket.toAttribute, iBucket) +: conjuncts).reduce(And)
      val (nl, nr) = if (tSideIsLeft) (tProj, explodeBuckets)
                     else (explodeBuckets, tProj)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    }
  }

  private def crossSide(a: Expression, b: Expression,
                        left: LogicalPlan, right: LogicalPlan): Boolean = {
    val (ra, rb) = (a.references, b.references)
    ra.nonEmpty && rb.nonEmpty &&
      ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
       (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet)))
  }
}
