package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Custom logical operator: range join `points ⋈ intervals ON lo <= pt
  * <= hi` (all three LONG, e.g. epoch seconds).
  *
  * Why a custom node (SURVEY §7.3 preference ladder, step (c)): Spark
  * has no equi-key to extract from a pure range predicate, so
  * `ExtractEquiJoinKeys` fails and the planner falls back to
  * `BroadcastNestedLoopJoin` / `CartesianProduct` — an O(n·m) pair scan
  * that is fine at test scale and dead at 100 TB. The declarative
  * [[RangeJoinPlan]] node carries the range semantics through analysis
  * untouched; [[ExpandRangeJoin]] then rewrites it into the
  * scale-correct shape: both sides bucketed by `bucketWidth`, intervals
  * exploded to every bucket they overlap, one EQUI-join on the bucket
  * id, and the exact range predicate kept as the join residual. The
  * result is a shuffled hash/sort-merge join on a high-cardinality key
  * — the plan you'd hand-write at scale — with Catalyst planning the
  * join strategy as usual.
  *
  * Cost model: each interval produces `ceil(len/width)+1 ≤ 2` bucket
  * rows when `width ≥` the max interval length (the intended setting),
  * so the exploded side is ≤ 2× the interval count, and every candidate
  * pair shares a bucket — no pair blow-up beyond true-match density ×
  * bucket collision rate.
  *
  * Semantics: INNER join, both bounds inclusive; rows with a NULL
  * point never match (range predicate is null-rejecting); intervals
  * with NULL or inverted bounds (`hi < lo`) produce no bucket rows.
  * Bucketing uses integral division, which truncates toward zero — the
  * map is still monotone over all longs, so pre-epoch (negative)
  * values bucket correctly; only the bucket *boundaries* shift around
  * zero (bucket 0 spans `(-width, width)`), a constant-factor quirk,
  * not a correctness one.
  */
final case class RangeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    pt: Expression,
    lo: Expression,
    hi: Expression,
    bucketWidth: Long)
  extends BinaryNode {
  require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule expanding [[RangeJoinPlan]] into bucketed-equi-join
  * form. Registered two ways: via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) for `spark.sql.extensions` sessions, and
  * auto-added to `spark.experimental.extraOptimizations` by
  * [[graft.operators.Temporal.rangeJoin]] for plain sessions (the rule
  * is idempotent — a second registration transforms nothing). */
object ExpandRangeJoin extends Rule[LogicalPlan] {

  private def bucketOf(e: Expression, width: Long): Expression =
    IntegralDivide(e, Literal(width, LongType))

  /** Runtime points-side prune (VERDICT r10 #1): without it the rewrite
    * buckets and SHUFFLES every point even when the interval set covers
    * a sliver of the domain — at sf10 that is 60M lineitems exchanged to
    * match a 34-day window (~1% can match), and at 100 TB a corpus-scale
    * exchange for metadata-scale selectivity the engine knows at run
    * time. The fix is the `InjectRuntimeFilter` idiom: an uncorrelated
    * scalar subquery computing `struct(min(lo), max(hi))` over the
    * interval frame, applied as `pt BETWEEN …` on the points side BELOW
    * the bucket exchange. The subquery is one metadata-scale aggregate
    * job (executed once before the main stages; both struct fields read
    * the same subquery instance, so `ReuseSubquery` dedups it); empty or
    * all-NULL interval frames yield NULL bounds, whose null-rejecting
    * comparison drops every point — exactly right, nothing could match.
    * Inverted intervals only widen the bounds (prune stays a superset of
    * the match set). Skipped when the interval plan is nondeterministic:
    * the subquery would re-execute it and could prune against a
    * different draw than the join sees. */
  private def pointBoundsPrune(r: LogicalPlan, pt: Expression,
      lo: Expression, hi: Expression): Option[Expression] = {
    // diagnostic A/B knob (the SPARK_GRAFT_STREAM_MAX_FILES precedent):
    // scale sweeps measure the prune's effect on the SAME fixture
    // instead of arguing it; never set in production
    if (sys.env.get("SPARK_GRAFT_RANGEJOIN_NOPRUNE").contains("1")) return None
    val deterministic = !r.exists(_.expressions.exists(!_.deterministic))
    if (!deterministic) None
    else {
      val bounds = Alias(CreateNamedStruct(Seq(
        Literal("lo"), Min(lo).toAggregateExpression(),
        Literal("hi"), Max(hi).toAggregateExpression())), "__rj_bounds")()
      val sub = ScalarSubquery(Aggregate(Nil, Seq(bounds), r))
      Some(And(
        GreaterThanOrEqual(pt, GetStructField(sub, 0, Some("lo"))),
        LessThanOrEqual(pt, GetStructField(sub, 1, Some("hi")))))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case rj @ RangeJoinPlan(l, r, pt, lo, hi, width) =>
      // points side: runtime bounds prune below the exchange, then one
      // bucket per surviving row
      val lPruned = pointBoundsPrune(r, pt, lo, hi)
        .map(Filter(_, l)).getOrElse(l)
      val ptBucket = Alias(bucketOf(pt, width), "__pt_bucket")()
      val lProj = Project(l.output :+ ptBucket, lPruned)

      // intervals side: explode to every overlapped bucket; NULL or
      // inverted bounds yield a NULL array, which Explode drops
      val bucketSeq = If(
        GreaterThanOrEqual(hi, lo),
        // Sequence is TimeZoneAwareExpression — it is only `resolved`
        // with a timeZoneId bound, even for LONG sequences
        new Sequence(
          bucketOf(lo, width), bucketOf(hi, width),
          Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone)),
        Literal.create(null, ArrayType(LongType, containsNull = false)))
      val ivBucket =
        AttributeReference("__iv_bucket", LongType, nullable = false)()
      val gen = Generate(
        Explode(bucketSeq),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(ivBucket),
        child = r)

      // equi-join on bucket + exact range residual
      val cond = And(
        EqualTo(ptBucket.toAttribute, ivBucket),
        And(GreaterThanOrEqual(pt, lo), LessThanOrEqual(pt, hi)))
      Project(rj.output, Join(lProj, gen, Inner, Some(cond), JoinHint.NONE))
  }
}
