package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite an equi-key-less point-in-interval theta join
  * into the bucketized equi-join of [[graft.operators.RangeJoin]].
  *
  * Spark's JoinSelection plans a join whose condition has no equi conjunct
  * as BroadcastNestedLoopJoin — O(|L|·|R|) with one side fully broadcast,
  * the plan that stops scaling first at 100 TB. When the condition bounds
  * one side's long column between two columns of the other side
  * (`l.p >= r.s AND l.p <= r.e`, any >=/> and <=/< mix, either argument
  * order), this rule:
  *
  *  1. projects `p DIV w` onto the point side (one bucket per row);
  *  2. generates `explode(sequence(s DIV w, e DIV w))` on the interval
  *     side (every bucket the interval overlaps);
  *  3. joins on bucket equality with the ORIGINAL predicates kept as
  *     residuals, then projects back to the original output.
  *
  * Truncating division is monotone, so every true match shares a bucket
  * and each appears exactly once (the point owns one bucket) — results are
  * identical to the nested-loop plan, including null semantics (null
  * bounds bucket to null, which the equi key drops, as the comparison
  * would). The rewritten join HAS an equi conjunct, so the rule never
  * fires on its own output and JoinSelection picks a hash join.
  *
  * Off by default: fires only when `spark.graft.rangeJoin.bucketWidth`
  * (in the bound columns' units) is set positive — bucket width is a
  * data-dependent choice (pick ≈ the typical interval span), like the
  * bin size of Databricks' range-join hint. A non-numeric value disables
  * the rewrite (logged) rather than failing the optimizer. The interval
  * side explodes to span/width buckets per row, so a width far below the
  * typical span inflates the build side (and a span/width over the max
  * array size fails the Sequence at runtime) — the bounds are per-row
  * columns, unknowable at plan time, so choosing a sane width is the
  * caller's contract, exactly as with Databricks' bin size. Registered by
  * [[graft.functions.GraftExtensions]]; also usable via
  * `spark.experimental.extraOptimizations`.
  */
case class RangeJoinRule() extends Rule[LogicalPlan] {

  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  /** bound fact extracted from one conjunct: `point` is limited by `limit`
    * from below (isLower) or above */
  private case class Bound(point: Attribute, limit: Attribute,
      isLower: Boolean)

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  /** each comparison read both ways: a >= b bounds a below AND bounds b
    * above */
  private def boundsOf(e: Expression): Seq[Bound] = e match {
    case GreaterThanOrEqual(a: Attribute, b: Attribute) =>
      Seq(Bound(a, b, isLower = true), Bound(b, a, isLower = false))
    case GreaterThan(a: Attribute, b: Attribute) =>
      Seq(Bound(a, b, isLower = true), Bound(b, a, isLower = false))
    case LessThanOrEqual(a: Attribute, b: Attribute) =>
      Seq(Bound(a, b, isLower = false), Bound(b, a, isLower = true))
    case LessThan(a: Attribute, b: Attribute) =>
      Seq(Bound(a, b, isLower = false), Bound(b, a, isLower = true))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed width must disable the rewrite, not throw inside the
    // optimizer (which would break every query in the session)
    val width = conf.getConfString(WidthKey, "0").toLongOption.getOrElse {
      logWarning(s"$WidthKey is not a long; range-join rewrite disabled")
      0L
    }
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConj(cond)
        def sided(a: Attribute): Option[Boolean] =
          if (left.outputSet.contains(a)) Some(true)
          else if (right.outputSet.contains(a)) Some(false) else None
        // an existing cross-side equi conjunct means JoinSelection already
        // has a hash key — nothing to fix (also the refire guard)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (a.references ++ b.references).flatMap(sided).toSet.size == 2
          case EqualNullSafe(a, b) =>
            (a.references ++ b.references).flatMap(sided).toSet.size == 2
          case _ => false
        }
        val bounds = conjuncts.flatMap(boundsOf).filter(b =>
          b.point.dataType == LongType && b.limit.dataType == LongType)
        // point p on one side, both its bounds on the other side
        val pattern = bounds.collect {
          case lo if lo.isLower =>
            bounds.collectFirst {
              case hi if !hi.isLower && hi.point.semanticEquals(lo.point) &&
                  (for {
                    ps <- sided(lo.point); ss <- sided(lo.limit)
                    es <- sided(hi.limit)
                  } yield ps != ss && ss == es).contains(true) =>
                (lo.point, lo.limit, hi.limit)
            }
        }.flatten.headOption
        if (hasEqui || pattern.isEmpty) j
        else {
          val (p, s, e) = pattern.get
          val pOnLeft = sided(p).get
          val (pPlan, iPlan) = if (pOnLeft) (left, right) else (right, left)
          def div(x: Expression) = IntegralDivide(x, Literal(width))
          val pBucket = Alias(div(p), "__rj_bucket_p")()
          val pProj = Project(pPlan.output :+ pBucket, pPlan)
          val iBucket =
            AttributeReference("__rj_bucket_i", LongType, nullable = false)()
          // Sequence is TimeZoneAwareExpression — unresolved until the
          // session zone is attached (irrelevant for longs, but required)
          val seq = new Sequence(div(s), div(e), Literal(1L))
            .withTimeZone(conf.sessionLocalTimeZone)
          val gen = Generate(
            Explode(seq),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(iBucket), child = iPlan)
          val newCond = (EqualTo(pBucket.toAttribute, iBucket) +: conjuncts)
            .reduce(And)
          val newJoin =
            if (pOnLeft) Join(pProj, gen, Inner, Some(newCond), hint)
            else Join(gen, pProj, Inner, Some(newCond), hint)
          Project(j.output, newJoin)
        }
    }
  }
}
