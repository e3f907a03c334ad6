package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a naive point-in-interval join into the bucketed
  * equi-join form of [[graft.operators.JoinOps.rangeJoin]] — automatically.
  *
  * A pure range condition (`p >= lo AND p <= hi`) has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin: O(|points|·|intervals|) and a broadcast
  * that OOMs once the interval side is large. When this rule is enabled it
  * rewrites
  * {{{ points ⋈ [p between lo and hi] intervals }}}
  * into
  * {{{ (points + bucket(p)) ⋈ [bucket equal AND original cond]
  *     (intervals × explode(sequence(bucket(lo), bucket(hi)))) }}}
  * which the planner turns into a shuffled equi-join. Each qualifying pair
  * still meets exactly once (a point owns exactly one bucket), so no dedup
  * is needed and the rewrite is semantics-preserving, including nulls (a
  * null point/bound fails the equality/sequence just as it failed the
  * original predicate).
  *
  * Enablement: set `spark.graft.rangeJoin.bucketWidth` (positive double) on
  * the session and add the rule via `spark.experimental.extraOptimizations`
  * or the `GraftExtensions` entry point. Unset = rule is a no-op.
  * Idempotent by construction: it only fires on joins with NO equi-conjunct,
  * and the rewritten join has one.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def widthConf: Option[Double] =
    Option(SQLConf.get.getConfString("spark.graft.rangeJoin.bucketWidth", ""))
      .filter(_.nonEmpty).flatMap(s => scala.util.Try(s.toDouble).toOption)
      .filter(_ > 0)

  private def sideOf(
      e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** (point expr on left, bound expr on right, isLower). */
  private def asBound(
      c: Expression, l: LogicalPlan, r: LogicalPlan):
      Option[(Expression, Expression, Boolean)] = {
    if (!c.deterministic) return None
    c match {
      case GreaterThanOrEqual(a, b) => bound(a, b, l, r, aIsPointMeansLower = true)
      case GreaterThan(a, b)        => bound(a, b, l, r, aIsPointMeansLower = true)
      case LessThanOrEqual(a, b)    => bound(a, b, l, r, aIsPointMeansLower = false)
      case LessThan(a, b)           => bound(a, b, l, r, aIsPointMeansLower = false)
      case _ => None
    }
  }

  private def bound(
      a: Expression, b: Expression, l: LogicalPlan, r: LogicalPlan,
      aIsPointMeansLower: Boolean):
      Option[(Expression, Expression, Boolean)] =
    (sideOf(a, l, r), sideOf(b, l, r)) match {
      case (Some(true), Some(false)) => Some((a, b, aIsPointMeansLower))
      case (Some(false), Some(true)) => Some((b, a, !aIsPointMeansLower))
      case _ => None
    }

  private def bucket(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))

  /** The bucket function is Cast-to-double based, so the rewrite is only
    * semantics-preserving for numeric operands: a string range (`name
    * BETWEEN 'a' AND 'z'`) would cast to NULL and silently EMPTY the join,
    * and a date-typed bound is not double-castable at all. Non-numeric
    * range joins keep their original plan. */
  private def bucketable(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  override def apply(plan: LogicalPlan): LogicalPlan = widthConf match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(l, r, Inner, Some(cond), hint)
            // only joins with NO equi-conjunct (the BNLJ-bound ones); the
            // rewritten join gains one, so the rule cannot re-fire
            if !splitConjunctivePredicates(cond).exists {
              case EqualTo(a, b) =>
                sideOf(a, l, r).isDefined && sideOf(b, l, r).isDefined &&
                  sideOf(a, l, r) != sideOf(b, l, r)
              case _ => false
            } =>
          val conjuncts = splitConjunctivePredicates(cond)
          val bounds = conjuncts.flatMap(asBound(_, l, r))
          val lower = bounds.find(_._3)
          val upper = lower.flatMap { case (p, _, _) =>
            bounds.find(b => !b._3 && b._1.semanticEquals(p))
          }
          val pair: Option[(Expression, Expression, Expression)] =
            (lower, upper) match {
              case (Some((p, lo, _)), Some((_, hi, _))) => Some((p, lo, hi))
              case _ => None
            }
          pair match {
            case Some((p, lo, hi))
                if bucketable(p) && bucketable(lo) && bucketable(hi) =>
              val lAlias = Alias(bucket(p, w), "_graft_bucket_l")()
              val leftB = Project(l.output :+ lAlias, l)
              // Sequence is TimeZoneAware: zone must be set for it to
              // resolve, even over longs. The step is left out on purpose:
              // an interval row with hi < lo would make an explicit +1 step
              // throw "Illegal sequence boundaries" at runtime, while the
              // step-less form auto-picks -1 and the residual `cond` then
              // drops every generated row — matching the original join,
              // where such a row simply matched nothing.
              val seq = Sequence(
                bucket(lo, w), bucket(hi, w), None,
                Some(SQLConf.get.sessionLocalTimeZone))
              val rAttr = AttributeReference(
                "_graft_bucket_r", LongType, nullable = true)()
              val rightB = Generate(
                Explode(seq), unrequiredChildIndex = Nil, outer = false,
                qualifier = None, generatorOutput = Seq(rAttr), child = r)
              val newJoin = Join(leftB, rightB, Inner,
                Some(And(EqualTo(lAlias.toAttribute, rAttr), cond)), hint)
              Project(l.output ++ r.output, newJoin)
            case _ => j
          }
      }
  }
}
