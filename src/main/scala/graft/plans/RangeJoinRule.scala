package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite point-in-interval joins to bin-bucketed
  * equi-joins — the `SparkSessionExtensions` twin of
  * [[graft.operators.RangeJoin.binJoin]].
  *
  * Catalyst plans `points JOIN intervals ON v >= lo AND v < hi` as
  * BroadcastNestedLoopJoin (there is no equi-key to hash on): every point
  * is tested against every interval — O(|P|·|I|), and with both sides
  * large the broadcast itself fails. This rule detects an inner join whose
  * condition contains a lower AND an upper bound on the same one-side
  * expression (any of `>=`/`>`/`<=`/`<` and either argument order), with
  * the bounds from the other side and NO existing equi-conjunct, and
  * rewrites:
  *
  *  - point side: project an extra `__graft_bin = floor(v / w)`;
  *  - interval side: `explode(sequence(floor(lo/w), floor(hi/w)))`;
  *  - join on bin equality, keeping the ORIGINAL condition as the exact
  *    filter (so bin-edge false candidates drop, and strictness of the
  *    original bounds is preserved bit-for-bit);
  *  - project back to the original output attributes (same exprIds — the
  *    rewrite is invisible to parent operators).
  *
  * Correct for any bin width: bins only generate candidates, the original
  * predicate decides. Each matching pair survives exactly once because a
  * point owns exactly one bin. NULL bounds/values produce no candidate
  * rows, matching the original join's NULL semantics.
  *
  * Off by default; enable by setting `spark.graft.rangeJoin.binWidth` to a
  * positive width (choose ≈ the median interval length). Installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions`, programmatic
  * `.withExtensions(new GraftExtensions)`, or on a live session through
  * [[GraftExtensions.register]].
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinWidthKey, "0").toDouble
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, w).getOrElse(j)
    }
  }

  /** Which side of the join an expression is computable on, if exactly one. */
  private sealed trait Side
  private case object L extends Side
  private case object R extends Side

  private def rewrite(j: Join, cond: Expression, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def sideOf(e: Expression): Option[Side] =
      if (e.references.isEmpty || !e.deterministic) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(L)
      else if (e.references.subsetOf(j.right.outputSet)) Some(R)
      else None

    // an existing equi-conjunct means Spark already has a hash key — the
    // join is not a nested loop and the rewrite would only add work
    val hasEquiKey = conjuncts.exists {
      case Equality(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEquiKey) return None

    // every reading of a comparison conjunct as "point expr `v` bounded by
    // `b`": a >= b is a lower bound on a AND an upper bound on b
    sealed trait Kind
    case object Lower extends Kind
    case object Upper extends Kind
    def views(c: Expression): Seq[(Expression, Expression, Kind)] = c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, Lower), (b, a, Upper))
      case GreaterThan(a, b)        => Seq((a, b, Lower), (b, a, Upper))
      case LessThanOrEqual(a, b)    => Seq((a, b, Upper), (b, a, Lower))
      case LessThan(a, b)           => Seq((a, b, Upper), (b, a, Lower))
      case _                        => Seq.empty
    }
    def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

    val candidates = for {
      (ci, i) <- conjuncts.zipWithIndex
      (cj, jj) <- conjuncts.zipWithIndex if i != jj
      (v, lo, Lower) <- views(ci)
      (v2, hi, Upper) <- views(cj)
      if v.semanticEquals(v2) && numeric(v) && numeric(lo) && numeric(hi)
      vs <- sideOf(v)
      ls <- sideOf(lo)
      hs <- sideOf(hi)
      if ls == hs && ls != vs
    } yield (v, lo, hi, vs)

    candidates.headOption.map { case (v, lo, hi, pointSide) =>
      def binOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Literal(w)))

      val (pointPlan, intervalPlan) =
        if (pointSide == L) (j.left, j.right) else (j.right, j.left)

      val binP = Alias(binOf(v), "__graft_bin_p")()
      val pointProj = Project(pointPlan.output :+ binP, pointPlan)

      val binR = AttributeReference("__graft_bin_r", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: it is only `resolved` once a
      // timezone is pinned (the analyzer normally does this; post-analysis
      // rules must do it themselves)
      val seqExpr = Sequence(
        binOf(lo), binOf(hi), Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
      val intervalGen = Generate(
        Explode(seqExpr), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(binR), child = intervalPlan)

      val (newLeft, newRight) =
        if (pointSide == L) (pointProj, intervalGen) else (intervalGen, pointProj)
      val newCond = And(EqualTo(binP.toAttribute, binR), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
