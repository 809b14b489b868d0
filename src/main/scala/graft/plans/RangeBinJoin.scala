package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a naive interval (band) θ-join
  * `A JOIN B ON abs(a.t − b.t) <= w` into the bin-bucketed EQUI-join that
  * q18/q72 hand-write — the (c)-tier extension point from SURVEY §7.1
  * (custom `Rule[LogicalPlan]`, injected via `SparkSessionExtensions`)
  * used where Spark's built-in planner genuinely has no good strategy:
  * a pure non-equi join plans as BroadcastNestedLoopJoin, O(|A|·|B|)
  * comparisons, which is a dead end at 100 TB.
  *
  * Rewrite: the A side explodes each row into the ≤3 width-w bins its
  * ±w interval can touch (`sequence((t−w) div w, (t+w) div w)`), the B
  * side keys by its own bin (`t div w`), and the join becomes bin
  * equality AND the original predicate (the exact re-check). Same rows,
  * provably: truncating division is monotone, so |x−y| ≤ w implies
  * y's bin lies within x's bin range; the re-check removes everything
  * else. Cost: ≤3× one side's rows through a hash join instead of the
  * full cross product — the shuffle keys by bin, so arrival-rate-dense
  * regions spread over many bins.
  *
  * Fires only on an INNER join whose condition contains an
  * `abs(x − y) <= literal` conjunct linking the two sides and NO
  * cross-side equality conjunct (if one exists the join is already
  * hash-joinable and the rewrite would only add work). Idempotent: the
  * rewritten join contains a cross-side equality, so the guard refuses
  * a second pass.
  */
object RangeBinJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def crossSide(l: LogicalPlan, r: LogicalPlan, a: Expression, b: Expression) =
    (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
      (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner, Some(cond), hint) if j.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasCrossEqui = conjuncts.exists {
        case EqualTo(a, b) => crossSide(l, r, a, b)
        case EqualNullSafe(a, b) => crossSide(l, r, a, b)
        case _ => false
      }
      // integral-only: binning truncates via IntegralDivide, which is only
      // monotonicity-safe when the compared values are themselves integers —
      // a fractional time column could land one bin away from its truncated
      // value and a border pair would be missed
      def integral(e: Expression) = e.dataType match {
        case LongType | org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
      val band = conjuncts.collectFirst {
        case LessThanOrEqual(Abs(Subtract(a, b, _), _), lw: Literal)
            if integral(lw) && integral(a) && integral(b) &&
              lw.value != null && a.deterministic && b.deterministic &&
              crossSide(l, r, a, b) =>
          (a, b, lw.value.toString.toLong)
      }
      band match {
        case Some((a, b, w)) if !hasCrossEqui && w > 0 =>
          // normalize: `la` references the left child, `rb` the right
          val (la, rb) =
            if (a.references.subsetOf(l.outputSet)) (a, b) else (b, a)
          val wLit = Literal(w, LongType)
          val laL = Cast(la, LongType)
          val rbL = Cast(rb, LongType)
          val binAttr = AttributeReference("__graft_bin", LongType)()
          // Sequence is TimeZoneAwareExpression: without an explicit zone
          // it is unresolved, and optimizer-created nodes get no analyzer
          // pass to fill it in
          val bins = new Sequence(
            IntegralDivide(Subtract(laL, wLit), wLit),
            IntegralDivide(Add(laL, wLit), wLit),
            Literal(1L)).withTimeZone(conf.sessionLocalTimeZone)
          val lGen = Generate(Explode(bins), Nil, outer = false, None,
            Seq(binAttr), l)
          val rBin = Alias(IntegralDivide(rbL, wLit), "__graft_bin_r")()
          val rProj = Project(r.output :+ rBin, r)
          val newJoin = Join(lGen, rProj, Inner,
            Some(And(EqualTo(binAttr, rBin.toAttribute), cond)), hint)
          Project(j.output, newJoin)
        case _ => j
      }
  }
}
