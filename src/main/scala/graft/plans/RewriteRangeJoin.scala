package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}

/** Optimizer rule: rewrite a naive point-in-interval join
  *
  *   points JOIN intervals ON p >= lo AND p <= hi [AND residual…]
  *
  * into the banded equi-join `RangeJoin.pointInInterval` builds by hand —
  * intervals exploded to the bands they overlap, points projected to their
  * single band, hash join on the band with the ORIGINAL predicate kept as
  * residual. Without this, Catalyst has no equi-key to hash on and plans a
  * BroadcastNestedLoopJoin (or a cartesian product): O(|points|·|intervals|)
  * comparisons regardless of selectivity — the join that works in the demo
  * and dies at 100 TB. SQL users write BETWEEN joins; they should get the
  * scale-safe plan without knowing the operator exists.
  *
  * The band width cannot be derived inside the optimizer (a rule must not
  * run jobs), so the rewrite is GATED on the session conf
  * `spark.graft.rangeJoin.bandWidth` (domain units; unset/0 = rule off).
  * The `RangeJoin` operator remains the full-featured path (derived width,
  * long-interval straggler lanes).
  *
  * Safety guards (rewrite skipped unless ALL hold):
  *  - inner join whose condition's conjuncts contain BOTH bounds of ONE
  *    left-side expression `p` against right-side expressions `lo`, `hi`
  *    (`>=`/`>` and `<=`/`<`; strict bounds band identically — the original
  *    predicate stays as the residual filter, so the result set is exact);
  *  - no equi-join conjunct already spans the two sides (Catalyst would
  *    hash on it anyway; banding would only add rows to shuffle) — this also
  *    stops the rule re-firing on its own output;
  *  - `p`, `lo`, `hi` are deterministic, of ONE shared type among
  *    int/long/date/timestamp (mixed granularities would band wrong), each
  *    banded through a monotone to-long conversion — `bandWidth` is in the
  *    converted units (days for dates, seconds for timestamps);
  *  - both bound comparisons reference the SAME `p` (semantically equal).
  *
  * Each matching pair is produced exactly once: a point has exactly one
  * band, and the interval contributes one copy per band — only the copy in
  * the point's band can pair with it.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val BandWidthConf = "spark.graft.rangeJoin.bandWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = try conf.getConfString(BandWidthConf, "0").toLong
            catch { case _: NumberFormatException => 0L }
    if (w <= 0L) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, w).getOrElse(j)
    }
  }

  /** Monotone to-long conversion per domain type. Banding only needs
    * monotonicity — `lo <= p <= hi ⇒ band(p) ∈ [band(lo), band(hi)]` — and
    * the ORIGINAL predicate stays as the residual, so exactness never
    * depends on the conversion's granularity (timestamps band at second
    * granularity via the long cast; `bandWidth` is in those units). */
  private def toLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case IntegerType | TimestampType => Cast(e, LongType)
    // DATE→INT is not a legal cast; UnixDate is the dedicated days-since-epoch
    // expression (what the `unix_date` SQL function resolves to)
    case DateType => Cast(UnixDate(e), LongType)
    case _ => e
  }

  /** Exact floor division (negative-safe, no doubles):
    * `(x - pmod(x, w)) div w` — the numerator is an exact multiple of w, so
    * truncating division equals floor division. */
  private def floorDiv(e: Expression, w: Long): Expression = {
    val x = toLong(e)
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))
  }

  private def bandable(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | DateType | TimestampType => true
    case _ => false
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    def leftOnly(e: Expression)  = e.references.subsetOf(j.left.outputSet) && e.references.nonEmpty
    def rightOnly(e: Expression) = e.references.subsetOf(j.right.outputSet) && e.references.nonEmpty

    // an existing cross-side equi conjunct means Catalyst already has a hash
    // key (and marks our own rewritten output as done)
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b)       => (leftOnly(a) && rightOnly(b)) || (leftOnly(b) && rightOnly(a))
      case EqualNullSafe(a, b) => (leftOnly(a) && rightOnly(b)) || (leftOnly(b) && rightOnly(a))
      case _ => false
    }
    if (hasEquiKey) return None

    // normalize each comparison to (p, bound, isLower) with p on the left side
    def asBound(c: Expression): Option[(Expression, Expression, Boolean)] = c match {
      case GreaterThanOrEqual(p, lo) if leftOnly(p) && rightOnly(lo) => Some((p, lo, true))
      case GreaterThan(p, lo)        if leftOnly(p) && rightOnly(lo) => Some((p, lo, true))
      case LessThanOrEqual(lo, p)    if leftOnly(p) && rightOnly(lo) => Some((p, lo, true))
      case LessThan(lo, p)           if leftOnly(p) && rightOnly(lo) => Some((p, lo, true))
      case LessThanOrEqual(p, hi)    if leftOnly(p) && rightOnly(hi) => Some((p, hi, false))
      case LessThan(p, hi)           if leftOnly(p) && rightOnly(hi) => Some((p, hi, false))
      case GreaterThanOrEqual(hi, p) if leftOnly(p) && rightOnly(hi) => Some((p, hi, false))
      case GreaterThan(hi, p)        if leftOnly(p) && rightOnly(hi) => Some((p, hi, false))
      case _ => None
    }
    val bounds = conjuncts.flatMap(asBound)
    val lower = bounds.collectFirst { case (p, lo, true) => (p, lo) }
    val upper = bounds.collectFirst { case (p, hi, false) => (p, hi) }
    val ((p, lo), (p2, hi)) = (lower, upper) match {
      case (Some(l), Some(u)) => (l, u)
      case _ => return None
    }
    if (!p.semanticEquals(p2)) return None
    if (!Seq(p, lo, hi).forall(e => e.deterministic && bandable(e))) return None
    // mixed domain types (e.g. timestamp point, date bounds) would band at
    // different granularities and miss pairs — require one type throughout
    if (Set(p.dataType, lo.dataType, hi.dataType).size != 1) return None

    // left: project the point's single band
    val bandL = Alias(floorDiv(p, w), "__graft_band_p")()
    val leftProj = Project(j.left.output :+ bandL, j.left)
    // right: explode the interval to every band it overlaps
    val bandR = AttributeReference("__graft_band_iv", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: built post-analysis, it must carry
    // the session zone itself (ResolveTimeZone has already run)
    val gen = Generate(
      Explode(Sequence(floorDiv(lo, w), floorDiv(hi, w), None,
                       Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bandR), child = j.right)
    val banded = Join(leftProj, gen, Inner,
      Some(And(EqualTo(bandL.toAttribute, bandR), j.condition.get)), j.hint)
    Some(Project(j.output, banded))
  }
}
