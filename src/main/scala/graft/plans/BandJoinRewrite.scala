package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a non-equi *band join* with NO equi
  * key — the shape Spark can only plan as an O(|a|·|b|) nested loop —
  * into a banded equi-join. Two surface forms are recognized:
  *
  *   - symmetric:  `abs(x - y) <= w`
  *   - asymmetric: `x - y <= B AND y - x <= A` in any conjunct order /
  *     comparison spelling (`<`, `<=`, `>`, `>=`, literal on either
  *     side) — i.e. `y BETWEEN x - B AND x + A`, which covers the
  *     directional "events in the window AFTER an anchor" joins.
  *
  * The asymmetric form is normalized into the symmetric one in doubled
  * coordinates — `y ∈ [x-B, x+A]  ⟺  |2y - (2x + A - B)| <= A+B` —
  * exact integer math, so both forms share one rewrite:
  *
  *   - left gains `band = x' div (w+1)` (x' the doubled/shifted anchor);
  *   - right explodes to its three candidate bands
  *     `(y' div (w+1)) + {-1, 0, 1}`;
  *   - the join becomes an EQUI join on the band, with the ORIGINAL
  *     predicate kept as a residual filter.
  *
  * Lossless: `|x' - y'| <= w < w+1` implies the truncated-division
  * bands of x' and y' differ by at most 1 (truncation only ever MERGES
  * the two bands around zero, which cannot push a qualifying pair
  * further apart), and bands partition the line, so each qualifying
  * pair survives in exactly one of the three replicas — no duplicates,
  * no misses, for negative values too. The 3× build-side replication
  * buys a shuffle plan whose per-band populations are data-density-
  * bounded: at 100 TB this is the difference between a job that
  * finishes and a cross product that never does. (The doubling costs
  * one bit of headroom: operand domains must stay within ±2^61, which
  * every epoch-µs/ns timestamp does.)
  *
  * The reference has no optimizer at all (`DataWarehouse.js` walks
  * arrays with `filter`/`find`); this is the Spark-first counterpart —
  * keep the USER'S query naive and declarative, make the planner do the
  * scaling. Registered two ways:
  *
  *   - [[graft.functions.GraftExtensions]] injects it at session build
  *     (`withExtensions` / `spark.sql.extensions`) — the production path;
  *   - [[BandJoinRewrite.ensureRegistered]] appends it to
  *     `spark.experimental.extraOptimizations` on a live session (the
  *     harness path, where the session already exists).
  *
  * Scope guards: inner joins, `LongType` operands each bound entirely to
  * one join child, literal band bounds, and the band predicate(s) are
  * the WHOLE join condition (an extra equi conjunct means Spark already
  * has a hash-join shape — rewriting under it would only add work).
  * Anything else is left untouched.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Append to `spark.experimental.extraOptimizations` exactly once. */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  /** Normalize one comparison into difference constraints `u - v <= w`
    * (empty when the node is not a long-difference-vs-literal shape).
    */
  private def asDiffLe(e: Expression): Seq[(Expression, Expression, Long)] = {
    def ok(s: Subtract) = s.dataType == LongType
    e match {
      case LessThanOrEqual(s @ Subtract(a, b, _), Literal(w: Long, LongType)) if ok(s) =>
        Seq((a, b, w))
      case LessThan(s @ Subtract(a, b, _), Literal(w: Long, LongType)) if ok(s) =>
        Seq((a, b, w - 1))
      case GreaterThanOrEqual(s @ Subtract(a, b, _), Literal(w: Long, LongType)) if ok(s) =>
        Seq((b, a, -w))
      case GreaterThan(s @ Subtract(a, b, _), Literal(w: Long, LongType)) if ok(s) =>
        Seq((b, a, -w - 1))
      case LessThanOrEqual(Literal(w: Long, LongType), s @ Subtract(a, b, _)) if ok(s) =>
        Seq((b, a, -w))
      case LessThan(Literal(w: Long, LongType), s @ Subtract(a, b, _)) if ok(s) =>
        Seq((b, a, -w - 1))
      case GreaterThanOrEqual(Literal(w: Long, LongType), s @ Subtract(a, b, _)) if ok(s) =>
        Seq((a, b, w))
      case GreaterThan(Literal(w: Long, LongType), s @ Subtract(a, b, _)) if ok(s) =>
        Seq((a, b, w - 1))
      case _ => Seq.empty
    }
  }

  /** `(anchor x', probe y', width)` in the shared symmetric form, when
    * `cond` is a rewritable band predicate over the two join children —
    * x' bound to `left`, y' bound to `right`.
    */
  private def extract(cond: Expression, left: LogicalPlan,
                      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def sides(x: Expression, y: Expression): Boolean =
      x.references.subsetOf(left.outputSet) &&
        y.references.subsetOf(right.outputSet)

    splitConjunctivePredicates(cond) match {
      // symmetric: abs(x - y) <= w, already in shared form
      case Seq(one) =>
        val absLe = one match {
          case LessThanOrEqual(a @ Abs(_, _), Literal(w: Long, LongType)) => Some((a, w))
          case GreaterThanOrEqual(Literal(w: Long, LongType), a @ Abs(_, _)) => Some((a, w))
          case _ => None
        }
        absLe.collect {
          case (Abs(s @ Subtract(x, y, _), _), w)
              if w >= 0 && s.dataType == LongType =>
            if (sides(x, y)) Some((x, y, w))
            else if (sides(y, x)) Some((y, x, w))
            else None
        }.flatten
      // asymmetric pair: u - v <= A  AND  v - u <= B  (either order)
      case Seq(p1, p2) =>
        (for {
          (u1, v1, a) <- asDiffLe(p1)
          (u2, v2, b) <- asDiffLe(p2)
          if u1.semanticEquals(v2) && v1.semanticEquals(u2)
        } yield {
          // constraints: u1 - v1 <= a, v1 - u1 <= b
          val pick =
            if (sides(v1, u1)) Some((v1, u1, b, a)) // x = v1, y = u1: y∈[x-b, x+a]
            else if (sides(u1, v1)) Some((u1, v1, a, b)) // x = u1: y∈[x-a, x+b]
            else None
          pick.collect { case (x, y, w1, w2) if w1 + w2 >= 0 =>
            // y ∈ [x-w1, x+w2]  ⟺  |2y - (2x + w2 - w1)| <= w1 + w2
            val x2 = Add(Multiply(x, Literal(2L, LongType)),
              Literal(w2 - w1, LongType))
            val y2 = Multiply(y, Literal(2L, LongType))
            (x2, y2, w1 + w2)
          }
        }).flatten.headOption
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if extract(cond, left, right).isDefined =>
      val (x, y, w) = extract(cond, left, right).get
      val width = Literal(w + 1L, LongType)
      val lBand = Alias(IntegralDivide(x, width), "graft_band_l")()
      val newLeft = Project(left.output :+ lBand, left)
      val rBand = IntegralDivide(y, width)
      val candidates = CreateArray(Seq(
        Subtract(rBand, Literal(1L, LongType)), rBand,
        Add(rBand, Literal(1L, LongType))))
      val genOut =
        AttributeReference("graft_band_r", LongType, nullable = true)()
      val newRight =
        Generate(Explode(candidates), Nil, outer = false, None, Seq(genOut), right)
      val newCond = And(EqualTo(lBand.toAttribute, genOut), cond)
      // restore the original output (the band columns are internal)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
