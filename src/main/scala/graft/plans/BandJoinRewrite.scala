package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a non-equi *band join* —
  * `a JOIN b ON abs(a.x - b.y) <= w` with NO equi key — from the
  * O(|a|·|b|) nested-loop plan Spark would otherwise produce into a
  * banded equi-join:
  *
  *   - left gains `band = x div (w+1)`;
  *   - right explodes to its three candidate bands
  *     `(y div (w+1)) + {-1, 0, 1}`;
  *   - the join becomes an EQUI join on the band plus the original
  *     predicate as a residual filter.
  *
  * Lossless: `|x - y| <= w < w+1` implies the truncated-division bands
  * of x and y differ by at most 1 (truncation only ever MERGES the two
  * bands around zero, which cannot push a qualifying pair further
  * apart), and bands partition the line, so each qualifying pair
  * survives in exactly one of the three replicas — no duplicates, no
  * misses, for negative values too. The 3× build-side replication buys
  * a shuffle-hash/sort-merge plan whose per-band populations are data-
  * density-bounded: at 100 TB this is the difference between a job that
  * finishes and an O(n²) cross product that never does.
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
  * Scope guards: inner joins, both operands `LongType`, band width
  * literal and non-negative, each side of the subtraction bound entirely
  * to one join child. Anything else is left untouched.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  /** Append to `spark.experimental.extraOptimizations` exactly once. */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  /** `(leftOperand, rightOperand, width)` when `cond` is a rewritable
    * band predicate over the two join children.
    */
  private def extract(cond: Expression, left: LogicalPlan,
                      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    val absLe = cond match {
      case LessThanOrEqual(abs @ Abs(_, _), Literal(w: Long, LongType)) =>
        Some((abs, w))
      case GreaterThanOrEqual(Literal(w: Long, LongType), abs @ Abs(_, _)) =>
        Some((abs, w))
      case _ => None
    }
    absLe.collect {
      case (Abs(Subtract(x, y, _), _), w)
          if w >= 0 && x.dataType == LongType && y.dataType == LongType =>
        if (x.references.subsetOf(left.outputSet) &&
            y.references.subsetOf(right.outputSet)) Some((x, y, w))
        else if (y.references.subsetOf(left.outputSet) &&
                 x.references.subsetOf(right.outputSet)) Some((y, x, w))
        else None
    }.flatten
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
