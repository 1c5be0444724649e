package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BandJoinRewrite — the injected optimizer rule that turns a naive
  * `abs(x - y) <= w` non-equi join into a banded equi-join. Pins: the
  * un-rewritten plan is a nested loop and the rewritten one is not; the
  * rewrite is value-invisible (including negative values around the
  * truncated-division zero band and exact boundary widths); out-of-scope
  * shapes are left alone.
  */
class BandJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    BandJoinRewrite.ensureRegistered(spark)
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  /** Entries register the rule on the shared session and it stays; plan
    * captures of the UN-rewritten shape must clear it explicitly or the
    * assertion becomes test-order-dependent under the full suite.
    */
  private def withoutRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ eq BandJoinRewrite)
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  private def naiveBand(xs: Seq[Long], ys: Seq[Long], w: Long): DataFrame =
    xs.toDF("x").join(ys.toDF("y"), abs(col("x") - col("y")) <= lit(w))

  test("rewritten plan is a banded equi-join, not a nested loop") {
    val xs = (0L until 200L).map(_ * 7L)
    val ys = (0L until 200L).map(_ * 11L)
    val before = withoutRule {
      naiveBand(xs, ys, 20L).queryExecution.executedPlan.toString }
    assert(before.contains("BroadcastNestedLoopJoin"),
      s"naive band join should nested-loop without the rule:\n$before")
    withRule {
      val after = naiveBand(xs, ys, 20L).queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin") &&
        !after.contains("CartesianProduct"),
        s"rule should eliminate the nested loop:\n$after")
      assert(after.contains("Generate"), "3-band replication missing")
      assert(after.contains("graft_band"), "band key missing from plan")
    }
  }

  test("rewrite is value-invisible: negatives, zero width, boundary hits") {
    // values straddle zero so the merged band-0 truncation case is live;
    // widths include 0 and values sitting exactly on the boundary
    val xs = Seq(-25L, -13L, -1L, 0L, 1L, 7L, 13L, 26L, 100L)
    val ys = Seq(-26L, -13L, -12L, -2L, 0L, 6L, 13L, 39L, 87L)
    for (w <- Seq(0L, 1L, 12L, 13L, 50L)) {
      val plain = withoutRule {
        naiveBand(xs, ys, w).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq }
      val rewritten = withRule {
        naiveBand(xs, ys, w).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      assert(rewritten == plain, s"w=$w: rewrite changed the result")
      // cross-check one width against first principles
      if (w == 12L) {
        val expected = for (x <- xs; y <- ys if math.abs(x - y) <= w)
          yield (x, y)
        assert(plain == expected.sorted)
      }
    }
  }

  test("asymmetric conjuncts rewrite too, all spellings, value-invisible") {
    val xs = Seq(-40L, -13L, -1L, 0L, 1L, 7L, 13L, 26L, 100L)
    val ys = Seq(-26L, -14L, -13L, -2L, 0L, 6L, 13L, 39L, 87L)
    // (w1, w2): y in [x - w1, x + w2]; includes a negative bound
    // (strictly-after windows) and a zero-width point band
    for ((w1, w2) <- Seq((0L, 20L), (5L, 5L), (-3L, 10L), (0L, 0L), (30L, -1L))) {
      def cond = (col("x") - col("y") <= lit(w1)) &&
        (col("y") - col("x") <= lit(w2))
      val df = xs.toDF("x").join(ys.toDF("y"), cond)
      val expected = (for (x <- xs; y <- ys if y >= x - w1 && y <= x + w2)
        yield (x, y)).sorted
      val plain = withoutRule {
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq }
      val (rewritten, plan) = withRule {
        val d2 = xs.toDF("x").join(ys.toDF("y"), cond)
        (d2.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
          d2.queryExecution.executedPlan.toString)
      }
      assert(plain == expected, s"($w1,$w2): naive form wrong")
      assert(rewritten == expected, s"($w1,$w2): rewrite changed the result")
      if (w1 + w2 >= 0)
        assert(plan.contains("graft_band"), s"($w1,$w2): not rewritten:\n$plan")
    }
    // spelling variants normalize: literal-on-left and > / >= forms
    withRule {
      val a = xs.toDF("x").join(ys.toDF("y"),
        (lit(0L) >= col("x") - col("y")) && (col("y") - col("x") < lit(21L)))
      assert(a.queryExecution.executedPlan.toString.contains("graft_band"))
      val exp = (for (x <- xs; y <- ys if x - y <= 0 && y - x <= 20) yield (x, y)).sorted
      assert(a.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == exp)
    }
  }

  test("fixture entry equals its un-rewritten twin") {
    val plain = graft.ext.Events.bandJoinNearClicks(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the entry registers the rule as a side effect; rebuild the same
    // frame with it filtered out to force the nested-loop plan
    val prev = spark.experimental.extraOptimizations
    try {
      val naive = graft.ext.Events.bandJoinNearClicks(spark, sf001)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq BandJoinRewrite)
      val rows = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == plain && rows.nonEmpty)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("out-of-scope joins are untouched: equi keys present, non-literal width") {
    withRule {
      // equi-key + band: planner should keep the equi join un-rewritten
      // (no Generate in the plan) because the condition isn't a bare band
      val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "x")
      val r = Seq((1L, 12L), (2L, 90L)).toDF("k", "y")
      val equi = l.join(r, l("k") === r("k") &&
        abs(l("x") - r("y")) <= lit(5L))
      assert(!equi.queryExecution.executedPlan.toString.contains("Generate"))
      assert(equi.collect().map(_.getLong(0)).toSeq == Seq(1L))
      // non-literal width: left untouched (still a nested loop), correct
      val dyn = Seq((10L, 3L)).toDF("x", "wx")
        .join(Seq(12L).toDF("y"), abs(col("x") - col("y")) <= col("wx"))
      assert(dyn.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(dyn.count() == 1L)
    }
  }
}
