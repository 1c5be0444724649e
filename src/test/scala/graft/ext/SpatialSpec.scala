package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The grid join must be (a) lossless vs brute force, (b) exact at the
  * radius boundary, and (c) an equi-join plan — no cross product.
  */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("grid join equals brute-force all-pairs on the fixture") {
    val s = Spatial.sites(spark, sf001)
    val f = Spatial.facilities(spark, sf001)
    val grid = Spatial.gridJoin(s, f).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = s.crossJoin(f)
      .withColumn("dist2",
        (col("x") - col("fx")) * (col("x") - col("fx")) +
          (col("y") - col("fy")) * (col("y") - col("fy")))
      .filter(col("dist2") <= Spatial.Radius * Spatial.Radius)
      .select("site_id", "fac_id", "dist2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(grid.nonEmpty && grid == brute)
  }

  test("boundary exactness: dist == R included, R+1 excluded, cell straddle found") {
    val r = Spatial.Radius
    val sites = Seq(
      (1L, 0L, 0L),       // on-boundary partner below
      (2L, 1000L, 1100L), // straddles a cell edge vs fac 20
      (3L, 5000L, 5000L)) // isolated
      .toDF("site_id", "x", "y")
    val facs = Seq(
      (10L, r, 0L),        // exactly R from site 1 -> included
      (11L, r + 1, 0L),    // R+1 -> excluded
      (20L, 999L, 1349L))  // next cell row up, dist² = 1+249² <= R²
      .toDF("fac_id", "fx", "fy")
    val out = Spatial.gridJoin(sites, facs, r).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(out.contains((1L, 10L, r * r)))
    assert(!out.exists { case (_, f, _) => f == 11L })
    assert(out.exists { case (s2, f, _) => s2 == 2L && f == 20L })
  }

  test("plan is an equi-join: no cartesian product or nested-loop join") {
    val plan = Spatial.proximityQuery(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
