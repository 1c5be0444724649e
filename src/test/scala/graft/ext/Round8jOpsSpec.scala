package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-10 operators
  * (X204–X207).
  */
class Round8jOpsSpec extends SparkSpec {

  test("lateral top-n equals the window spelling of the same query") {
    import org.apache.spark.sql.expressions.Window
    val cust = graft.tables.Tables.customer(spark, sf001)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
    val nat = graft.tables.Tables.nation(spark, sf001)
      .select(col("n_nationkey"), col("n_name"))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("bal").desc, col("c_custkey"))
    val orders = graft.tables.Tables.orders(spark, sf001)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val windowed = cust.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .join(nat, col("n_nationkey") === col("c_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"), "left")
      .select(col("n_name").as("nation"), col("c_custkey"),
        col("bal").cast("double").as("c_acctbal"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val got = Analytics.lateralTopN(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == windowed)
  }

  test("mode/median equal a brute-force per-type recomputation") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Analytics.modeFamily(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, g) =>
      val r = got(t)
      val hist = g.groupBy(_._2).map { case (v, xs) => (v, xs.size.toLong) }
      val (mv, mc) = hist.toSeq.maxBy { case (v, c) => (c, -v) }
      assert(r.getAs[Long]("mode_cents") == mv, t)
      assert(r.getAs[Long]("mode_count") == mc, t)
      val sorted = g.map(_._2).sorted
      val n = sorted.length
      val lo = sorted((n + 1) / 2 - 1)
      val hi = sorted(math.ceil((n + 1) / 2.0).toInt - 1)
      assert(r.getAs[Long]("n_rows") == n.toLong, t)
      assert(r.getAs[Double]("median_cents") == (lo + hi) / 2.0, t)
    }
  }

  test("walk co-occurrence reconciles with the shared walk corpus") {
    val walks = Graphs.randomWalks(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = walks.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(_._2)
      for (i <- s.indices; j <- i + 1 until s.length
           if s(j)._2 - s(i)._2 <= 2 && s(i)._3 != s(j)._3)
        yield (math.min(s(i)._3, s(j)._3), math.max(s(i)._3, s(j)._3))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val got = Graphs.walkCooccurrence(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
  }

  test("pack efficiency reconciles with the shared packing relation") {
    val sp = TextStats.shardPack(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = TextStats.packEfficiency(spark, sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    sp.groupBy(_._4).foreach { case (shard, g) =>
      val r = got(shard)
      val tokens = g.map(_._2).sum
      assert(r.getAs[Long]("n_docs") == g.size.toLong, shard)
      assert(r.getAs[Long]("tokens") == tokens, shard)
      assert(r.getAs[Long]("boundary_docs") ==
        g.count(d => (d._3 - 1) / 2000 != (d._3 - d._2) / 2000).toLong, shard)
      assert(r.getAs[Long]("overflow_tokens") == math.max(tokens - 2000, 0L))
    }
    // every doc is packed exactly once and the shard ids are dense-ish
    assert(got.values.map(_.getAs[Long]("n_docs")).sum == sp.length.toLong)
  }
}
