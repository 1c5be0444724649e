package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force laws for the round-8 wave-2 operators. */
class Round8bOpsSpec extends SparkSpec {

  test("incremental SCD2 merge is row-identical to the full rebuild") {
    val merged = Warehouse.scd2MergeQuery(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("val"), r.getString(2),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue),
        r.getAs[Boolean]("is_current"))).sortBy(t => (t._1, t._4))
    val rebuilt = Warehouse.scd2BuildQuery(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("val"), r.getString(2),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue),
        r.getAs[Boolean]("is_current"))).sortBy(t => (t._1, t._4))
    assert(merged.length == rebuilt.length && merged.nonEmpty)
    assert(merged.toSeq == rebuilt.toSeq)
  }

  test("adamic-adar equals an in-JVM recomputation over the co-order graph") {
    import spark.implicits._
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val scored = edges.toSeq.map { case (a, b) =>
      val common = (adj(a) & adj(b)).toSeq
      val aa = common.map { z =>
        BigDecimal(1.0 / math.log(adj(z).size.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (a, b, common.size.toLong, aa.toDouble)
    }.filter(_._3 > 0)
      .sortBy { case (a, b, _, aa) => (-aa, a, b) }.take(20)
    val got = Graphs.adamicAdar(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("aa_score"))).toSeq
    assert(got.size == scored.size)
    got.zip(scored).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-9, s"$g vs $e")
    }
  }

  test("skew/kurtosis equal the textbook moments on collected cents") {
    import spark.implicits._
    val vals = graft.tables.Tables.events(spark, sf001)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1)
    val got = Analytics.skewKurtosis(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == vals.keySet)
    vals.foreach { case (tpe, rows) =>
      val w = rows.map(v => math.round(v._2 * 100).toDouble)
      val n = w.length.toDouble
      val mean = w.sum / n
      val m2 = w.map(x => (x - mean) * (x - mean)).sum / n
      val m3 = w.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = w.map(x => math.pow(x - mean, 4)).sum / n
      val r = got(tpe)
      assert(r.getAs[Long]("n") == w.length)
      assert(math.abs(r.getAs[Double]("mean_value") - mean / 100) < 1e-4)
      assert(math.abs(r.getAs[Double]("sd_value") - math.sqrt(m2) / 100) < 1e-4)
      assert(math.abs(r.getAs[Double]("skewness") - m3 / (m2 * math.sqrt(m2))) < 1e-4)
      assert(math.abs(r.getAs[Double]("excess_kurtosis") - (m4 / (m2 * m2) - 3)) < 1e-4)
    }
  }

  test("zipf fit equals an in-JVM least squares over the same top-k cut") {
    import spark.implicits._
    val counts = graft.tables.Tables.documents(spark, sf001)
      .select(lower($"text")).as[String].collect()
      .flatMap(_.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, o) => (t, o.size.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
    def d6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val xy = counts.zipWithIndex.map { case ((_, c), i) =>
      (d6(math.log((i + 1).toDouble)), d6(math.log(c.toDouble))) }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum.toDouble, xy.map(_._2).sum.toDouble)
    val sxy = xy.map(p => p._1 * p._2).sum.toDouble
    val sxx = xy.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val row = LangModel.zipfFit(spark, sf001).collect().head
    assert(row.getAs[Long]("n_terms") == xy.length)
    assert(math.abs(row.getAs[Double]("zipf_slope") - slope) < 1e-5)
    assert(row.getAs[Double]("zipf_slope") < 0, "frequency must fall with rank")
    val r2 = row.getAs[Double]("r2")
    assert(r2 > 0 && r2 <= 1)
  }

  test("stickiness equals brute-force day/user set counting") {
    import spark.implicits._
    val du = graft.tables.Tables.events(spark, sf001)
      .select(expr("unix_micros(ts) div 86400000000"), $"user_id")
      .as[(Long, Long)].collect().toSet
    val days = du.map(_._1)
    val got = Events.stickiness(spark, sf001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == days)
    days.foreach { d =>
      def cnt(lo: Long) =
        du.filter(p => p._1 >= lo && p._1 <= d).map(_._2).size.toLong
      val exp = (cnt(d), cnt(d - 6), cnt(d - 29))
      assert(got(d) == exp, s"day $d: ${got(d)} vs $exp")
    }
  }
}
