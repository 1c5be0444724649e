package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-11 operators
  * (X208–X211).
  */
class Round8kOpsSpec extends SparkSpec {

  test("rich club equals a brute-force induced-subgraph count") {
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // NB: .collect on the grouped Map would rebuild a Map from the
    // yielded tuples and silently dedup edges by first endpoint
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (e, g) => e -> g.size }
      .filter(_._2 >= 2).keys.toSeq
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
    info(s"jvm edges=${edges.size} nodes=${deg.size} deg>1=${deg.count(_._2 > 1)}")
    val got = Graphs.richClub(spark, sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L, 3L, 4L, 6L, 8L).foreach { k =>
      val nodes = deg.filter(_._2 > k).keySet
      val e = edges.count(p => nodes(p._1) && nodes(p._2)).toLong
      val r = got(k)
      assert(r.getAs[Long]("n_nodes") == nodes.size.toLong, s"k=$k")
      assert(r.getAs[Long]("n_edges") == e, s"k=$k")
      if (nodes.size >= 2)
        assert(r.getAs[Double]("phi") == math.rint(2.0 * e /
          (nodes.size.toLong * (nodes.size - 1)) * 1e6) / 1e6, s"k=$k")
    }
    // the curve must RISE somewhere on this hub-heavy co-order graph
    val phis = got.values.toSeq.sortBy(_.getLong(0))
      .flatMap(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(phis.nonEmpty && phis.max > phis.head)
  }

  test("slo burn reconciles with the daily error ledger") {
    val daily = graft.tables.Tables.events(spark, sf001)
      .select(expr("unix_micros(ts) div 86400000000").as("d"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (d, g) =>
        (d, g.count(_._2 == "error").toLong, g.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = Events.sloBurn(spark, sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == daily.size)
    daily.zipWithIndex.foreach { case ((d, err, tot), i) =>
      val w = daily.slice(math.max(0, i - 6), i + 1)
      val (e7, t7) = (w.map(_._2).sum, w.map(_._3).sum)
      val r = got(d)
      assert(r.getAs[Long]("errors") == err && r.getAs[Long]("total") == tot)
      assert(r.getAs[Boolean]("fast_burn") == (err * 1000 > tot * 720))
      assert(r.getAs[Boolean]("slow_burn") == (e7 * 100 > t7 * 30))
      assert(r.getAs[Double]("error_rate_7d") ==
        math.rint(e7.toDouble / t7 * 1e6) / 1e6)
    }
  }

  test("ttl audit expires the right rows against the watermark") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wm = ev.map(_._2).max
    def ret(t: String): Long =
      if (t == "error") 7L else if (t == "view" || t == "click") 14L else 365L
    val got = Warehouse.ttlAudit(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (t, g) =>
      val cut = wm - ret(t) * 86400000000L
      val expired = g.count(_._2 < cut).toLong
      val r = got(t)
      assert(r.getAs[Long]("retention_days") == ret(t), t)
      assert(r.getAs[Long]("n_rows") == g.size.toLong, t)
      assert(r.getAs[Long]("n_expired") == expired, t)
      if (expired < g.size)
        assert(r.getAs[Long]("oldest_kept_us") ==
          g.map(_._2).filter(_ >= cut).min, t)
    }
    // the tiering discriminates on this fixture: short tiers reclaim,
    // the 365-day tier keeps everything
    assert(got("error").getAs[Long]("n_expired") > 0)
    assert(got("purchase").getAs[Long]("n_expired") == 0L)
  }

  test("tile stats reconcile with the whole-image moments") {
    val tiles = Multimodal.tileStats(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val whole = Multimodal.channelStats(spark, sf001).collect()
      .map(s => s.doc_id -> s).toMap
    tiles.groupBy(_._1).foreach { case (d, g) =>
      assert(g.length == 16, s"doc $d tile count")
      assert(g.map(_._4).sum == whole(d).n_px, s"doc $d pixels")
      assert(g.map(_._5).sum == whole(d).px_sum, s"doc $d sum")
      g.foreach(t => assert(t._6 == t._5 / t._4, s"doc $d floor mean"))
    }
    // in-JVM replay of one raster's tile assignment
    val d0 = tiles.map(_._1).min
    val meta = graft.tables.Tables.documents(spark, sf001)
      .filter(col("doc_id") === d0).select("n_chars").collect()(0).getLong(0)
    val w = (8 + java.lang.Math.floorMod(d0, 9)).toInt
    val h = (8 + java.lang.Math.floorMod(meta, 9)).toInt
    val expect = (for (x <- 0 until w; y <- 0 until h) yield
      ((x * 4 / w).toLong, (y * 4 / h).toLong,
        java.lang.Math.floorMod(d0 * 31 + x * 7 + y * 13, 256).toLong))
      .groupBy(t => (t._1, t._2))
      .map { case (k, g) => (d0, k._1, k._2, g.size.toLong, g.map(_._3).sum) }
      .toSet
    assert(tiles.filter(_._1 == d0).map(t => (t._1, t._2, t._3, t._4, t._5))
      .toSet == expect)
  }
}
