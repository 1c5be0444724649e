package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-4 operators
  * (X174–X179).
  */
class Round8dOpsSpec extends SparkSpec {

  test("growth accounting: classes recompute; net growth equals active delta") {
    val um = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = um.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nNew = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val nRet = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val nRes = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val nChu = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    byUser.values.foreach { days =>
      days.zipWithIndex.foreach { case (d, i) =>
        if (i == 0) nNew(d) += 1
        else if (days(i - 1) == d - 1) nRet(d) += 1
        else nRes(d) += 1
        if (i == days.length - 1 || days(i + 1) > d + 1) nChu(d + 1) += 1
      }
    }
    val got = Events.growthAccounting(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val d = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((nNew(d), nRet(d), nRes(d), nChu(d))), s"day $d")
      assert(r.getAs[Long]("net_growth") ==
        r.getLong(1) + r.getLong(3) - r.getLong(4))
    }
    // the accounting identity: active(d) - active(d-1) == net_growth(d)
    val active = um.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.foreach { r =>
      val d = r.getLong(0)
      assert(active.getOrElse(d, 0L) - active.getOrElse(d - 1, 0L) ==
        r.getAs[Long]("net_growth"), s"identity at day $d")
    }
  }

  test("two-hop reach equals in-JVM BFS depth-2 on the support graph") {
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    def add(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
    edges.foreach { case (a, b) => add(a, b); add(b, a) }
    val got = Graphs.twoHop(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == adj.keySet.toSet)
    adj.foreach { case (v, n1) =>
      val reach = n1.flatMap(adj(_)) ++ n1 - v
      assert(got(v) == reach.size.toLong, s"node $v")
    }
  }

  test("fk inference: declared FKs contain fully, the control rejects") {
    val rows = DataQuality.fkInference(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 5)
    rows.foreach { case (name, r) =>
      val expectFk = !name.startsWith("orders.o_custkey->supplier")
      assert(r.getAs[Boolean]("is_fk") == expectFk, name)
    }
    val o = graft.tables.Tables.orders(spark, sf001)
    assert(rows("orders.o_custkey->customer.c_custkey")
      .getAs[Long]("n_child_distinct") ==
      o.select("o_custkey").distinct().count())
  }

  test("freshness: lags recompute from per-type maxima; verdict splits") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wm = ev.map(_._2).max
    val byType = ev.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).max, g.size.toLong)).toMap
    val got = DataQuality.freshness(spark, sf001).collect()
    assert(got.map(_.getString(0)).toSet == byType.keySet)
    got.foreach { r =>
      val (last, n) = byType(r.getString(0))
      assert(r.getAs[Long]("last_us") == last)
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("lag_minutes") == (wm - last) / 60000000L)
      assert(r.getAs[Boolean]("is_stale") == ((wm - last) / 60000000L >= 30))
    }
  }

  test("length sweep: kept counts recompute; curve is nonincreasing") {
    val lens = graft.tables.Tables.documents(spark, sf001)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(_.getLong(0))
    val sweep = TextStats.lengthSweep(spark, sf001).collect()
    assert(sweep.length == 6)
    var prevDocs = Long.MaxValue
    sweep.foreach { r =>
      val t = r.getAs[Long]("min_words")
      val kept = lens.filter(_ >= t)
      assert(r.getAs[Long]("docs_kept") == kept.length.toLong, s"T=$t")
      assert(r.getAs[Long]("tokens_kept") == kept.sum, s"T=$t tokens")
      assert(r.getAs[Long]("docs_kept") <= prevDocs)
      prevDocs = r.getAs[Long]("docs_kept")
    }
  }

  test("lang confusion: cells sum to the per-doc prediction relation") {
    val preds = TextStats.langIdNgram(spark, sf001)
      .select("declared_lang", "predicted_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = preds.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TextStats.langConfusion(spark, sf001).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum == preds.length.toLong)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n_docs") == expect(k), s"cell $k")
      assert(r.getAs[Boolean]("is_correct") == (k._1 == k._2))
    }
    // per-declared shares sum to 1
    got.groupBy(_.getString(0)).foreach { case (d, cells) =>
      val s = cells.map(_.getAs[Double]("declared_share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"shares for $d sum to $s")
    }
  }
}
