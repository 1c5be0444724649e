package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-9 operators
  * (X200–X203).
  */
class Round8iOpsSpec extends SparkSpec {

  private def q6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("k-truss equals an in-JVM two-round peel") {
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    var edges = pairCounts.filter(_._2 >= 2).keys.toSet
    var support = Map.empty[(Long, Long), Long]
    for (_ <- 1 to 2) {
      val byA = edges.groupBy(_._1).map { case (a, g) =>
        a -> g.map(_._2).toArray.sorted }
      val tris = edges.toSeq.flatMap { case (a, b) =>
        (byA.getOrElse(a, Array.empty[Long]).filter(_ > b))
          .filter(c => edges.contains((b, c))).map(c => (a, b, c))
      }
      support = tris.flatMap { case (a, b, c) =>
        Seq((a, b), (a, c), (b, c)) }
        .groupBy(identity).map { case (e, g) => e -> g.size.toLong }
        .filter(_._2 >= 1)
      edges = support.keySet
    }
    val got = Graphs.ktruss(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == support, s"got=${got.size} expect=${support.size}")
  }

  test("binary quantization equals an in-JVM popcount scan") {
    val vecs = graft.tables.Tables.embeddings(spark, sf001).collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray
    }.toMap
    def pack(v: Array[Float], lo: Int): Long =
      (0 until 32).map(i => if (v(lo + i) >= 0) 1L << i else 0L).sum
    val (qlo, qhi) = (pack(vecs(0L), 0), pack(vecs(0L), 32))
    val expect = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val h = java.lang.Long.bitCount(pack(v, 0) ^ qlo) +
        java.lang.Long.bitCount(pack(v, 32) ^ qhi)
      (h.toLong, id)
    }.sorted.take(10)
    val got = Similarity.binaryQuantTopK(spark, sf001).collect()
      .map(r => (r.getLong(1), r.getLong(0)))
    assert(got.toSeq == expect)
    // the codec is a real (if lossy) ranker: its top-10 must overlap
    // the exact cosine top-10 at all on this fixture
    val exact = Similarity.cosineTopK(spark, sf001, k = 10).collect()
      .map(_.getLong(0)).toSet
    val overlap = got.map(_._2).count(exact.contains)
    info(s"binary-vs-exact top-10 overlap: $overlap/10")
    assert(overlap >= 1)
  }

  test("soft-dedup weights: per-cluster mass ~1 and membership matches") {
    val rows = TextDedup.softDedupWeights(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val n = graft.tables.Tables.documents(spark, sf001).count()
    assert(rows.length == n.toInt, "one weight per document")
    rows.groupBy(_._2).foreach { case (cl, g) =>
      val k = g.head._3
      assert(g.size.toLong == k, s"cluster $cl size column")
      g.foreach(r => assert(r._4 == q6(1.0 / k).toDouble))
      val mass = g.map(r => BigDecimal(r._4)).sum
      assert((mass - 1).abs <= BigDecimal(k) * BigDecimal("0.000001"), cl)
    }
    val labels = TextDedup.nearDupClusters(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (doc, cl, _, _) =>
      assert(cl == labels.getOrElse(doc, doc), s"doc $doc")
    }
  }

  test("markov attribution replays the exact decimal value iteration") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // journeys: order by (us, event_id), truncate at first purchase
    val trans = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, g) =>
      val s = g.sortBy(e => (e._2, e._3)).map(_._4)
      val cut = s.indexOf("purchase") match {
        case -1 => s.map(identity) :+ "null"
        case i => s.take(i).map(identity) :+ "conv"
      }
      ("start" +: cut.toSeq).sliding(2).foreach { p =>
        if (p.length == 2) trans((p(0), p(1))) = trans((p(0), p(1))) + 1
      }
    }
    val totals = trans.groupBy(_._1._1).map { case (s, g) => s -> g.values.sum }
    val tm = trans.map { case ((s, t), c) =>
      (s, t) -> q6(c.toDouble / totals(s)) }.toMap
    val states = totals.keys.toSeq
    def run(removed: String): (BigDecimal, BigDecimal) = {
      var p = states.map(_ -> BigDecimal(0)).toMap
      var pn = states.map(_ -> BigDecimal(0)).toMap
      for (_ <- 1 to 4) {
        val p2 = states.map { s =>
          s -> (if (s == removed) BigDecimal(0)
          else tm.getOrElse((s, "conv"), BigDecimal(0)) +
            states.map(t => q6((tm.getOrElse((s, t), BigDecimal(0)) *
              p(t)).toDouble)).sum)
        }.toMap
        val pn2 = states.map { s =>
          s -> (if (s == removed) BigDecimal(0)
          else tm.getOrElse((s, "null"), BigDecimal(0)) +
            states.map(t => q6((tm.getOrElse((s, t), BigDecimal(0)) *
              pn(t)).toDouble)).sum)
        }.toMap
        p = p2; pn = pn2
      }
      (p("start"), pn("start"))
    }
    val (base, baseNull) = run("none")
    val got = Events.markovAttribution(spark, sf001).collect()
    assert(got.length == 4)
    val effSum = got.map(r => BigDecimal(r.getAs[Double]("removal_effect"))).sum
    got.foreach { r =>
      val ch = r.getString(0)
      val (pRem, pnRem) = run(ch)
      assert(r.getAs[Double]("p_base") == base.toDouble, ch)
      assert(r.getAs[Double]("p_removed") == pRem.toDouble, ch)
      val eff = r.getAs[Double]("removal_effect")
      assert(eff >= 0, s"$ch removal cannot raise conversion")
      assert(r.getAs[Double]("attribution") ==
        q6(eff / effSum.toDouble).toDouble, ch)
      // the truncation residual is the EXACT unabsorbed mass and must
      // stay a (small) probability: 0 <= unresolved < 1
      val ub = r.getAs[Double]("unresolved_base")
      val ur = r.getAs[Double]("unresolved_removed")
      assert(ub == (BigDecimal(1) - base - baseNull).toDouble, ch)
      assert(ur == (BigDecimal(1) - pRem - pnRem).toDouble, ch)
      assert(ub >= 0 && ub < 1 && ur >= 0 && ur <= 1, ch)
    }
  }
}
