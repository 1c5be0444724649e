package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-6 operators
  * (X185–X189).
  */
class Round8fOpsSpec extends SparkSpec {

  private def q6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def r6d(b: BigDecimal): BigDecimal =
    b.setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("kmeans equals an in-JVM exact-decimal Lloyd replay") {
    val vecs = graft.tables.Tables.embeddings(spark, sf001).collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(v => q6(v.toDouble)).toArray
    }.toMap
    val dims = vecs.head._2.length
    val seeds = vecs.keys.toSeq
      .sortBy(id => (md5hex(id.toString), id)).take(4).zipWithIndex
      .map { case (id, i) => i.toLong -> vecs(id) }.toMap
    def assign(cent: Map[Long, Array[BigDecimal]]) =
      vecs.map { case (id, v) =>
        val best = cent.toSeq.map { case (cell, c) =>
          // per-term 6dp quantization BEFORE the sum (the impl's rule)
          val d2 = v.indices.map(i => r6d((v(i) - c(i)) * (v(i) - c(i)))).sum
          (d2, cell)
        }.min
        id -> best
      }
    var cent = seeds
    for (_ <- 1 to 3) {
      val asg = assign(cent)
      cent = asg.groupBy(_._2._2).map { case (cell, g) =>
        val members = g.keys.toSeq
        cell -> Array.tabulate(dims) { d =>
          q6(members.map(id => vecs(id)(d)).sum.toDouble / members.size)
        }
      }
    }
    val fin = assign(cent)
    val expect = cent.flatMap { case (cell, c) =>
      val members = fin.filter(_._2._2 == cell)
      val inertia = q6(members.values.map(_._1).sum.toDouble).toDouble
      c.indices.map(d =>
        (cell, d + 1L, c(d).toDouble, members.size.toLong, inertia))
    }.toSet
    val got = Similarity.embedKmeans(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
  }

  test("random walks replay the hash-deterministic trajectory edge by edge") {
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val edges = pairCounts.filter(_._2 >= 2).keys.toSeq
    val adj: Map[Long, Array[Long]] =
      edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted.toArray }
    def step(start: Long, t: Int, node: Long): Long = {
      val ns = adj(node)
      val h = java.lang.Long.parseLong(
        md5hex(s"${start}_${t}_${node}").substring(0, 8), 16)
      ns((h % ns.length).toInt)
    }
    val expect = adj.keys.flatMap { start =>
      var cur = start
      (start, 0L, start) +: (1 to 3).map { t =>
        cur = step(start, t, cur)
        (start, t.toLong, cur)
      }
    }.toSet
    val got = Graphs.randomWalks(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
  }

  test("kneser-ney distributions sum to one over the continuation vocabulary") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(_.getString(1).split("[^a-z]+").filter(_.nonEmpty))
    val bigrams = docs.flatMap(ws => ws.dropRight(1).zip(ws.drop(1)))
    val cb = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cctx = cb.groupBy(_._1._1).map { case (a, g) => a -> g.values.sum }
    val n1fwd = cb.groupBy(_._1._1).map { case (a, g) => a -> g.size.toLong }
    val n1prec = cb.groupBy(_._1._2).map { case (b, g) => b -> g.size.toLong }
    val btypes = cb.size.toLong
    // the analytic identity that distinguishes KN from an ad-hoc mixture:
    // discounted seen mass + redistributed continuation mass is EXACTLY
    // one for every context — a wrong denominator breaks it immediately
    val contVocab = n1prec.keys.toArray
    cctx.keys.take(30).foreach { a =>
      val total = contVocab.map { w =>
        val seen = cb.getOrElse((a, w), 0L)
        val disc = if (seen > 0) (seen - 0.75) / cctx(a) else 0.0
        disc + 0.75 * n1fwd(a) / cctx(a) * (n1prec(w).toDouble / btypes)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context '$a': $total")
    }
    val got = LangModel.kneserNey(spark, sf001).collect()
    assert(got.length == docs.count(_.length >= 2))
    got.foreach(r => assert(r.getAs[Long]("n_bigrams") > 0))
  }

  test("funnel timing percentiles equal a brute-force lag recomputation") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t1 = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val t2 = ev.filter(e => e._2 == "click" && t1.contains(e._1) &&
        e._3 > t1(e._1)).groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val t3 = ev.filter(e => e._2 == "purchase" && t2.contains(e._1) &&
        e._3 > t2(e._1)).groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val got = Events.funnelTiming(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    def check(name: String, lagsByUser: Map[Long, Long]): Unit = {
      val sorted = lagsByUser.toSeq.map { case (u, l) => (l, u) }.sorted
      val n = sorted.length
      val r = got(name)
      assert(r.getAs[Long]("n_users") == n.toLong, name)
      assert(r.getAs[Long]("min_us") == sorted.head._1, name)
      assert(r.getAs[Long]("p50_us") ==
        sorted(math.ceil(0.5 * n).toInt - 1)._1, name)
      assert(r.getAs[Long]("p90_us") ==
        sorted(math.ceil(0.9 * n).toInt - 1)._1, name)
      assert(r.getAs[Long]("max_us") == sorted.last._1, name)
      assert(r.getAs[Double]("mean_us") == math.rint(
        sorted.map(_._1).sum.toDouble / n * 1e6) / 1e6, name)
    }
    check("1_view_to_click", t2.map { case (u, t) => u -> (t - t1(u)) })
    check("2_click_to_purchase", t3.map { case (u, t) => u -> (t - t2(u)) })
  }

  test("pcm resample preserves frame count and replays the integer filter") {
    val feats = Multimodal.pcmFeatures(spark, sf001).toDF().collect()
      .map(r => r.getLong(0)).groupBy(identity).map { case (d, g) => d -> g.size }
    val res = Multimodal.pcmResample(spark, sf001).toDF().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // frame count preserved at the halved rate (80-sample frames)
    val byDoc = res.groupBy(_._1).map { case (d, g) => d -> g.size }
    assert(byDoc == feats)
    res.foreach(r => assert(r._3 == 80L))
    // full integer replay: synth, halfband filter, frame features
    val expect = feats.keys.flatMap { d =>
      val nFrames = (2 + java.lang.Math.floorMod(d, 4)).toInt
      val n = 160 * nFrames
      val x = Array.tabulate(n)(i =>
        (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048).toInt)
      val y = Array.tabulate(n / 2) { j =>
        val xl = if (j == 0) x(0) else x(2 * j - 1)
        (xl + 2 * x(2 * j) + x(2 * j + 1) + 8192) / 4 - 2048
      }
      (0 until nFrames).map { f =>
        val fr = y.slice(f * 80, f * 80 + 80)
        val zc = fr.sliding(2).count(p => p(0).toLong * p(1) < 0)
        (d, f.toLong, 80L, fr.map(v => math.abs(v).toLong).sum, zc.toLong)
      }
    }.toSet
    assert(res.toSet == expect)
  }
}
