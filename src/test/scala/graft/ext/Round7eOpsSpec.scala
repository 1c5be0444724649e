package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the fifth round-7 batch: fertility against the per-doc
  * encode totals, the bot screen against driver-side exact moments, the
  * threshold sweep against its own pair relation, and the ListState
  * leaderboard against the batch rank window.
  */
class Round7eOpsSpec extends SparkSpec {

  test("bpe fertility: per-lang totals equal the per-doc encode sums") {
    val fert = LangModel.bpeFertility(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val perDoc = LangModel.bpeEncode(spark, sf001)
      .join(graft.tables.Tables.documents(spark, sf001)
        .select("doc_id", "lang"), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens")))
    val expected = perDoc.groupBy(_._1).map { case (l, xs) =>
      l -> ((xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum))
    }
    for ((lang, (nd, nw, nbpe, f)) <- fert) {
      val (ed, ew, ebpe) = expected(lang)
      assert((nd, nw, nbpe) == ((ed, ew, ebpe)), lang)
      assert(f == BigDecimal(nbpe.toDouble / nw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(f > 1.0, "BPE over char-wrapped words always has fertility > 1")
    }
    assert(fert.keySet == expected.keySet)
  }

  test("bot regularity: cv equals driver-side exact moments") {
    val got = Events.botRegularity(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))).toMap
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1).map { case (u, xs) =>
      val sorted = xs.sortBy(e => (e._2, e._3)).map(_._2)
      u -> sorted.sliding(2).collect { case Array(a, b) => b - a }.toVector
    }
    for ((u, (n, mean, cv, bot)) <- got) {
      val gaps = byUser(u)
      assert(n == gaps.length)
      val sg = gaps.map(BigInt(_)).sum
      val sg2 = gaps.map(g => BigInt(g) * BigInt(g)).sum
      assert(mean == (sg / n).toLong)
      val a = BigInt(n) * sg2 - sg * sg
      val expCv = BigDecimal(
        math.sqrt(a.toDouble) / sg.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cv == expCv, s"user $u")
      assert(bot == (cv < 0.5))
    }
    assert(got.nonEmpty)
  }

  test("threshold sweep: consistent with the pair relation, monotone") {
    val sweep = Similarity.dedupThresholdSweep(spark, sf001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val pairs = Similarity.embedCosinePairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for ((t, np, ndocs) <- sweep) {
      val surviving = pairs.filter(_._3 >= t)
      assert(np == surviving.length, s"t=$t")
      assert(ndocs ==
        surviving.flatMap(p => Seq(p._1, p._2)).distinct.length, s"t=$t")
    }
    val counts = sweep.sortBy(_._1).map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "pair counts must not increase with the cutoff")
    assert(sweep.length == 5)
  }

  test("survival km: equals a literal censoring-aware estimator") {
    val got = Analytics.survivalKm(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val pc = graft.tables.Tables.orders(spark, sf001)
      .groupBy("o_custkey")
      .agg(min(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")).as("f"),
        max(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")).as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val maxDay = pc.map(_._2).max
    val lts = pc.map { case (f, l) => (l - f, l > maxDay - 90) }
    val hist = lts.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(!_._2).toLong, xs.count(_._2).toLong) }
    var atRiskLeft = lts.length.toLong
    var logSurv = 0.0
    val expected = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, Long, Double)]
    for ((t, d, c) <- hist) {
      val nRisk = atRiskLeft
      if (d > 0) {
        logSurv += math.log(1.0 - d.toDouble / nRisk)
        expected += ((t, nRisk, d, c,
          BigDecimal(math.exp(logSurv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      atRiskLeft -= (d + c)
    }
    assert(got.toSeq == expected.toSeq)
    // KM sanity: survival is non-increasing and starts below 1
    val s = got.map(_._5)
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
    assert(got.nonEmpty && s.head < 1.0)
  }

  test("modularity: terms recompute from collected edges and labels") {
    val got = Graphs.modularity(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val labels = Graphs.labelProp(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
    val m = edges.length
    for ((c, (nNodes, intra, degSum, q)) <- got) {
      assert(nNodes == labels.values.count(_ == c))
      val exIntra = edges.count { case (a, b) =>
        labels(a) == c && labels(b) == c }
      val exDeg = edges.map { case (a, b) =>
        (if (labels(a) == c) 1 else 0) + (if (labels(b) == c) 1 else 0)
      }.sum
      assert((intra, degSum) == ((exIntra.toLong, exDeg.toLong)), s"community $c")
      val exQ = BigDecimal(exIntra.toDouble / m -
        math.pow(exDeg.toDouble / (2 * m), 2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(q == exQ)
    }
    assert(got.nonEmpty)
  }

  test("recall curve: matches a literal exact-vs-bucket ranking") {
    val got = Similarity.recallCurve(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val emb = graft.tables.Tables.embeddings(spark, sf001)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (ab, aa, bb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i) }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    def bucket(v: Array[Double]): String =
      (0 until 8).map(i => if (v(i) >= 0) '1' else '0').mkString
    for (q <- emb.filter(_._1 < 8)) {
      val others = emb.filter(_._1 != q._1)
      val ranked = others.map(o => (o._1, cos(o._2, q._2)))
        .sortBy { case (id, c) => (-c, id) }
      val exact20 = ranked.take(20).map(_._1).toSet
      val inBucket = others.filter(o => bucket(o._2) == bucket(q._2))
        .map(o => (o._1, cos(o._2, q._2))).sortBy { case (id, c) => (-c, id) }
      for (k <- Seq(1, 5, 10, 20)) {
        val exactK = ranked.take(k).map(_._1).toSet
        val lshK = inBucket.take(k).map(_._1).toSet
        val n = (exactK & lshK).size.toLong
        val (gn, gr) = got((q._1, k))
        assert(gn == n, s"q=${q._1} k=$k")
        assert(gr == BigDecimal(n.toDouble / k)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    assert(got.size == 32)
  }

  test("stream topk: ListState leaderboard equals the batch rank window") {
    val got = graft.streaming.EventStream.streamTopK(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    val ev = graft.tables.Tables.events(spark, sf001)
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      xs.sortBy(e => (-e._2, e._3)).take(3).zipWithIndex
        .map { case ((_, v, id), i) => (t, i + 1, v, id) }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == expected)
  }
}
