package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side laws for the round-9 kernel rewrites: the Gram-matrix
  * PCA pass, the sampled LSH-calibration histogram, and the
  * fixture-pin assertions the round-8 advice asked for.
  */
class Round9OpsSpec extends SparkSpec {

  test("gram-matrix pca equals an independent driver brute force") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def d6(x: Double): JBD =
      new JBD(java.lang.Double.toString(x)).setScale(6, RoundingMode.HALF_UP)
    val vecs = graft.tables.Tables.embeddings(spark, sf001)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val n = vecs.length
    val q = vecs.map(_.map(f => d6(f.toDouble)))
    val mu = (0 until dims).map { d =>
      val s = q.map(_(d)).reduce(_.add(_))
      d6(s.doubleValue() / n)
    }.toArray
    val xc = q.map(v => (0 until dims).map(d => v(d).subtract(mu(d))).toArray)
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      xc.map(r => r(i).multiply(r(j))).reduce(_.add(_))
        .setScale(6, RoundingMode.HALF_UP)
    }
    var v = Array.fill(dims)(new JBD(1).setScale(6))
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cov(i)(j).multiply(v(j))).reduce(_.add(_)))
      val mx = w.map(_.abs).max
      v = w.map(wj => d6(wj.doubleValue() / mx.doubleValue()))
    }
    val got = Similarity.embedPcaPower(spark, sf001).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    assert(got.size == dims)
    (0 until dims).foreach { d =>
      assert(got(d + 1) == v(d).doubleValue(),
        s"dim ${d + 1}: got ${got(d + 1)} expect ${v(d)}")
    }
  }

  test("sampled lsh calibration agrees with the full-histogram twin") {
    val full = TextDedup.lshCalibration(spark, sf001, sampleMod = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_high"), r.getAs[Long]("n_low"),
          r.getAs[Double]("recall_proxy"))).toMap
    val sampled = TextDedup.lshCalibration(spark, sf001, sampleMod = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_high"), r.getAs[Long]("n_low"),
          r.getAs[Double]("recall_proxy"))).toMap
    assert(full.keySet == sampled.keySet && full.size == 4)
    full.foreach { case (cfg, (nhF, nlF, rpF)) =>
      val (nhS, nlS, rpS) = sampled(cfg)
      // the estimated pair mass must bracket the truth within the
      // sampling noise a quarter-rate pair sample carries at this SF
      assert(nhS >= nhF / 3 && nhS <= nhF * 3,
        s"$cfg: n_high est $nhS vs full $nhF")
      assert(nlS <= (nlF + 1) * 4 && (nlS + 1) * 4 >= nlF,
        s"$cfg: n_low est $nlS vs full $nlF")
      // the S-curve recall prediction — the number the banding choice
      // actually reads — must be stable under sampling
      assert(math.abs(rpS - rpF) <= 0.05,
        s"$cfg: recall_proxy $rpS vs $rpF")
    }
  }

  test("posting-list bm25 equals the fixed-term form on the same query") {
    // same query, same k1/b: the posting form's pivoted fixed-order sum
    // must reproduce the fixed-term scores BIT-identically (both rank on
    // the raw double), so the two top-10s are the same rows
    val fixed = Search.bm25TopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val posting = Search.bm25Posting(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(posting.toSeq == fixed.toSeq)
  }

  test("forcast readability equals a driver brute force") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextStats.readability(spark, sf001).collect()
    assert(got.length == docs.size)
    got.take(50).foreach { r =>
      val ws = docs(r.getLong(0)).split(" ", -1)
      val mono = ws.count(w => w.split("[aeiou]+", -1).length == 2)
      assert(r.getLong(2) == ws.length.toLong)
      assert(r.getLong(3) == mono.toLong, s"doc ${r.getLong(0)}")
      val expect = math.rint(
        (20.0 - (mono.toDouble * 150.0 / ws.length) / 10.0) * 1e6) / 1e6
      assert(r.getDouble(4) == expect)
    }
  }

  test("heaps fit points are consistent and the curve is concave-ish") {
    val rows = LangModel.heapsFit(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= 8)
    // cumulative monotone, vocab never exceeds tokens
    rows.sliding(2).foreach {
      case Array((_, t1, v1, _, _), (_, t2, v2, _, _)) =>
        assert(t2 > t1 && v2 >= v1)
      case _ =>
    }
    rows.foreach { case (_, t, v, beta, _) =>
      assert(v <= t)
      // sub-linear vocabulary growth: beta < 1 always; the synthetic
      // fixture vocabulary is CLOSED (~40 types saturate in the first
      // decile), so beta legitimately lands at 0.0 here — the law is
      // sub-linearity, not a natural-corpus exponent
      assert(beta >= 0.0 && beta < 1.0, s"beta $beta")
    }
    // the final point covers the whole corpus token stream
    val totalToks = graft.tables.Tables.documents(spark, sf001)
      .selectExpr("size(filter(split(lower(text), '[^a-z]+'), t -> t <> ''))")
      .collect().map(_.getInt(0).toLong).sum
    assert(rows.last._2 == totalToks)
  }

  test("temperature mix flattens the language distribution") {
    val rows = TextStats.temperatureMix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(rows.length >= 2)
    // both columns are distributions (up to 6dp rounding per row)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // temperature contracts the spread: max/min ratio strictly shrinks
    val rawRatio = rows.map(_._2).max / rows.map(_._2).min
    val tempRatio = rows.map(_._3).max / rows.map(_._3).min
    assert(tempRatio < rawRatio)
    // the lowest-resource language gets the largest effective epochs
    assert(rows.minBy(_._2)._1 == rows.maxBy(_._4)._1)
  }

  test("fd discovery agrees with a driver brute force on the panel") {
    val nation = graft.tables.Tables.nation(spark, sf001)
      .select("n_nationkey", "n_regionkey", "n_name").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getString(2)))
    val holdExpect = nation.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1)
    val failCount = nation.groupBy(_._2)
      .count { case (_, vs) => vs.map(_._3).distinct.size > 1 }
    val got = DataQuality.fdDiscovery(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got("nation.n_nationkey->n_regionkey")._2 == holdExpect)
    assert(got("nation.n_regionkey->n_name")._1 == failCount.toLong)
    // the panel must carry signal in both directions
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("conductance reconciles with modularity's partition accounting") {
    val cond = Graphs.conductance(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    val mod = Graphs.modularity(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(cond.nonEmpty && cond.length == mod.size)
    val totalVol = cond.map(_._3).sum
    cond.foreach { case (c, _, vol, boundary, phi) =>
      val (intra, degSum) = mod(c)
      // volume = degree sum; boundary = volume − 2·intra (each internal
      // edge covers two incidences)
      assert(vol == degSum, s"community $c")
      assert(boundary == vol - 2 * intra, s"community $c")
      phi.foreach(p => assert(p >= 0.0 && p <= 1.0))
      // φ recomputed from the reconciled integers
      val denom = math.min(vol, totalVol - vol)
      if (denom > 0)
        assert(phi.contains(math.rint(boundary.toDouble / denom * 1e6) / 1e6))
    }
  }

  test("personalized pagerank conserves mass and concentrates on seeds") {
    val rows = Graphs.personalizedPagerank(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(rows.nonEmpty)
    rows.foreach { case (_, p) => assert(p > 0.0 && p <= 1.0) }
    // no dangling nodes in the symmetrized graph: each round preserves
    // total mass 1 exactly up to the per-node 6dp output rounding
    val total = rows.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-3, s"total $total")
    // every seed keeps at least its guaranteed teleport floor
    // (restart · 1/5 = 0.03; walk-return mass only adds to it) — on a
    // bipartite graph the single top node can legitimately be a hub
    // SUPPLIER adjacent to several seeds, so the law pins the floor,
    // not the argmax
    val byId = rows.toMap
    val seedIds = rows.map(_._1).filter(_ < 10000000L).sorted.take(5)
    seedIds.foreach { s =>
      assert(byId(s) >= 0.03 - 1e-6, s"seed $s mass ${byId(s)}")
    }
  }

  test("pca top2 extends the top component consistently") {
    val p1 = Similarity.embedPcaPower(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = Similarity.embedPcaTop2(spark, sf001).collect()
    assert(rows.length == p1.size)
    val l1 = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val l2 = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // loading1 IS the X181 axis (shared covariance + identical rounds)
    assert(l1 == p1)
    val h = rows.head
    val (la1, la2, e1, e2) = (h.getDouble(3), h.getDouble(4),
      h.getDouble(5), h.getDouble(6))
    assert(la1 >= la2 && la2 > 0.0, s"lambda order $la1 $la2")
    assert(e1 >= e2 && e2 > 0.0 && e1 + e2 <= 1.0 + 1e-9)
    // deflation quality: the two axes are near-orthogonal
    val dims = l1.keys.toSeq.sorted
    def dot(a: Map[Long, Double], b: Map[Long, Double]) =
      dims.map(d => a(d) * b(d)).sum
    val cos = dot(l1, l2) / math.sqrt(dot(l1, l1) * dot(l2, l2))
    assert(math.abs(cos) < 0.3, s"axes not orthogonal: cos=$cos")
  }

  test("drift summary reconciles with its per-dim rows") {
    val rows = Similarity.embedDrift(spark, sf001).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 64)
    val l2 = math.sqrt(rows.map(r => r._3 * r._3).sum)
    assert(math.abs(rows.head._4 - l2) < 1e-4)
    val cos = rows.map(r => r._1 * r._2).sum /
      (math.sqrt(rows.map(r => r._1 * r._1).sum) *
        math.sqrt(rows.map(r => r._2 * r._2).sum))
    assert(math.abs(rows.head._5 - cos) < 1e-4)
    rows.foreach(r => assert(math.abs(r._3 - (r._1 - r._2)) < 1e-9))
  }

  test("uniformity/alignment match a driver brute force") {
    def hb(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val vecs = graft.tables.Tables.embeddings(spark, sf001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var aa = 0.0; var bb = 0.0; var ab = 0.0; var i = 0
      while (i < a.length) { aa += a(i) * a(i); bb += b(i) * b(i)
        ab += a(i) * b(i); i += 1 }
      aa + bb - 2.0 * ab
    }
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val unifPairs = for {
      a <- vecs; b <- vecs
      if a._1 < b._1 && hb(a._1) % 256 == hb(b._1) % 256
    } yield d2(a._3, b._3)
    val alignPairs = for {
      a <- vecs; b <- vecs
      if a._1 < b._1 && a._2 == b._2 && hb(a._1) % 16 == hb(b._1) % 16
    } yield d2(a._3, b._3)
    val expUnif = math.rint(math.log(
      (unifPairs.map(d => r6(math.exp(-2.0 * d))).sum / unifPairs.length)
        .toDouble) * 1e6) / 1e6
    val expAlign = math.rint(
      (alignPairs.map(r6).sum / alignPairs.length).toDouble * 1e6) / 1e6
    val r = Similarity.embedUniformity(spark, sf001).collect()(0)
    assert(r.getLong(0) == alignPairs.length.toLong)
    assert(r.getLong(2) == unifPairs.length.toLong)
    assert(math.abs(r.getDouble(1) - expAlign) < 2e-6,
      s"alignment ${r.getDouble(1)} vs $expAlign")
    assert(math.abs(r.getDouble(3) - expUnif) < 2e-6,
      s"uniformity ${r.getDouble(3)} vs $expUnif")
  }

  test("quantization error audit is non-negative and bounded by the grid") {
    val st = graft.tables.Tables.embeddings(spark, sf001)
      .selectExpr("posexplode(embedding) as (d, v)")
      .groupBy("d").agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // the affine uint8 grid bounds every per-cell error by one step
    val maxStep = st.map { case (mn, mx) => (mx - mn) / 255.0 }.max
    val rows = Similarity.quantizationError(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= maxStep + 1e-9,
        s"label ${r.getLong(0)}: max err ${r.getDouble(3)} > step $maxStep")
      // micro-scaled MSE consistent with the max bound
      assert(r.getDouble(2) <= maxStep * maxStep * 1e6 + 1e-6)
    }
  }

  test("stupid backoff exercises every tier and stays a log-probability") {
    val rows = LangModel.stupidBackoff(spark, sf001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, t, b, u, avg) =>
      assert(n == t + b + u)
      // tri s <= 1, bi s <= 0.4, uni s < 1 -> every ln is negative
      assert(avg < 0.0, s"avg $avg")
    }
    // held-OUT scoring: the backoff tiers must actually fire
    assert(rows.map(_._2).sum > 0, "no trigram hits at all")
    assert(rows.map(_._3).sum > 0, "bi tier never fired")
    assert(rows.map(_._4).sum > 0, "uni tier never fired")
  }

  test("cluster quality audit is internally consistent") {
    val rows = TextDedup.clusterQuality(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val size = r.getLong(1)
      val np = r.getLong(2)
      assert(size >= 2, s"cluster ${r.getLong(0)} size $size")
      assert(np <= size * (size - 1) / 2)
      if (np > 0) {
        // verified pairs carry jaccard >= the 0.6 threshold
        assert(r.getDouble(3) >= 0.6 - 1e-9)
        assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0 + 1e-9)
      }
    }
  }

  test("event-type lift matches a driver brute force") {
    val ud = graft.tables.Tables.events(spark, sf001)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 as mi",
        "event_type")
      .distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
    val baskets = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size
    val singles = ud.groupBy(_._2).view.mapValues(_.length).toMap
    val pairCnt = baskets.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2))
      .groupBy(identity).view.mapValues(_.length).toMap
    val got = Events.typeLift(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val cab = pairCnt(Seq(ta, tb))
      assert(r.getLong(2) == cab.toLong)
      assert(r.getLong(3) == singles(ta).toLong)
      assert(r.getLong(4) == singles(tb).toLong)
      assert(r.getDouble(6) == math.rint(
        cab.toDouble * n / (singles(ta).toLong * singles(tb)) * 1e6) / 1e6)
    }
  }

  test("data vault hashes are collision-free on their business keys") {
    val rows = graft.ext.Warehouse.dataVaultAudit(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 4)
    // hub/link hashes must be 1:1 with their business keys
    Seq("hub_customer", "hub_order", "link_order_customer").foreach { a =>
      assert(rows(a)._1 == rows(a)._2, s"$a hash collision")
    }
    // satellite hashdiffs collapse identical attribute tuples
    val (satRows, satDistinct) = rows("sat_customer_hashdiff")
    assert(satDistinct <= satRows)
    val nCust = graft.tables.Tables.customer(spark, sf001).count()
    assert(rows("hub_customer")._1 == nCust)
  }

  test("pcm clipping audit matches the stated sample arithmetic") {
    val rows = Multimodal.pcmClippingQuery(spark, sf001).collect()
    assert(rows.length == 500)
    rows.take(40).foreach { r =>
      val d = r.getLong(0)
      val n = 160 * (2 + java.lang.Math.floorMod(d, 4)).toInt
      val samples = (0 until n).map(i =>
        math.abs(java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048))
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == samples.max.toLong)
      assert(r.getLong(3) == samples.count(_ >= 2040).toLong)
      assert(r.getLong(4) == samples.map(_.toLong).sum)
    }
  }

  test("money reconciliation covers every order exactly once") {
    val rows = DataQuality.moneyReconciliation(spark, sf001).collect()
    assert(rows.nonEmpty)
    val totalOrders = graft.tables.Tables.orders(spark, sf001).count()
    assert(rows.map(_.getLong(1)).sum == totalOrders)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1)) // reconciled <= orders
      assert(r.getDouble(4) >= 0.0)        // max |delta|
    }
  }

  test("dup rate by source reconciles with the exact-dup relation") {
    val expectedExact = TextDedup.exact(spark, sf001)
      .filter(col("n_copies") > 1)
      .agg(coalesce(sum("n_copies"), lit(0L))).collect()(0).getLong(0)
    val rows = TextDedup.dedupRateBySource(spark, sf001).collect()
    assert(rows.map(_.getLong(2)).sum == expectedExact)
    val nearMembers = TextDedup.nearDupClusters(spark, sf001).count()
    assert(rows.map(_.getLong(3)).sum == nearMembers)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
    }
  }

  test("ngram coverage is monotone and matches a brute-force count") {
    val tris = graft.tables.Tables.documents(spark, sf001)
      .select("text").collect()
      .flatMap { r =>
        val ws = r.getString(0).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSeq
        else Seq.empty
      }
    val counts = tris.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (g, c) => (-c, g) }
    val total = tris.length.toLong
    val rows = LangModel.ngramCoverage(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, effK, covered, t, cov, trunc) =>
      assert(t == total)
      assert(effK == math.min(k, counts.length.toLong))
      assert(trunc == (effK < k))
      assert(covered == counts.take(effK.toInt).map(_._2.toLong).sum)
      assert(cov == math.rint(covered.toDouble / total * 1e6) / 1e6)
    }
    assert(rows.sortBy(_._1).map(_._5).toSeq ==
      rows.map(_._5).sorted.toSeq) // monotone in k
    // truncation law (r9 advice): a budget past the type count still
    // emits its row, pinned to the last available rank with the flag set
    val big = LangModel.ngramCoverage(spark, sf001,
        ks = Seq(10, counts.length * 10)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(big.length == 2)
    val over = big.maxBy(_._1)
    assert(over._1 == counts.length.toLong * 10)
    assert(over._2 == counts.length.toLong, "eff_k pins to the type count")
    assert(over._6, "the over-budget row is flagged truncated")
    assert(over._5 == 1.0, "coverage at the full type set is 1.0")
  }

  test("multiprobe sweep is monotone in the probe budget") {
    val rows = Similarity.multiprobeSweep(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 9L))
    rows.sliding(2).foreach {
      case Array((_, c1, h1, r1), (_, c2, h2, r2)) =>
        // prefix probe sets: candidates, hits and recall never shrink
        assert(c2 >= c1 && h2 >= h1 && r2 >= r1)
      case _ =>
    }
    rows.foreach { case (_, c, h, r) =>
      assert(h <= 10 && r <= 1.0 && c >= h)
    }
  }

  test("image entropy matches the pixel-formula brute force") {
    val nChars = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Multimodal.imageEntropy(spark, sf001).collect()
    assert(rows.length == nChars.size)
    rows.take(30).foreach { r =>
      val d = r.getLong(0)
      val w = (8 + java.lang.Math.floorMod(d, 9)).toInt
      val h = (8 + java.lang.Math.floorMod(nChars(d), 9)).toInt
      val bins = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w)
        bins(java.lang.Math.floorMod(d * 31 + x * 7 + y * 13, 256).toInt / 16) += 1
      val n = w.toLong * h
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == bins.count(_ > 0).toLong)
      val st = bins.filter(_ > 0).map(c =>
        BigDecimal(c * math.log(c.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val expect = math.rint(
        (math.log(n.toDouble) - st.toDouble / n) * 1e6) / 1e6
      assert(r.getDouble(3) == expect, s"doc $d")
    }
  }

  test("repeat revenue reconciles with the order headers") {
    val rows = Analytics.repeatRevenue(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val totalOrders = graft.tables.Tables.orders(spark, sf001).count()
    assert(rows.map(t => t._2 + t._3).sum == totalOrders)
    val totalRev = graft.tables.Tables.orders(spark, sf001)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .collect()(0).getDecimal(0).doubleValue
    val got = rows.map(t => t._4 + t._5).sum
    assert(math.abs(got - totalRev) < 1e-4, s"$got vs $totalRev")
    // the first month can only contain first-ever orders
    assert(rows.minBy(_._1)._3 == 0L)
  }

  test("markov channel literals match the fixture event-type domain") {
    // markovAttribution pins Seq("none","click","error","signup","view")
    // and treats "purchase" as the absorbing conversion; if the fixture
    // generator ever changes its event-type domain these literals must
    // fail loudly here rather than silently skew the attribution
    val types = graft.tables.Tables.events(spark, sf001)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("click", "error", "signup", "view", "purchase"),
      s"fixture event types drifted: $types")
  }

  test("markov steady start is the uniform distribution over the types") {
    val r0 = Events.markovSteady(spark, sf001).filter(col("round_idx") === 0)
      .collect().map(_.getDouble(2))
    assert(r0.nonEmpty)
    val k = r0.length
    // HALF_UP to match the engine's round(1.0/K, 6) — math.rint is
    // half-even and would diverge spuriously on a 6dp tie (r9 advice)
    val expect = new java.math.BigDecimal(java.lang.Double.toString(1.0 / k))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    r0.foreach(p => assert(p == expect))
  }
}
