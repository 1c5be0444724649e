package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 operators — each new
  * entry is checked against an independent in-JVM recomputation (or an
  * algebraic invariant the SQL twin can't state), the same discipline as
  * the Round6/7 suites.
  */
class Round8OpsSpec extends SparkSpec {

  test("survival KM: monotone nonincreasing, in [0,1], exhaustion pins S=0") {
    val rows = Analytics.survivalKm(spark, sf001).collect()
    assert(rows.nonEmpty)
    var prev = 1.0
    rows.foreach { r =>
      val s = r.getAs[Double]("survival")
      assert(s >= 0.0 && s <= 1.0, s"survival out of range: $r")
      assert(s <= prev + 1e-12, s"survival increased: $r")
      prev = s
      // the ADVICE-item guard: a day where everyone at risk dies must
      // report S = 0 exactly, never a NULL-dropped log term
      if (r.getAs[Long]("n_deaths") == r.getAs[Long]("n_risk"))
        assert(s == 0.0, s"exhausting day must pin survival to 0: $r")
    }
  }

  test("phash banding is lossless at maxHam = 2 (vs in-JVM brute force)") {
    val hashes = Multimodal.pngAHashes(spark, sf001).collect()
      .map(h => (h.doc_id, h.ahash)).sortBy(_._1)
    val brute = (for {
      i <- hashes.indices.iterator
      j <- (i + 1) until hashes.length
      d = java.lang.Long.bitCount(hashes(i)._2 ^ hashes(j)._2)
      if d <= 2
    } yield (hashes(i)._1, hashes(j)._1, d)).toSet
    val banded = Multimodal.phashPairs(spark, sf001, maxHam = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size}")
    // and the default still matches its quadratic subset
    val b1 = Multimodal.phashPairs(spark, sf001, maxHam = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1 == brute.filter(_._3 <= 1).map(t => (t._1, t._2)))
  }

  test("jpeg round trip: every payload within 8 counts, dims exact") {
    val rows = Multimodal.jpegRoundTrip(spark, sf001, tol = 8).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.within_tol, s"jpeg loss exceeded 8 counts for doc ${r.doc_id}")
      assert(r.width == 8 + java.lang.Math.floorMod(r.doc_id, 9))
      assert(r.n_px == r.width * r.height)
    }
  }

  test("pcm features equal an independent in-JVM recomputation") {
    val got = Multimodal.pcmFeatures(spark, sf001).collect()
      .map(f => ((f.doc_id, f.frame_idx), (f.energy, f.zero_crossings)))
      .toMap
    val docIds = got.keys.map(_._1).toSet
    assert(docIds.size == 500)
    docIds.take(50).foreach { d =>
      val nFrames = (2 + java.lang.Math.floorMod(d, 4)).toInt
      val samples = Array.tabulate(160 * nFrames)(i =>
        (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048).toInt)
      (0 until nFrames).foreach { f =>
        val fr = samples.slice(f * 160, (f + 1) * 160)
        val e = fr.map(v => java.lang.Math.abs(v).toLong).sum
        val zc = fr.sliding(2).count(p => p(0).toLong * p(1) < 0)
        assert(got((d, f.toLong)) == ((e, zc.toLong)),
          s"doc $d frame $f: got ${got((d, f.toLong))} expected ($e, $zc)")
      }
    }
  }

  test("trigram perplexity equals an independent in-JVM model") {
    import spark.implicits._
    val texts = graft.tables.Tables.documents(spark, sf001)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    val toks = texts.map { case (id, t) =>
      id -> t.split("[^a-z]+").filter(_.nonEmpty).toSeq }.toMap
    def grams(n: Int) = toks.values.flatMap(_.sliding(n).filter(_.size == n))
      .groupBy(identity).map { case (g, o) => (g, o.size.toLong) }
    val c3 = grams(3)
    val c2 = grams(2)
    val c2ctx = c3.groupBy(_._1.take(2)).map { case (k, m) => (k, m.values.sum) }
    val c1ctx = c2.groupBy(_._1.take(1)).map { case (k, m) => (k, m.values.sum) }
    val c1 = toks.values.flatten.groupBy(identity)
      .map { case (w, o) => (w, o.size.toLong) }
    val bigN = c1.values.sum
    val v = c1.size.toLong
    val expected = toks.flatMap { case (id, ws) =>
      if (ws.size < 3) None else {
        val tris = ws.sliding(3).filter(_.size == 3).toSeq
        val bitsSum = tris.map { g =>
          val p = 0.5 * (c3(g).toDouble / c2ctx(g.take(2))) +
            0.3 * (c2(g.slice(1, 3)).toDouble / c1ctx(Seq(g(1)))) +
            0.2 * ((c1(g(2)) + 1).toDouble / (bigN + v))
          BigDecimal(math.log(p) / math.log(2.0))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        Some(id -> (-bitsSum.toDouble / tris.size))
      }
    }
    val got = LangModel.perplexity3(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("bits_per_token"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, b) =>
      assert(math.abs(got(id) - b) < 1e-6, s"doc $id: ${got(id)} vs $b")
    }
  }

  test("scd2: timeline partitioned per key; current rows equal the CDC snapshot") {
    val rows = Warehouse.scd2BuildQuery(spark, sf001).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("valid_from"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // versions never overlap: each closes at or before the next open
          assert(a.getAs[Long]("valid_to") <= b.getAs[Long]("valid_from"))
        case _ =>
      }
      assert(vs.count(_.getAs[Boolean]("is_current")) <= 1)
      vs.filter(!_.isNullAt(vs.head.fieldIndex("valid_to"))).foreach { r =>
        assert(r.getAs[Long]("valid_from") < r.getAs[Long]("valid_to"))
      }
    }
    val current = rows.filter(_.getAs[Boolean]("is_current"))
      .map(r => (r.getLong(0), (r.getAs[Long]("val"), r.getString(2)))).toMap
    val snap = Warehouse.cdcApplyQuery(spark, sf001).collect()
      .map(r => (r.getLong(0), (r.getAs[Long]("val"), r.getString(2)))).toMap
    assert(current == snap,
      "SCD2 current rows must reconstruct the CDC snapshot exactly")
  }

  test("id gaps: equals in-JVM adjacency and is partition-count invariant") {
    import spark.implicits._
    val keys = graft.tables.Tables.lineitem(spark, sf001)
      .select($"l_orderkey").distinct().as[Long].collect().sorted
    val brute = keys.sliding(2).collect {
      case Array(a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.toSeq
    assert(brute.nonEmpty, "fixture must have FK-domain holes")
    def got(parts: Int) = DataQuality.idGaps(spark, sf001, parts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got(32) == brute)
    assert(got(1) == brute, "partition count must not change the gaps")
    assert(got(7) == brute)
  }

  test("gini equals the textbook formula on collected revenues") {
    val revs = graft.tables.Tables.orders(spark, sf001)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => (r.getDecimal(1), r.getLong(0)))
      .sortBy { case (rv, ck) => (BigDecimal(rv), ck) }
    val n = revs.length.toLong
    val total = revs.map(r => BigDecimal(r._1)).sum
    val sIrev = revs.zipWithIndex
      .map { case ((rv, _), i) => BigDecimal(rv) * (i + 1) }.sum
    val gini = (2 * sIrev.toDouble - (n + 1).toDouble * total.toDouble) /
      (n.toDouble * total.toDouble)
    val row = Analytics.giniRevenue(spark, sf001).collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(math.abs(row.getAs[Double]("gini") - gini) < 1e-6)
    assert(row.getAs[Double]("gini") > 0 && row.getAs[Double]("gini") < 1)
  }

  test("lexical complexity matches a per-doc regex recount") {
    val got = TextStats.lexicalComplexity(spark, sf001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    import spark.implicits._
    graft.tables.Tables.documents(spark, sf001)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .take(60).foreach { case (id, t) =>
        val ws = t.split("[^a-z]+").filter(_.nonEmpty)
        def syl(w: String) = "[aeiou]+".r.findAllIn(w).size.toLong
        val exp = (ws.length.toLong, ws.map(syl).sum, ws.count(syl(_) >= 3).toLong)
        assert(got(id) == exp, s"doc $id: ${got(id)} vs $exp")
      }
  }

  test("split leakage: pair mass conserved, folds in range") {
    val rows = TextStats.splitLeakage(spark, sf001).collect()
    val totalPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    val pairCount = TextDedup.jaccardPairs(spark, sf001).count()
    assert(totalPairs == pairCount, "every near-dup pair lands in one cell")
    assert(pairCount > 0, "fixture must have near-dup pairs to audit")
    rows.foreach { r =>
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      assert(lo >= 0 && hi < 3 && lo <= hi)
      assert(r.getAs[Boolean]("is_leak") == (lo != hi))
    }
  }

  test("seasonality: shares sum to 1 per dow, one peak per dow, mass conserved") {
    val rows = Events.seasonality(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      graft.tables.Tables.events(spark, sf001).count())
    rows.groupBy(_.getLong(0)).foreach { case (dow, cells) =>
      assert(dow >= 1 && dow <= 7)
      assert(cells.count(_.getAs[Boolean]("is_dow_peak")) == 1)
      val share = cells.map(_.getAs[Double]("dow_share")).sum
      assert(math.abs(share - 1.0) < 1e-3, s"dow $dow shares sum to $share")
    }
  }
}
