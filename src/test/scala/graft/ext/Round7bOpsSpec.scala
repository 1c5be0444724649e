package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the second round-7 operator batch, each checked against a
  * driver-side brute force on the tiny fixture (sf0.001) — independent
  * re-derivations, not replays of the Spark plan: SSSP against naive
  * Bellman-Ford over collected edges, cross-doc span dedup against a
  * recomputed cover set, PQ against per-cell argmin + table re-adds,
  * the sliding HLL against recomputed registers, the decayed
  * leaderboard against exact shifted-integer sums, the column profile
  * against collected-table counting, and golden-record survivorship
  * against recomputed modal rules.
  */
class Round7bOpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sssp: matches naive Bellman-Ford after the same round count") {
    val rows = Graphs.sssp(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: rebuild the weighted symmetric edge list
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = graft.tables.Tables.orders(spark, sf001)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val counts = li.flatMap { case (ok, sk) =>
      ord.get(ok).map(ck => (ck, sk + 10000000L))
    }.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val edges = counts.toSeq.flatMap { case ((c, s), n) =>
      val w = 8L - math.min(n, 7L)
      Seq((c, s, w), (s, c, w))
    }
    val source = edges.map(_._1).min
    var dist = Map(source -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = edges.flatMap { case (u, v, w) =>
        dist.get(u).map(d => (v, d + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, ds) => (k, ds.map(_._2).min) }
    }
    assert(rows == dist, "frontier SSSP must equal naive Bellman-Ford")
    assert(rows(source) == 0L)
  }

  test("cross-doc spans: cover set recomputed from min-doc_id owners") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Seq[(Int, String)] = {
      val w = t.split(" ")
      (1 to w.length - 7).map(i => (i, w.slice(i - 1, i + 7).mkString(" ")))
    }
    val owner = docs.flatMap { case (id, t) => grams(t).map(g => (g._2, id)) }
      .groupBy(_._1).map { case (sh, occ) => (sh, occ.map(_._2).min) }
    val expected = docs.flatMap { case (id, t) =>
      val w = t.split(" ")
      val covered = grams(t).withFilter { case (_, sh) => owner(sh) < id }
        .flatMap { case (i, _) => i until (i + 8) }.toSet
      if (covered.isEmpty) None
      else {
        val keptWords = (1 to w.length).filterNot(covered).map(p => w(p - 1))
        Some((id, covered.size.toLong, keptWords.length.toLong,
          keptWords.mkString(" ")))
      }
    }.sortBy(_._1).toSeq
    val rows = TextDedup.crossDocSpans(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(rows.nonEmpty, "fixture must contain cross-doc shared 8-grams")
    assert(rows == expected)
  }

  test("pq: assignments are per-subspace argmins, ADC re-adds the table") {
    val vecs = graft.tables.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val byId = vecs.toMap
    val seeds = vecs.map(_._1).sortBy(id => (md5hex(id.toString), id))
      .take(8)
    def sub(v: Array[Double], m: Int): Array[Double] =
      v.slice(m * 16, m * 16 + 16)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def assign(v: Array[Double], m: Int): Int =
      seeds.indices.minBy { c =>
        val (s, cb) = (sub(v, m), sub(byId(seeds(c)), m))
        (dot(s, s) - 2.0 * dot(s, cb) + dot(cb, cb), c)
      }
    val q = byId(0L)
    val expected = vecs.filter(_._1 != 0L).map { case (id, v) =>
      val score = (0 until 4).map { m =>
        dot(sub(q, m), sub(byId(seeds(assign(v, m))), m))
      }.reduce(_ + _)
      (id, BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val rows = Similarity.pqTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1))))
    assert(rows.map(_._1).toSeq == expected.map(_._1).toSeq,
      "ADC ranking must match the driver-side PQ re-derivation")
  }

  test("matryoshka: audit row is internally consistent and bound holds") {
    val r = Similarity.matryoshkaRecall(spark, sf001).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "matryoshka16_rerank100")
    val (k, exactK, hits) = (row.getLong(1), row.getLong(2), row.getLong(3))
    assert(exactK == k && hits >= 0 && hits <= k)
    assert(row.getBoolean(4), "prefix recall fell below the pinned bound")
  }

  test("sliding hll: estimates equal recomputed per-window registers") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(expr("unix_micros(ts) div 86400000000").as("d"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def rho(u: Long): (Int, Int) = {
      val h = java.lang.Long.parseLong(md5hex(u.toString).take(8), 16)
      val (b, w) = ((h % 256).toInt, h / 256)
      (b, if (w == 0) 25 else 25 - java.lang.Long.toBinaryString(w).length)
    }
    val dayRegs = ev.groupBy(_._1).map { case (d, us) =>
      d -> us.map(u => rho(u._2)).groupBy(_._1)
        .map { case (b, rs) => (b, rs.map(_._2).max) }
    }
    val days = dayRegs.keySet
    def est(regs: Map[Int, Int]): Double = {
      val full = (0 until 256).map(b => regs.getOrElse(b, 0))
      val s = full.map(r => math.pow(2.0, -r)).sum
      val v = full.count(_ == 0)
      val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
      val e = alpha * 256.0 * 256.0 / s
      val raw = if (e <= 2.5 * 256 && v > 0) 256.0 * math.log(256.0 / v) else e
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = days.toSeq.sorted.map { e =>
      val member = dayRegs.filter { case (d, _) => d >= e - 6 && d <= e }
      val merged = member.values.flatten.groupBy(_._1)
        .map { case (b, rs) => (b, rs.map(_._2).max) }
      (e, est(merged))
    }
    val rows = Sketches.hllSlidingDays(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == expected)
  }

  test("decayed topk: exact shifted-integer scores, well-formed ranks") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = ev.map(_._3).max
    val scaled = ev.withFilter(e => ref - e._3 <= 40)
      .map(e => ((e._1, e._2), 1L << (40 - (ref - e._3).toInt)))
      .groupBy(_._1).map { case (k, ws) => (k, ws.map(_._2).sum) }
    val expected = scaled.groupBy(_._1._1).toSeq.flatMap { case (t, us) =>
      us.toSeq.map { case ((_, u), s) => (u, s) }
        .sortBy { case (u, s) => (-s, u) }.take(5).zipWithIndex
        .map { case ((u, s), i) =>
          (t, i + 1, u,
            BigDecimal(s.toDouble / math.pow(2.0, 40))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.sortBy(r => (r._1, r._2))
    val rows = Events.decayedTopK(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(rows == expected)
  }

  test("null profile: counts match collected-table brute force") {
    val rows = DataQuality.nullProfile(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.size == 11, "5 documents + 6 events columns")
    val docs = graft.tables.Tables.documents(spark, sf001).collect()
    val langs = docs.map(_.getAs[String]("lang"))
    assert(rows(("documents", "lang")) ==
      (docs.length.toLong, langs.count(_ == null).toLong,
        langs.count(l => l != null && l.trim.isEmpty).toLong,
        langs.filter(_ != null).distinct.length.toLong))
    val ev = graft.tables.Tables.events(spark, sf001).collect()
    val users = ev.map(_.getAs[Long]("user_id"))
    assert(rows(("events", "user_id")) ==
      (ev.length.toLong, 0L, 0L, users.distinct.length.toLong))
    rows.foreach { case ((t, c), (n, nn, nb, nd)) =>
      assert(nn + nd >= 0 && nb <= n - nn && nd <= n - nn, s"$t.$c sanity")
    }
  }

  test("bpe encode: greedy merge application recomputed per word") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z]+").toSeq.filter(_.nonEmpty)
    // mine the top-5 pairs exactly like X52
    val wc = docs.flatMap(d => toks(d._2)).filter(_.length >= 2)
      .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }
    val merges = wc.toSeq.flatMap { case (w, c) =>
      (0 until w.length - 1).map(i => (w.substring(i, i + 2), c))
    }.groupBy(_._1).map { case (p, o) => (p, o.map(_._2).sum) }
      .toSeq.sortBy { case (p, f) => (-f, p) }.take(5).map(_._1)
    def encode(w: String): String = {
      var e = w.map(c => s"<$c>").mkString
      merges.foreach { p =>
        e = e.replace(s"<${p(0)}><${p(1)}>", s"<$p>")
      }
      e
    }
    val expected = docs.flatMap { case (id, t) =>
      val ws = toks(t)
      if (ws.isEmpty) None
      else {
        val es = ws.map(encode)
        val base = ws.map(_.length.toLong).sum
        val bpe = es.map(_.count(_ == '<').toLong).sum
        Some((id, ws.length.toLong, base, bpe, base - bpe, es.mkString(" ")))
      }
    }.sortBy(_._1).toSeq
    val rows = LangModel.bpeEncode(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq
    assert(rows == expected)
    assert(rows.exists(_._5 > 0), "top-5 merges must actually fire")
  }

  test("stream hll: state-folded estimates equal the batch registers") {
    val streamed = graft.streaming.EventStream.streamHll(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = Sketches.hllDistinct(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(streamed == batch,
      "streaming 256-byte sketch state must reproduce the batch estimate")
  }

  test("containment: prefix-filtered join is lossless vs the brute force") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => (id, shingles(t)) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      (ida, sa) <- sets; (idb, sb) <- sets if ida != idb
      both = (sa & sb).size
      if both.toDouble / sa.size >= 0.5
    } yield (ida, idb, sa.size.toLong, sb.size.toLong,
      BigDecimal(both.toDouble / sa.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(r => (r._1, r._2)).toSeq
    val rows = TextDedup.containmentPairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(rows == expected)
    assert(rows.nonEmpty, "fixture must contain tau-contained docs")
    // direction-specific scoring: C(a→b) uses |A| as the denominator,
    // so a size-skewed pair scores differently per direction (the tiny
    // fixture's planted dups are same-length, so only the score law —
    // not a strictly one-way pair — is assertable at sf0.001)
    val score = rows.map(r => ((r._1, r._2), (r._3, r._5))).toMap
    rows.foreach { case (a, b, na, _, c) =>
      score.get((b, a)).foreach { case (nb2, c2) =>
        if (na != nb2) assert(c != c2, s"($a,$b) sizes differ, scores equal")
      }
    }
  }

  test("edge jaccard: triangle attribution equals naive neighbor sets") {
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted)
    val edges = byOrder.flatMap(ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j)))
      .toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val expected = edges.toSeq.map { case (a, b) =>
      val common = (adj(a) & adj(b)).size.toLong
      val denom = adj(a).size + adj(b).size - common - 2
      (a, b, adj(a).size.toLong, adj(b).size.toLong, common,
        BigDecimal(common.toDouble / denom)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(r => r._3 + r._4 - r._5 - 2 > 0)
      .sortBy(r => (-r._6, r._1, r._2)).take(20)
    val rows = Graphs.edgeJaccard(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(rows == expected)
  }

  test("cohort ltv: curve recomputed from first-event cohorts") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 86400000000 div 7").as("wk"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val cohort = ev.groupBy(_._1).map { case (u, es) => (u, es.map(_._3).min) }
    val size = cohort.values.groupBy(identity)
      .map { case (w, o) => (w, o.size.toLong) }
    val cells = ev.filter(_._2 == "purchase")
      .map(e => ((cohort(e._1), e._3 - cohort(e._1)), e))
      .groupBy(_._1)
      .map { case ((cw, off), es) =>
        (cw, off, es.map(_._2._1).distinct.size.toLong,
          es.map(e => BigDecimal(e._2._4).setScale(2,
            BigDecimal.RoundingMode.HALF_UP)).sum)
      }.toSeq
    val expected = cells.groupBy(_._1).toSeq.flatMap { case (cw, cs) =>
      val sorted = cs.sortBy(_._2)
      var cum = BigDecimal(0)
      sorted.map { case (_, off, users, rev) =>
        cum += rev
        (cw, off, size(cw), users, rev.toDouble, cum.toDouble,
          BigDecimal(cum.toDouble / size(cw))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(r => (r._1, r._2))
    val rows = Events.cohortLtv(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(rows == expected)
  }

  test("golden record: survivorship rules recomputed per cluster") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0),
        md5hex(r.getString(1).split(" ").take(5).mkString(" ")),
        r.getString(2), r.getString(3), r.getLong(4)))
    val expected = docs.groupBy(_._2).filter(_._2.length >= 2)
      .toSeq.map { case (cl, ms) =>
        def modal(vals: Seq[String]): String =
          vals.groupBy(identity).toSeq
            .map { case (v, o) => (-o.length, v) }.min._2
        (cl, ms.length.toLong, ms.map(_._1).min,
          modal(ms.map(_._3).toSeq), modal(ms.map(_._4).toSeq),
          ms.map(_._5).max)
      }.sortBy(_._1)
    val rows = Warehouse.goldenRecord(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5))).toSeq
    assert(rows.nonEmpty, "blocking key must produce ≥1 multi-member cluster")
    assert(rows == expected)
  }
}
