package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-11 operators (X267/X268):
  * same discipline as Round8–10OpsSpec — each entry is recomputed
  * independently in plain JVM code from the collected fixture, so a bug
  * the DuckDB twin happens to share still fails here.
  */
class Round11OpsSpec extends SparkSpec {

  private def rnd6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("hier rollup equals the brute-force decimal-prefix walk") {
    val percust = graft.tables.Tables.orders(spark, sf001)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val acc = scala.collection.mutable.Map
      .empty[Long, (Long, java.math.BigDecimal)]
    percust.foreach { case (ck, rev) =>
      // self always recorded (a key-0 member owns its root node), then
      // the positive proper prefixes — the CTE twin's anchor+recursion
      var node = ck
      var done = false
      while (!done) {
        val (c, s) = acc.getOrElse(node, (0L, java.math.BigDecimal.ZERO))
        acc(node) = (c + 1, s.add(rev))
        if (node >= 10) node = node / 10 else done = true
      }
    }
    val got = Analytics.hierRollupDecimal(spark, sf001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDecimal(3)))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    assert(got.length == acc.size)
    got.foreach { case (node, (depth, nMembers, revenue)) =>
      val (ec, es) = acc(node)
      assert(depth == node.toString.length.toLong, s"node $node depth")
      assert(nMembers == ec, s"node $node members $nMembers vs $ec")
      assert(revenue.compareTo(es.setScale(2)) == 0,
        s"node $node revenue $revenue vs $es")
    }
    // subtree law: every node's revenue equals the sum over its children
    // plus customers sitting exactly at the node (keys k with k = node)
    val byNode = got.toMap
    val custAt = percust.groupBy(_._1).map { case (k, g) =>
      k -> g.map(_._2.asInstanceOf[java.math.BigDecimal])
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    }
    byNode.keys.foreach { node =>
      // node 0 has no children (leading zeros never occur in a key)
      val kids =
        if (node == 0L) Seq.empty[Long]
        else (0 to 9).map(d => node * 10 + d).filter(byNode.contains)
      val kidSum = kids.map(byNode(_)._3.asInstanceOf[java.math.BigDecimal])
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      val own = custAt.getOrElse(node, java.math.BigDecimal.ZERO)
      assert(byNode(node)._3.compareTo(kidSum.add(own).setScale(2)) == 0,
        s"node $node violates the subtree additivity law")
    }
  }

  test("hier rollup equals its recursive-CTE spelling (Spark 4.1 " +
    "UNION ALL recursion boundary)") {
    // The r11 DuckDB twin spelled the ancestor walk as WITH RECURSIVE;
    // the shipped twin is now the non-recursive prefix explode (r11
    // verdict item 1). This test keeps the recursion boundary covered:
    // Spark 4.1 RUNS UNION ALL recursion, and the recursive spelling
    // produces exactly the engine's output.
    graft.tables.Tables.orders(spark, sf001)
      .createOrReplaceTempView("orders_hier_cte")
    val rec = spark.sql("""
      WITH RECURSIVE percust AS (
        SELECT o_custkey AS ck,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders_hier_cte GROUP BY o_custkey),
      anc AS (
        SELECT ck AS node, rev FROM percust
        UNION ALL
        SELECT node DIV 10 AS node, rev FROM anc WHERE node >= 10)
      SELECT node,
             CAST(length(CAST(node AS STRING)) AS BIGINT) AS depth,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(rev) AS DECIMAL(18,2)) AS revenue
      FROM anc GROUP BY node ORDER BY node""").collect()
    val got = Analytics.hierRollupDecimal(spark, sf001).collect()
    assert(rec.length == got.length)
    rec.zip(got).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getLong(2) == b.getLong(2))
      assert(a.getDecimal(3).compareTo(b.getDecimal(3)) == 0,
        s"node ${a.getLong(0)} revenue")
    }
  }

  test("beam-search ANN replays the deterministic walk move-for-move") {
    val vecs = graft.tables.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) {
        dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1
      }
      rnd6(dab / (math.sqrt(daa) * math.sqrt(dbb)))
    }
    // occupancy-bounded bucket width (r13): the integer-exact
    // min(24, max(4, ⌈log₂⌈n/256⌉⌉)) the engine and twin both state
    val bits = Similarity.knnBuildBits(vecs.length.toLong)
    val qv = vecs.find(_._1 == 0L).get._2
    // the index covers ALL vectors (query node included, r13); scoring
    // — and therefore beams and results — excludes the query
    val cs = vecs.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(v, qv) }.toMap
    // r14: the search graph UNIONS two independent sign-hash tables
    // (offset 0 and offset `bits`) at m = 8 — single-table edges never
    // cross buckets, which capped recall at 3/10
    def tableTopM(offset: Int): Seq[(Long, Long)] = {
      def bucket(v: Array[Double]): String =
        (offset until offset + bits)
          .map(i => if (v(i) >= 0) '1' else '0').mkString
      val byBucket = vecs.groupBy { case (_, v) => bucket(v) }
      vecs.toSeq.flatMap { case (id, v) =>
        byBucket(bucket(v)).filter(_._1 != id)
          .map { case (jd, w) => (jd, cos(v, w)) }
          .sortBy { case (jd, c) => (-c, jd) }.take(8)
          .map { case (jd, _) => (id, jd) }
      }
    }
    val topM = tableTopM(0) ++ tableTopM(bits)
    val allEdges: Set[(Long, Long)] =
      topM.toSet ++ topM.map(_.swap).toSet ++
        vecs.map(p => (p._1, p._1)).toSet
    val edges: Map[Long, Set[Long]] =
      allEdges.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    // entry = the min-id SCORED node (the query's own node is indexed
    // but unscored, so the walk starts at the smallest other id)
    var beam: Set[Long] = Set(cs.keys.min)
    (1 to 3).foreach { _ =>
      val frontier = beam.flatMap(edges.getOrElse(_, Set.empty[Long]))
      beam = frontier.filter(cs.contains).toSeq
        .sortBy(id => (-cs(id), id)).take(16).toSet
    }
    val exactK = vecs.map(_._1).filter(_ != 0L)
      .sortBy(id => (-cs(id), id)).take(10).toSet
    val expect = beam.toSeq.sortBy(id => (-cs(id), id)).zipWithIndex
      .map { case (id, i) => (i + 1L, id, cs(id), exactK(id)) }
    val got = Similarity.beamSearchTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == expect,
      s"got=${got.toSeq.mkString(",")} expect=${expect.mkString(",")}")
    // the walk must do real work on the fixture, and at the r14
    // deployable parameters (two-table seed, m=8, width 16) recall must
    // be defensible: >= 7 of the exact top-10 in the final beam (the
    // r13 verdict's bar; measured 9/10 on the current fixture)
    assert(got.length > 1 && got.count(_._4) >= 7,
      s"beam recall ${got.count(_._4)}/10 below the 7/10 bar")
  }

  private def docTokens(raw: Boolean): Map[Long, Array[String]] =
    graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (if (raw) r.getString(1).split(" ", -1)
         else r.getString(1).toLowerCase.split("[^a-z]+", -1)))
      .toMap

  test("chunk overlap: closed-form chunking covers every token, no subset chunks") {
    val docs = docTokens(raw = true)
    val got = TextStats.chunkOverlap(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    docs.foreach { case (d, ws) =>
      val n = ws.length
      val chunks = byDoc(d).sortBy(_._2)
      // count law: 1 + ceil(max(n - 24, 0) / 16)
      assert(chunks.length == 1 + (math.max(n - 24, 0) + 15) / 16,
        s"doc $d chunk count")
      chunks.foreach { case (_, k, s0, e0, nt, ft, lt) =>
        assert(s0 == k * 16 + 1 && e0 == math.min(k * 16 + 24, n.toLong))
        assert(nt == e0 - s0 + 1)
        assert(ft == ws((s0 - 1).toInt) && lt == ws((e0 - 1).toInt),
          s"doc $d chunk $k boundary tokens")
      }
      // coverage: every position 1..n inside some chunk; no chunk a
      // strict subset of its predecessor
      val covered = chunks.flatMap(c => c._3 to c._4).toSet
      assert(covered == (1L to n.toLong).toSet, s"doc $d coverage")
      chunks.sliding(2).foreach {
        case Array(a, b) => assert(b._4 > a._4, s"doc $d subset chunk")
        case _ =>
      }
    }
  }

  test("mattr equals brute-force per-window distinct counts") {
    val W = 20
    val docs = docTokens(raw = false).map { case (d, ws) =>
      d -> ws.filter(_.nonEmpty)
    }
    val got = TextStats.mattr(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val expect = docs.toSeq.filter(_._2.length >= W).sortBy(_._1)
      .map { case (d, ws) =>
        val n = ws.length
        val m = n - W + 1
        val sumD = (0 until m).map(s =>
          ws.slice(s, s + W).distinct.length.toLong).sum
        (d, n.toLong, m.toLong, sumD,
          rnd6(sumD.toDouble / (W.toLong * m)))
      }
    assert(got == expect)
  }

  test("phrase search equals the brute adjacent-bigram scan") {
    val docs = docTokens(raw = false)
    val expect = docs.toSeq.sortBy(_._1).flatMap { case (d, ws) =>
      val hits = ws.indices.dropRight(1)
        .filter(i => ws(i) == "table" && ws(i + 1) == "hash")
        .map(_ + 1L)
      if (hits.isEmpty) None else Some((d, hits.length.toLong, hits.min))
    }
    val got = Search.phraseSearch(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "fixture must contain the phrase")
  }

  test("MMR rerank replays the greedy selection move-for-move") {
    val vecs = graft.tables.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) {
        dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1
      }
      rnd6(dab / (math.sqrt(daa) * math.sqrt(dbb)))
    }
    val qv = vecs.find(_._1 == 0L).get._2
    val cands = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cos(v, qv)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(16)
    val rel = cands.map(c => c._1 -> c._3).toMap
    val sim = (for (a <- cands; b <- cands if a._1 != b._1)
      yield (a._1, b._1) -> cos(a._2, b._2)).toMap
    var selected = Vector(cands.map(c => (c._1, c._3))
      .minBy { case (id, r) => (-r, id) })
    var expect = Vector((1L, selected.head._1, selected.head._2,
      selected.head._2))
    (2 to 4).foreach { k =>
      val pick = cands.map(_._1).filterNot(selected.map(_._1).contains)
        .map { id =>
          val ms = selected.map(s => sim((id, s._1))).max
          (id, rel(id), rnd6(rel(id) * 0.7 - ms * (1.0 - 0.7)))
        }
        .minBy { case (id, _, sc) => (-sc, id) }
      selected :+= ((pick._1, pick._2))
      expect :+= ((k.toLong, pick._1, pick._2, pick._3))
    }
    val got = Similarity.mmrRerank(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toVector
    assert(got == expect, s"got=$got expect=$expect")
    // diversification must bite: the MMR sequence differs from the
    // plain relevance order OR at least one penalty is non-zero
    assert(expect.drop(1).exists { case (_, id, r, sc) => sc < r })
  }

  test("CUPED theta and adjusted means equal the brute moment fold") {
    val rows = graft.tables.Tables.events(spark, sf001)
      .selectExpr("user_id",
        "cast(value as decimal(18,2)) as v",
        "ts < timestamp'2024-01-16 00:00:00' as pre")
      .collect()
      .map(r => (r.getLong(0), r.getDecimal(1), r.getBoolean(2)))
    def md5arm(u: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u|srm_v1".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16) % 2
    }
    val perUser = rows.groupBy(_._1).map { case (u, g) =>
      def tot(p: Boolean) = g.filter(_._3 == p)
        .map(_._2.asInstanceOf[java.math.BigDecimal])
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).setScale(2)
      (u, tot(true), tot(false), md5arm(u))
    }.toSeq
    val n = perUser.size
    def bd(xs: Seq[java.math.BigDecimal]) =
      xs.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val sx = bd(perUser.map(_._2)); val sy = bd(perUser.map(_._3))
    val sxy = bd(perUser.map(r => r._2.multiply(r._3)))
    val sxx = bd(perUser.map(r => r._2.multiply(r._2)))
    val theta = rnd6((n * sxy.doubleValue - sx.doubleValue * sy.doubleValue) /
      (n * sxx.doubleValue - sx.doubleValue * sx.doubleValue))
    val meanPreAll = sx.doubleValue / n
    val expect = perUser.groupBy(_._4).toSeq.sortBy(_._1).map { case (a, g) =>
      val nu = g.size
      val sxa = bd(g.map(_._2)); val sya = bd(g.map(_._3))
      (a, nu.toLong, rnd6(sxa.doubleValue / nu), rnd6(sya.doubleValue / nu),
        theta,
        rnd6(sya.doubleValue / nu -
          theta * (sxa.doubleValue / nu - meanPreAll)))
    }
    val got = Analytics.cuped(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("Mann-Whitney U equals the brute average-rank computation") {
    val rows = graft.tables.Tables.events(spark, sf001)
      .select("event_type", "value", "user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def md5arm(u: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u|srm_v1".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16) % 2
    }
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val vals = g.map(r => (r._2, md5arm(r._3))).sortBy(_._1)
      // average rank per value group, doubled to stay integral
      val n = vals.length
      var r12 = 0L; var n1 = 0L; var i = 0
      while (i < n) {
        var j = i
        while (j < n && vals(j)._1 == vals(i)._1) j += 1
        val avg2 = (i + 1L) + j.toLong // (minrank + maxrank)
        (i until j).foreach { k =>
          if (vals(k)._2 == 0L) { r12 += avg2; n1 += 1 }
        }
        i = j
      }
      val n2 = n - n1
      val u1 = (r12 - n1 * (n1 + 1)).toDouble / 2.0
      val z = rnd6((u1 - n1.toDouble * n2 / 2.0) /
        math.sqrt(n1.toDouble * n2 * (n + 1) / 12.0))
      (t, n1, n2, u1, z)
    }
    val got = Analytics.mannWhitney(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expect, s"got=$got expect=$expect")
  }

  private def md5arm2(u: Long, salt: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$u$salt".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16) % 2
  }

  test("subsample CI equals the brute 32-half-sample order statistics") {
    val rows = graft.tables.Tables.events(spark, sf001)
      .selectExpr("user_id", "cast(value as decimal(18,2)) as v")
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val perUser = rows.groupBy(_._1).map { case (u, g) =>
      (u, g.map(_._2.asInstanceOf[java.math.BigDecimal])
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).setScale(2),
        g.length.toLong, md5arm2(u, "|srm_v1"))
    }.toSeq
    def lift(us: Seq[(Long, java.math.BigDecimal, Long, Long)]): Option[Double] = {
      def m(a: Long): Option[Double] = {
        val g = us.filter(_._4 == a)
        if (g.isEmpty) None
        else Some(g.map(_._2).reduce(_.add(_)).doubleValue / g.map(_._3).sum)
      }
      for (m1 <- m(1); m0 <- m(0)) yield rnd6(m1 - m0)
    }
    val liftFull = lift(perUser).get
    val lifts = (0 until 32).map { b =>
      b -> lift(perUser.filter(r => md5arm2(r._1, s"|sub_$b") == 0))
    }
    // NULLS FIRST, then lift, then b
    val ranked = lifts.sortBy { case (b, l) =>
      (if (l.isEmpty) 0 else 1, l.getOrElse(0.0), b)
    }
    val ciLo = ranked(1)._2
    val ciHi = ranked(30)._2
    val got = Analytics.subsampleCi(spark, sf001).collect().head
    assert(got.getLong(0) == 32L)
    assert(got.getDouble(1) == liftFull)
    assert(Option(got.get(2)).map(_.asInstanceOf[Double]) == ciLo)
    assert(Option(got.get(3)).map(_.asInstanceOf[Double]) == ciHi)
    // CI law on the fixture: lo <= hi when both exist
    for (l <- ciLo; h <- ciHi) assert(l <= h)
  }

  test("winsorized mean equals the brute clamp at discrete p05/p95") {
    val rows = graft.tables.Tables.events(spark, sf001)
      .selectExpr("event_type", "cast(value as decimal(18,2)) as v")
      .collect()
      .map(r => (r.getString(0), r.getDecimal(1)))
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val vs = g.map(_._2.asInstanceOf[java.math.BigDecimal]).sorted
      val n = vs.length
      def q(pct: Int) = vs(((pct * n + 99) / 100) - 1)
      val (p05, p95) = (q(5), q(95))
      def mean(xs: Seq[java.math.BigDecimal]) = rnd6(
        xs.foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue / n)
      val win = vs.map(v => if (v.compareTo(p05) < 0) p05
        else if (v.compareTo(p95) > 0) p95 else v)
      (t, n.toLong, mean(vs), mean(win),
        vs.count(_.compareTo(p05) < 0).toLong,
        vs.count(_.compareTo(p95) > 0).toLong)
    }
    val got = Analytics.winsorizedMean(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("residual energy: ratios in (0,1], centroid removes energy somewhere") {
    val got = Similarity.residualEnergy(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.nonEmpty)
    val nTotal = got.map(_._2).sum
    assert(nTotal == graft.tables.Tables.embeddings(spark, sf001).count())
    got.foreach { case (bk, n, avg, er) =>
      assert(er >= 0.0 && er <= 1.0 + 1e-9, s"cell $bk energy ratio $er")
      assert(avg >= 0.0 && avg <= 1.0 + 1e-9, s"cell $bk avg ratio $avg")
      // a single-vector cell's centroid IS the vector: ratio exactly 0
      if (n == 1) assert(er == 0.0, s"singleton cell $bk should zero out")
    }
    // the mean-centering law: every multi-vector cell removes SOME
    // energy (residual < original) unless all its vectors are identical
    assert(got.filter(_._2 > 1).forall(_._4 < 1.0))
  }

  test("edge energy: constant-ramp interiors match the closed form, seams detected") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def px(d: Long, x: Int, y: Int): Long =
      java.lang.Math.floorMod(d * 31 + x * 7 + y * 13, 256)
    val expect = docs.sortBy(_._1).map { case (d, nc) =>
      val w = (8 + java.lang.Math.floorMod(d, 9)).toInt
      val h = (8 + java.lang.Math.floorMod(nc, 9)).toInt
      var energy = 0L; var nEdge = 0L
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val gx = (px(d, x + 1, y - 1) + 2 * px(d, x + 1, y) + px(d, x + 1, y + 1)) -
          (px(d, x - 1, y - 1) + 2 * px(d, x - 1, y) + px(d, x - 1, y + 1))
        val gy = (px(d, x - 1, y + 1) + 2 * px(d, x, y + 1) + px(d, x + 1, y + 1)) -
          (px(d, x - 1, y - 1) + 2 * px(d, x, y - 1) + px(d, x + 1, y - 1))
        val e = gx * gx + gy * gy
        energy += e
        if (e > 20000L) nEdge += 1
      }
      (d, w.toLong, h.toLong, (w - 2).toLong * (h - 2), energy, nEdge)
    }.toSeq
    val got = graft.ext.Multimodal.edgeEnergy(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the threshold law: at least one image has a wrap seam in frame
    assert(got.exists(_._6 > 0))
  }

  test("context pack: rank order, budget law, scores match brute count") {
    val docs = docTokens(raw = true)
    val terms = Set("table", "hash", "scan")
    val got = Search.contextPack(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    // ranks contiguous from 1, cum_toks = running sum, budget respected
    assert(got.map(_._1).toSeq == (1L to got.length).toSeq)
    var cum = 0L
    got.foreach { case (_, d, k, score, nt, ct) =>
      cum += nt
      assert(ct == cum && ct <= 256)
      // brute score: query-term occurrences inside the chunk span
      val ws = docs(d).map(_.toLowerCase)
      val s0 = (k * 16).toInt
      val e0 = math.min(k * 16 + 24, ws.length.toLong).toInt
      val brute = (s0 until e0).count(i => terms(ws(i)))
      assert(score == brute, s"doc $d chunk $k score $score vs $brute")
    }
    // monotone score order with (doc, chunk) tie-break
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 &&
          (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3))))
      case _ =>
    }
  }

  test("DiD equals the brute 2x2 cell means") {
    val rows = graft.tables.Tables.events(spark, sf001)
      .selectExpr("user_id", "cast(value as decimal(18,2)) as v",
        "ts < timestamp'2024-01-16 00:00:00' as pre")
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getBoolean(2)))
    def m(arm: Long, pre: Boolean): Double = {
      val g = rows.filter(r => md5arm2(r._1, "|srm_v1") == arm && r._3 == pre)
      rnd6(g.map(_._2.asInstanceOf[java.math.BigDecimal])
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue / g.length)
    }
    val (p0, q0, p1, q1) = (m(0, true), m(0, false), m(1, true), m(1, false))
    val got = Analytics.diffInDiff(spark, sf001).collect().head
    assert((got.getDouble(0), got.getDouble(1), got.getDouble(2),
      got.getDouble(3)) == ((p0, q0, p1, q1)))
    assert(got.getDouble(4) == rnd6((q1 - p1) - (q0 - p0)))
    assert(got.getDouble(5) == rnd6(q1 - q0))
  }

  test("EMD drift equals the brute Wasserstein-1 over the merged support") {
    val rows = graft.tables.Tables.events(spark, sf001)
      .selectExpr("event_type", "cast(value as decimal(18,2)) as v",
        "ts < timestamp'2024-01-16 00:00:00' as pre")
      .collect()
      .map(r => (r.getString(0), r.getDecimal(1), r.getBoolean(2)))
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val support = g.map(_._2.asInstanceOf[java.math.BigDecimal])
        .distinct.sorted
      val n1 = g.count(_._3).toLong
      val n2 = g.size - n1
      var cum1 = 0L; var cum2 = 0L
      var acc = java.math.BigDecimal.ZERO
      support.sliding(2).foreach {
        case Array(v, next) =>
          cum1 += g.count(r => r._3 && r._2.compareTo(v) == 0)
          cum2 += g.count(r => !r._3 && r._2.compareTo(v) == 0)
          val num = java.math.BigDecimal.valueOf(
            math.abs(cum1 * n2 - cum2 * n1)).setScale(2)
          acc = acc.add(num.multiply(next.subtract(v)))
        case _ =>
      }
      (t, n1, n2, rnd6(acc.doubleValue / (n1.toDouble * n2)))
    }
    val got = Analytics.emdDrift(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("gate ablation counts match the brute per-doc flag fold") {
    val q = TextStats.quality(spark, sf001)
      .selectExpr("doc_id", "quality_score", "n_chars").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val rep = TextStats.repetition(spark, sf001)
      .selectExpr("doc_id", "flagged").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val lex = TextStats.lexicalComplexity(spark, sf001)
      .selectExpr("doc_id", "poly_ratio").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val flags = q.toSeq.map { case (d, (score, nChars)) =>
      val fq = score < 0.2
      val fr = rep.getOrElse(d, false)
      val fl = lex.getOrElse(d, 0.0) < 0.02
      val fn = nChars < 150
      (fq, fr, fl, fn,
        Seq(fq, fr, fl, fn).count(identity))
    }
    val nDocs = flags.length.toLong
    def row(name: String, fail: ((Boolean, Boolean, Boolean, Boolean, Int)) => Boolean,
            uniq: ((Boolean, Boolean, Boolean, Boolean, Int)) => Boolean) = {
      val nf = flags.count(fail).toLong
      val nu = flags.count(uniq).toLong
      (name, nDocs, nf, nu,
        if (nf > 0) Some(rnd6(nu.toDouble / nf)) else None)
    }
    val expect = Seq(
      row("1_quality", _._1, f => f._1 && f._5 == 1),
      row("2_repetition", _._2, f => f._2 && f._5 == 1),
      row("3_lexical", _._3, f => f._3 && f._5 == 1),
      row("4_length", _._4, f => f._4 && f._5 == 1),
      row("5_any", _._5 > 0, _._5 == 1))
    val got = TextStats.gateAblation(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
    assert(got == expect, s"got=$got expect=$expect")
    // the table must be non-degenerate on the fixture: the gate removes
    // some docs and keeps some
    val any = got.find(_._1 == "5_any").get
    assert(any._3 > 0 && any._3 < nDocs)
  }

  test("MDE equals the brute pooled-variance power formula") {
    val rows = graft.tables.Tables.events(spark, sf001)
      .selectExpr("event_type", "cast(value as decimal(18,2)) as v",
        "user_id").collect()
      .map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val n = g.length.toLong
      val n1 = g.count(r => md5arm2(r._3, "|srm_v1") == 0).toLong
      val n2 = n - n1
      def bd(xs: Seq[java.math.BigDecimal]) =
        xs.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      val sv = bd(g.map(_._2.asInstanceOf[java.math.BigDecimal]))
      val svv = bd(g.map { r =>
        val b = r._2.asInstanceOf[java.math.BigDecimal]; b.multiply(b)
      })
      val varD = (n * svv.doubleValue - sv.doubleValue * sv.doubleValue) /
        (n * (n - 1))
      val mdeAbs = rnd6((1.959964 + 0.841621) *
        math.sqrt(varD * (1.0 / n1 + 1.0 / n2)))
      val mean = rnd6(sv.doubleValue / n)
      (t, n1, n2, mean, rnd6(math.sqrt(varD)), mdeAbs,
        rnd6(mdeAbs / mean))
    }
    val got = Analytics.mde(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).toSeq
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("hybrid retrieval equals the brute RRF of the two retriever lists") {
    val lex = Search.bm25Posting(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
      .sortBy { case (id, sc) => (-sc, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val dense = Similarity.cosineTopK(spark, sf001, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, cs) => (-cs, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expect = (lex.keySet ++ dense.keySet).toSeq.map { id =>
      val rrf = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, lex.get(id), dense.get(id), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10)
      .map { case (id, rl, rd, rrf) => (id, rl, rd, rnd6(rrf)) }
    val got = Search.hybridRetrieval(spark, sf001).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3))).toSeq
    assert(got == expect, s"got=$got expect=$expect")
    // the fusion must be non-degenerate: at least one doc surfaced by
    // only one retriever (the null-leg RRF term)
    assert(got.exists(g => g._2.isEmpty || g._3.isEmpty))
  }

  test("spectral flux equals the arithmetic recompute off the synth stream") {
    val ids = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val expect = ids.map { d =>
      val nf = (2 + java.lang.Math.floorMod(d, 4)).toInt
      val es: Seq[Long] = (0 until nf).map { f =>
        (0 until 160).map { j =>
          val s = java.lang.Math.floorMod(d * 7 + (f * 160 + j).toLong * 13,
            4096) - 2048
          s * s
        }.sum
      }
      val flux = es.sliding(2).collect {
        case Seq(a, b) if b > a => b - a
      }.sum
      val rises = es.sliding(2).count { case Seq(a, b) => b > a; case _ => false }
      (d, nf.toLong, flux, rises.toLong, es.max)
    }.toSeq
    val got = graft.ext.Multimodal.spectralFlux(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
  }
}
