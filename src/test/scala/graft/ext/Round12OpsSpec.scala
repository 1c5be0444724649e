package graft.ext

import graft.SparkSpec

/** Driver-side brute-force laws for the round-12 operator (X287): the
  * HNSW descent is recomputed independently in plain JVM code from the
  * collected fixture — levels, per-layer graphs, and every beam move —
  * so a bug the DuckDB twin happens to share still fails here (same
  * discipline as Round8–11OpsSpec).
  */
class Round12OpsSpec extends SparkSpec {

  private def rnd6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("hnsw ANN replays the multi-layer descent move-for-move") {
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
    def lvlH(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(2), 16)
    val qv = vecs.find(_._1 == 0L).get._2
    // the index covers ALL vectors (query node included, r13); scoring
    // — and therefore beams and results — excludes the query
    val cs = vecs.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(v, qv) }.toMap
    // per-layer graph (r14): UNION of two independent sign-hash tables
    // at m = 8 — layer buckets are nested prefixes of one sign string,
    // so a single-table descent was confined to the entry's sign region
    // top to bottom (recall capped at 3/10); cross-table edges bridge
    // regions at every layer (layer 2 = h<16, layer 1 = h<64, 0 = all)
    def layerEdges(cut: Long => Boolean): Map[Long, Set[Long]] = {
      val mem = vecs.filter { case (id, _) => cut(lvlH(id)) }
      val bits = Similarity.knnBuildBits(mem.length.toLong)
      def tableTopM(offset: Int): Seq[(Long, Long)] = {
        def bucket(v: Array[Double]): String =
          (offset until offset + bits)
            .map(i => if (v(i) >= 0) '1' else '0').mkString
        val byBucket = mem.groupBy { case (_, v) => bucket(v) }
        mem.toSeq.flatMap { case (id, v) =>
          byBucket(bucket(v)).filter(_._1 != id)
            .map { case (jd, w) => (jd, cos(v, w)) }
            .sortBy { case (jd, c) => (-c, jd) }.take(8)
            .map { case (jd, _) => (id, jd) }
        }
      }
      val topM = tableTopM(0) ++ tableTopM(bits)
      val all: Set[(Long, Long)] =
        topM.toSet ++ topM.map(_.swap).toSet ++
          mem.map(p => (p._1, p._1)).toSet
      all.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    }
    val e2 = layerEdges(_ < 16)
    val e1 = layerEdges(_ < 64)
    val e0 = layerEdges(_ => true)
    def step(beam: Set[Long], edges: Map[Long, Set[Long]],
             width: Int): Set[Long] =
      beam.flatMap(edges.getOrElse(_, Set.empty[Long]))
        .filter(cs.contains)
        .toSeq.sortBy(id => (-cs(id), id)).take(width).toSet
    val l2 = vecs.map(_._1).filter(id => lvlH(id) < 16)
    assert(l2.nonEmpty, "fixture must populate layer 2")
    // entry = min-id SCORED layer-2 member (query node excluded)
    var beam: Set[Long] = Set(l2.filter(_ != 0L).min)
    beam = step(beam, e2, 8)
    beam = step(beam, e1, 16)
    beam = step(beam, e0, 16)
    beam = step(beam, e0, 16)
    val exactK = vecs.map(_._1).filter(_ != 0L)
      .sortBy(id => (-cs(id), id)).take(10).toSet
    val expect = beam.toSeq.sortBy(id => (-cs(id), id)).zipWithIndex
      .map { case (id, i) => (i + 1L, id, cs(id), exactK(id)) }
    val got = Similarity.hnswTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == expect,
      s"got=${got.toSeq.mkString(",")} expect=${expect.mkString(",")}")
    // the descent must do real work, at defensible recall (the r13
    // verdict's >= 7/10 bar; measured 8/10 on the current fixture), and
    // the upper layers must actually be sparser than layer 0 (the
    // hierarchy is real, not degenerate)
    assert(got.length > 1 && got.count(_._4) >= 7,
      s"hnsw recall ${got.count(_._4)}/10 below the 7/10 bar")
    val n1 = vecs.count { case (id, _) => lvlH(id) < 64 }
    assert(l2.size < n1 && n1 < vecs.length)
  }

  test("the r12 environment-proofing of the two r11 driver-reds holds") {
    // r14 hardening of the r12 rule: even DECIMAL(9,6)/DECIMAL(18,2)
    // outputs stayed driver-red for four rounds (CORRECTNESS_r10–r13)
    // while the integer re-renderings went green first try, so the
    // shipped analytics_theil / analytics_hier_rollup entries must now
    // emit NOTHING but integers and strings — a silent revert to any
    // fractional output type would reopen the bridge divergence
    // without failing any value-level gate here.
    import org.apache.spark.sql.types.{LongType, StringType}
    Seq("analytics_theil", "analytics_hier_rollup").foreach { name =>
      val sch = graft.SparkEntry.queries(name)(spark, sf001).schema
      sch.fields.foreach { f =>
        assert(f.dataType == LongType || f.dataType == StringType,
          s"$name.${f.name} must stay BIGINT/STRING (got ${f.dataType})")
      }
    }
    // hier_rollup's shipped twin must stay non-recursive: WITH RECURSIVE
    // was the only untested-elsewhere construct in a driver-red twin
    // (the recursive spelling lives in Round11OpsSpec's equivalence
    // test, not in the shipped oracle).
    val twin = graft.SparkEntry.oracleSql("analytics_hier_rollup")
    assert(!twin.toUpperCase.contains("RECURSIVE"),
      "hier_rollup's shipped twin must stay the non-recursive explode")
  }
}
