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
    val got = Analytics.hierRollup(spark, sf001).collect()
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
    def bucket(v: Array[Double]): String =
      (0 until 4).map(i => if (v(i) >= 0) '1' else '0').mkString
    val qv = vecs.find(_._1 == 0L).get._2
    val n = vecs.filter(_._1 != 0L)
    val cs = n.map { case (id, v) => id -> cos(v, qv) }.toMap
    // graph: per-node top-4 among 4-bit bucket mates, symmetrized + self
    val byBucket = n.groupBy { case (_, v) => bucket(v) }
    val topM = n.flatMap { case (id, v) =>
      byBucket(bucket(v)).filter(_._1 != id)
        .map { case (jd, w) => (jd, cos(v, w)) }
        .sortBy { case (jd, c) => (-c, jd) }.take(4)
        .map { case (jd, _) => (id, jd) }
    }
    val allEdges: Set[(Long, Long)] =
      topM.toSet ++ topM.map(_.swap).toSet ++
        n.map(p => (p._1, p._1)).toSet
    val edges: Map[Long, Set[Long]] =
      allEdges.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    var beam: Set[Long] = Set(n.map(_._1).min)
    (1 to 3).foreach { _ =>
      val frontier = beam.flatMap(edges.getOrElse(_, Set.empty[Long]))
      beam = frontier.toSeq.sortBy(id => (-cs(id), id)).take(8).toSet
    }
    val exactK = n.map(_._1).sortBy(id => (-cs(id), id)).take(10).toSet
    val expect = beam.toSeq.sortBy(id => (-cs(id), id)).zipWithIndex
      .map { case (id, i) => (i + 1L, id, cs(id), exactK(id)) }
    val got = Similarity.beamSearchTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == expect,
      s"got=${got.toSeq.mkString(",")} expect=${expect.mkString(",")}")
    // the walk must do real work on the fixture: a multi-row beam that
    // overlaps the exact top-k (recall > 0), else the entry is vacuous
    assert(got.length > 1 && got.exists(_._4))
  }
}
