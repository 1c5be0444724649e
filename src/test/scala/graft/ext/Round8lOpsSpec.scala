package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-12 operators
  * (X212–X213).
  */
class Round8lOpsSpec extends SparkSpec {

  test("forward as-of equals a brute-force next-click scan") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._1)
    val expect = ev.filter(_._4 == "purchase").map { p =>
      val next = clicksByUser.getOrElse(p._1, Array.empty)
        .filter(_._2 > p._2)
      if (next.isEmpty) (p._3, p._1, None, None)
      else {
        val c = next.minBy(c => (c._2, c._3))
        (p._3, p._1, Some(c._3), Some(c._2 - p._2))
      }
    }.toSet
    val got = Events.asofForward(spark, sf001).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
    }.toSet
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
    // the forward direction is strictly-after: every gap is positive
    got.foreach(t => t._4.foreach(g => assert(g > 0)))
  }

  test("minhash pr audit reconciles with its two shared relations") {
    val cand = TextDedup.minhashPairs(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = TextDedup.jaccardPairs(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tp = cand.intersect(truth).size.toLong
    val r = TextDedup.minhashPrAudit(spark, sf001).collect()(0)
    assert(r.getAs[Long]("n_candidates") == cand.size.toLong)
    assert(r.getAs[Long]("n_truth") == truth.size.toLong)
    assert(r.getAs[Long]("true_positives") == tp)
    assert(r.getAs[Double]("f1") == math.rint(
      2.0 * tp / (cand.size + truth.size) * 1e6) / 1e6)
    // the banded candidates must actually recover most of the truth on
    // the fixture (the config's predicted high-s recall is near 1)
    assert(r.getAs[Double]("cand_recall") >= 0.8)
  }

  test("lsh layout matrix is monotone and agrees with the deployed layout") {
    val rows = TextDedup.lshPrMatrix(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4),
        r.getDouble(6))).toMap // bands -> (candidates, tp, recall)
    assert(rows.keySet == Set(1L, 2L, 4L, 8L))
    // fewer bands = stricter collision requirement: candidates, true
    // positives and recall are all non-increasing as bands drop
    Seq(8L, 4L, 2L, 1L).sliding(2).foreach { case Seq(hi, lo) =>
      assert(rows(hi)._1 >= rows(lo)._1, s"candidates $hi vs $lo")
      assert(rows(hi)._2 >= rows(lo)._2, s"tp $hi vs $lo")
      assert(rows(hi)._3 >= rows(lo)._3, s"recall $hi vs $lo")
    }
    // the (4, 2) row IS the deployed production layout — its candidate
    // set must equal the X2 entry's relation exactly
    val deployed = TextDedup.minhashPairs(spark, sf001).count()
    assert(rows(4L)._1 == deployed)
    // and its true positives must match the X214 audit
    val audit = TextDedup.minhashPrAudit(spark, sf001).collect()(0)
    assert(rows(4L)._2 == audit.getAs[Long]("true_positives"))
  }

  test("multi-walk replica 0 reproduces the walk corpus; replicas stay on edges") {
    val multi = Graphs.randomWalksMulti(spark, sf001, nWalks = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val single = Graphs.randomWalks(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // replica 0 IS the X186 corpus — the generalization is pure
    // parameter growth, not a new trajectory definition
    assert(multi.filter(_._2 == 0L).map(t => (t._1, t._3, t._4)).toSet ==
      single)
    // replica 1 diverges somewhere (the salt reaches the hash) and
    // every consecutive pair is a real edge of the graph
    val r1 = multi.filter(_._2 == 1L).map(t => (t._1, t._3, t._4)).toSet
    assert(r1 != single && r1.size == single.size)
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (e, g) => e -> g.size }
      .filter(_._2 >= 2).keySet
    multi.groupBy(t => (t._1, t._2)).values.foreach { w =>
      w.toSeq.sortBy(_._3).map(_._4).sliding(2).foreach { p =>
        if (p.length == 2) {
          val (a, b) = (math.min(p(0), p(1)), math.max(p(0), p(1)))
          assert(edges.contains((a, b)), s"non-edge step $a-$b")
        }
      }
    }
  }

  test("correlation matrix equals an in-JVM exact-moment recomputation") {
    val rows = graft.tables.Tables.lineitem(spark, sf001).select(
      col("l_quantity").cast("long"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      expr("CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)"),
      expr("CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000 AS BIGINT)"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)).map(BigInt(_)))
    val n = BigInt(rows.length)
    val ms = Seq("q", "p", "d", "t")
    val got = Analytics.corrMatrix(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.size == 6)
    for (i <- 0 until 4; j <- i + 1 until 4) {
      val (sx, sy) = (rows.map(_(i)).sum, rows.map(_(j)).sum)
      val sxx = rows.map(v => v(i) * v(i)).sum
      val syy = rows.map(v => v(j) * v(j)).sum
      val sxy = rows.map(v => v(i) * v(j)).sum
      val r = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      val (gn, gr) = got(s"${ms(i)}_${ms(j)}")
      assert(gn == rows.length.toLong)
      assert(gr == math.rint(r * 1e6) / 1e6, s"${ms(i)}_${ms(j)}")
      assert(gr >= -1.0 && gr <= 1.0)
    }
  }
}
