package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the fourth round-7 operator batch — driver-side brute
  * forces on sf0.001, independent of the Spark plans: bitemporal
  * reconstruction against a literal 2-D scan, Benford digits against
  * collected counting, grid clustering against BFS over dense cells,
  * and the perceptual-hash join against arithmetic hashes + quadratic
  * pairing (which also proves the real PNG decode path agrees with the
  * stated raster).
  */
class Round7dOpsSpec extends SparkSpec {

  test("bitemporal: equals a literal 2-D (T,V) scan of the changelog") {
    val got = Warehouse.bitemporalQuery(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7))).sorted
    val log = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "n_chars").collect()
      .map { r =>
        val id = r.getLong(0)
        val op = if (id % 11 == 7) "D" else if (id % 3 == 0) "I" else "U"
        (id, id % 97, op, r.getLong(1), id % 50) // seq, key, op, val, eff
      }
    val mx = log.map(_._1).max
    val expected = (for {
      tver <- Seq(1L, 2L)
      vcut <- Seq(24L, 49L)
      tcut = mx * tver / 2
      (key, ops) <- log.filter(o => o._1 <= tcut && o._5 <= vcut).groupBy(_._2)
      w = ops.maxBy(o => (o._5, o._1))
      if w._3 != "D"
    } yield (tver, tcut, vcut, key, w._5, w._1, w._3, w._4)).sorted
    assert(got.toSeq == expected)
    assert(expected.nonEmpty)
  }

  test("benford: digit counts and constant reference table") {
    val got = DataQuality.benfordAudit(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val cents = graft.tables.Tables.orders(spark, sf001)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(_.getLong(0))
    val counts = cents.map(_.toString.head.asDigit)
      .groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val total = counts.values.sum
    for ((digit, n, pct, bf) <- got) {
      assert(n == counts(digit))
      assert(pct == BigDecimal(n.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(bf > 0.04 && bf < 0.31) // literal table, monotone decreasing
    }
    assert(got.map(_._4).toSeq == got.map(_._4).sorted.reverse.toSeq,
      "Benford reference must decrease with digit")
  }

  test("grid clusters: equals BFS over dense cells") {
    val got = Spatial.gridClusters(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val keys = graft.tables.Tables.customer(spark, sf001)
      .select("c_custkey").collect().map(_.getLong(0))
    val cells = keys.map { k =>
      val x = (k * 5761) % 10000L
      val y = ((k * 5761) / 10000L) % 10000L
      (x / 250, y / 250)
    }.groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val dense = cells.filter(_._2 >= 4).keySet
    // BFS labeling with min linear id per component
    def lin(c: (Long, Long)) = c._1 * 40 + c._2
    var labels = Map.empty[(Long, Long), Long]
    for (seed <- dense.toSeq.sortBy(lin)) if (!labels.contains(seed)) {
      var comp = Set(seed)
      var frontier = Set(seed)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap { case (cx, cy) =>
          for {
            dx <- -1L to 1L; dy <- -1L to 1L
            n = (cx + dx, cy + dy)
            if n != ((cx, cy)) && dense(n) && !comp(n)
          } yield n
        }
        comp ++= frontier
      }
      val lab = comp.map(lin).min
      labels ++= comp.map(_ -> lab)
    }
    val expected = dense.map(c => c -> ((cells(c), labels(c)))).toMap
    assert(got == expected)
    assert(expected.nonEmpty)
    // the oracle unrolls 64 min-label propagation rounds; assert the
    // fixture actually converges inside that bound (loud, not silent)
    var plabels = dense.map(c => c -> lin(c)).toMap
    var rounds = 0
    var changed = true
    while (changed) {
      val next = dense.map { case c0 @ (cx, cy) =>
        val nb = for {
          dx <- -1L to 1L; dy <- -1L to 1L
          n = (cx + dx, cy + dy) if dense(n)
        } yield plabels(n)
        c0 -> nb.min
      }.toMap
      changed = next != plabels
      if (changed) { plabels = next; rounds += 1 }
    }
    assert(rounds <= 64,
      s"fixture propagation needs $rounds rounds > oracle unroll 64")
  }

  test("phash: real decode equals the arithmetic raster; pairing lossless") {
    val gotHashes = Multimodal.pngAHashes(spark, sf001).collect()
      .map(h => h.doc_id -> h.ahash).toMap
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def ahash(d: Long, nc: Long): Long = {
      val w = 8 + (d % 9); val h = 8 + (nc % 9)
      val px = (0 until 64).map(i =>
        (31 * d + 7 * ((i % 8) * w / 8) + 13 * ((i / 8) * h / 8)) % 256)
      val s = px.sum
      px.zipWithIndex.foldLeft(0L) { case (b, (v, i)) =>
        if (v * 64 > s) b | (1L << i) else b
      }
    }
    val expHashes = docs.map { case (d, nc) => d -> ahash(d, nc) }.toMap
    assert(gotHashes == expHashes,
      "decoded-raster aHash must equal the stated arithmetic")
    val gotPairs = Multimodal.phashPairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val ids = docs.map(_._1).sorted
    val expPairs = (for {
      i <- ids.indices; j <- i + 1 until ids.length
      ham = java.lang.Long.bitCount(expHashes(ids(i)) ^ expHashes(ids(j)))
      if ham <= 1
    } yield (ids(i), ids(j), ham)).sorted
    assert(gotPairs.toSeq == expPairs,
      "half-blocked join must be lossless vs the quadratic scan")
    assert(expPairs.nonEmpty)
  }

  test("rfm: segment totals partition the customer base") {
    val got = Analytics.rfmSegments(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nCust = graft.tables.Tables.orders(spark, sf001)
      .select("o_custkey").distinct().count()
    val nOrd = graft.tables.Tables.orders(spark, sf001).count()
    assert(got.map(_._2).sum == nCust, "segments must partition customers")
    assert(got.map(_._3).sum == nOrd, "segment orders must total all orders")
    assert(got.length >= 3, "fixed thresholds must spread the fixture")
  }

  test("three-way merge: matrix equals a literal per-key classifier") {
    val rows = Warehouse.threeWayMerge(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keys = graft.tables.Tables.customer(spark, sf001)
      .select("c_custkey").collect().map(_.getLong(0))
    assert(rows.size == keys.length)
    for (k <- keys) {
      val mDel = k % 7 == 0
      val tDel = k % 5 == 0
      val mUpd = !mDel && k % 3 == 0
      val tUpd = !tDel && k % 4 == 0
      val mc = mDel || mUpd
      val tc = tDel || tUpd
      val expected =
        if (!mc && !tc) "unchanged"
        else if (mc && !tc) "take_mine"
        else if (!mc && tc) "take_theirs"
        else if (mDel && tDel) "both_deleted"
        else if (mDel || tDel) "conflict_delete_update"
        else "conflict_update_update" // +100 vs +200 never agree
      assert(rows(k) == expected, s"key $k")
    }
    // every branch of the matrix must actually occur in the fixture
    assert(rows.values.toSet.size >= 6)
  }

  test("psi drift: terms recompute from collected band counts") {
    val got = DataQuality.psiDrift(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))))
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        expr("least(cast(cast(value as decimal(18,2)) * 100 as bigint) div 5000, " +
          "cast(9 as bigint))").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max + 1) / 2
    val counts = ev.groupBy(e => (e._1, e._3)).map { case (k, xs) =>
      k -> ((xs.count(_._2 < mid).toLong, xs.count(_._2 >= mid).toLong))
    }
    val tots = ev.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.count(_._2 < mid).toLong, xs.count(_._2 >= mid).toLong))
    }
    assert(got.map(_._1).toSet == counts.keySet)
    for (((t, b), (na, nb, term)) <- got) {
      assert((na, nb) == counts((t, b)))
      val (ta, tb) = tots(t)
      if (na > 0 && nb > 0) {
        val pa = na.toDouble / ta
        val pb = nb.toDouble / tb
        val e = BigDecimal((pa - pb) * math.log(pa / pb))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(term.contains(e), s"($t,$b)")
      } else assert(term.isEmpty, "missing-band terms must be NULL")
    }
  }
}
