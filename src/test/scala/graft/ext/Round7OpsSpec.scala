package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-7 operator batch beyond the DuckDB oracle's value
  * equality: HLL error bound + mergeability, decontamination slice
  * hygiene and planted-duplicate saturation, SQ8 recall against the
  * exact dot-product ranking, HITS normalization shape, CEP match
  * validity + completeness against a driver-side brute force, and the
  * streaming keep-first gate against its batch twin.
  */
class Round7OpsSpec extends SparkSpec {

  test("hll: estimate within the m=256 error envelope, err_pct consistent") {
    val rows = Sketches.hllDistinct(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est, err) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(exact > 0)
      // 3 sigma of HLL's 1.04/sqrt(256) = 6.5% std err
      assert(math.abs(est / exact - 1.0) < 0.20,
        s"${r.getString(0)}: est $est vs exact $exact")
      assert(math.abs(err - math.abs(est / exact - 1.0) * 100) < 1e-3)
    }
  }

  test("hll rollup: merged registers estimate == direct estimate (the law)") {
    val rows = Sketches.hllRollup(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("all_direct") == rows("all_merged"),
      "max-per-bucket merge of per-type sketches must equal the direct sketch")
    // per-type scopes agree with the X105 entry's estimates
    val x105 = Sketches.hllDistinct(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    x105.foreach { case (t, est) => assert(rows(t) == est, s"scope $t") }
  }

  test("decontaminate spans: cleaned text is gram-free, counts conserve") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byId = docs.toMap
    def grams8(t: String): Seq[String] =
      t.split(" ").toSeq.sliding(8).withFilter(_.length == 8)
        .map(_.mkString(" ")).toSeq
    val evalGrams = docs.filter(_._1 % 7 == 0).flatMap(d => grams8(d._2)).toSet
    val rows = TextDedup.decontaminateSpans(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty, "fixture must contain at least one contaminated doc")
    rows.foreach { case (id, removed, kept, cleaned) =>
      assert(id % 7 != 0, s"eval doc $id leaked into the train report")
      // a single window covers 8 words; merged covers never shrink that
      assert(removed >= 8 && removed <= byId(id).split(" ").length)
      assert(removed + kept == byId(id).split(" ").length,
        s"doc $id position accounting")
      assert(kept == (if (cleaned.isEmpty) 0 else cleaned.split(" ").length))
      // THE decontamination postcondition: no eval 8-gram survives
      assert(grams8(cleaned).forall(g => !evalGrams.contains(g)),
        s"doc $id still contains an eval 8-gram after span removal")
    }
    // full benchmark copies lose everything but still appear (0 kept)
    val evalTexts = docs.filter(_._1 % 7 == 0).map(_._2).toSet
    val got = rows.map(r => r._1 -> r._3).toMap
    docs.filter { case (id, t) =>
      id % 7 != 0 && evalTexts.contains(t) && t.split(" ").length >= 8
    }.foreach { case (id, _) =>
      assert(got.get(id).contains(0L), s"full duplicate $id must empty out")
    }
  }

  test("scalar quant: top-k recalls the unquantized code-space ranking") {
    // the real-valued score SQ8 approximates: the same shifted-scaled
    // per-dim product WITHOUT the floor — flooring is the only lossy step
    val vecs = graft.tables.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val dims = vecs.values.head.length
    val mn = (0 until dims).map(d => vecs.values.map(_(d)).min).toArray
    val mx = (0 until dims).map(d => vecs.values.map(_(d)).max).toArray
    def scaled(v: Array[Double]): Array[Double] =
      (0 until dims).map(d =>
        if (mx(d) > mn(d)) (v(d) - mn(d)) * 255.0 / (mx(d) - mn(d)) else 0.0
      ).toArray
    val q = scaled(vecs(0L))
    val idealTop = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        id -> scaled(v).zip(q).map { case (a, b) => a * b }.sum }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val quantTop = Similarity.scalarQuantTopK(spark, sf001).collect()
    assert(quantTop.length == 10)
    val dots = quantTop.map(_.getLong(1))
    assert(dots.sameElements(dots.sortBy(-_)), "qdot must be sorted desc")
    assert(!quantTop.map(_.getLong(0)).contains(0L))
    val overlap = quantTop.map(_.getLong(0)).count(idealTop)
    assert(overlap >= 8, s"8-bit quantization recall too low: $overlap/10")
  }

  test("hits: both roles, max-normalized, positive and ordered") {
    val rows = Graphs.hits(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byRole = rows.groupBy(_._1)
    assert(byRole.keySet == Set("authority", "hub"))
    byRole.foreach { case (role, rs) =>
      assert(rs.forall(_._3 > 0))
      assert(rs.map(_._4).max == 1.0, s"$role top score must normalize to 1")
      val scores = rs.map(_._3)
      assert(scores.sameElements(scores.sortBy(-_)), s"$role sorted desc")
    }
  }

  test("cep: every match valid, and complete vs driver-side brute force") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      sorted.zipWithIndex.toSeq.collect {
        case ((_, vid, "view", vus), i)
            if {
              val after = sorted.drop(i + 1)
              val pUs = after.collect { case (_, _, "purchase", us) => us }
                .sorted.headOption
              val eUs = after.collect { case (_, _, "error", us) => us }
                .sorted.headOption
              pUs.exists(p => p - vus <= 3600000000L &&
                eUs.forall(_ >= p))
            } => vid
      }
    }.toSet
    val got = Events.cepCleanConversion(spark, sf001).collect()
    assert(got.map(_.getLong(0)).toSet == expected)
    val byId = ev.map(r => r._2 -> r).toMap
    got.foreach { r =>
      val (vid, pid, gap) = (r.getLong(0), r.getLong(1), r.getLong(3))
      val v = byId(vid); val p = byId(pid)
      assert(v._3 == "view" && p._3 == "purchase" && v._1 == p._1)
      assert(p._4 - v._4 == gap && gap >= 0 && gap <= 3600000000L)
    }
  }

  test("stream keep-first dedup equals the batch min-(us,id) twin") {
    val got = graft.streaming.EventStream.streamDedupState(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .groupBy("user_id", "event_type")
      .agg(min(struct(col("us"), col("event_id"))).as("m"))
      .select(col("m.event_id"), col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSet == want.toSet)
    assert(got.length == want.length)
  }
}
