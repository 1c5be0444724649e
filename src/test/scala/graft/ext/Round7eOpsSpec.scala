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
