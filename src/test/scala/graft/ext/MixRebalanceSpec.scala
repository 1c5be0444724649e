package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.SparkSpec

/** X52 — uniform-target mixture rebalancing: every reported column is
  * re-derived driver-side from first principles (integer thresholds, md5
  * buckets), so the test pins exact admission semantics, not just shapes.
  */
class MixRebalanceSpec extends SparkSpec {

  private def md5Bucket(docId: Long): Long = {
    val h = MessageDigest.getInstance("MD5")
      .digest(s"$docId|mix_v1".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 4), 16)
  }

  test("thresholds, keep probabilities and kept counts are exact") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val nMin = byLang.values.map(_.size).min.toLong
    val got = TextStats.mixRebalance(spark, sf001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, ids) =>
      val n = ids.size.toLong
      val threshold = 65536L * nMin / n
      val expectedKept = ids.count(md5Bucket(_) < threshold).toLong
      val (nDocs, share, keepProb, nKept) = got(lang)
      assert(nDocs == n)
      assert(math.abs(share - n.toDouble / docs.length) < 1e-6)
      assert(math.abs(keepProb - threshold.toDouble / 65536.0) < 1e-6)
      assert(nKept == expectedKept, s"$lang: kept $nKept, expected $expectedKept")
    }
    // the smallest group is never downsampled (threshold 65536 admits all)
    val minLang = byLang.minBy { case (l, ids) => (ids.size, l) }._1
    assert(got(minLang)._4 == got(minLang)._1)
  }

  test("upsample: epochs, fractional extras and emitted totals are exact") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val nMax = byLang.values.map(_.size).max.toLong
    val got = TextStats.mixUpsample(spark, sf001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, ids) =>
      val n = ids.size.toLong
      val epochs = nMax / n
      val threshold = 65536L * (nMax % n) / n
      val extras = ids.count(md5Bucket(_) < threshold).toLong
      assert(got(lang) == (n, epochs, extras, epochs * n + extras), s"$lang")
    }
    // the largest group runs exactly one epoch with no extras
    val maxLang = byLang.maxBy { case (l, ids) => (ids.size, l) }._1
    assert(got(maxLang)._2 == 1L && got(maxLang)._3 == 0L)
    // expected emitted total is within one md5-bucket quantum of n_max
    // per group: |emitted - n_max| bounded by binomial deviation; exact
    // check already done above, this guards the CONSTRUCTION intent
    got.values.foreach { case (n, epochs, _, emitted) =>
      assert(emitted >= epochs * n && emitted <= (epochs + 1) * n)
    }
  }
}
