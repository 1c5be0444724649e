package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X50/X51 — unigram-LM cross-entropy and BPE pair mining, checked
  * against independent driver-side recomputation from first principles
  * (the fixture vocabulary is small enough to collect).
  */
class LangModelSpec extends SparkSpec {

  private def docTokens(): Map[Long, Seq[String]] =
    graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z]+").toSeq.filter(_.nonEmpty))
      .toMap

  test("cross-entropy matches a from-scratch driver-side model") {
    val toks = docTokens()
    val counts = toks.values.flatten
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val n = counts.values.sum.toDouble
    val v = counts.size.toDouble
    def p(w: String): Double = (counts(w) + 1.0) / (n + v)
    val expected = toks.collect { case (id, ws) if ws.nonEmpty =>
      id -> -ws.map(w => math.log(p(w)) / math.log(2.0)).sum / ws.size
    }
    val got = LangModel.lmCrossEntropy(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expected.size)
    got.foreach { case (id, nTok, bits) =>
      assert(nTok == toks(id).size)
      assert(math.abs(bits - expected(id)) < 1e-5,
        s"doc $id: got $bits, expected ${expected(id)}")
    }
    // smoothing bound: no token can cost more than the rarest possible
    assert(got.forall { case (_, _, b) =>
      b > 0 && b <= math.log(n + v) / math.log(2.0) + 1e-9 })
  }

  test("BPE pair mining equals exact type-weighted pair counts, ties broken") {
    val wc = docTokens().values.flatten.filter(_.length >= 2)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val pairFreq = wc.toSeq
      .flatMap { case (w, c) => w.sliding(2).map(_ -> c) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val expected = pairFreq.toSeq
      .sortBy { case (pair, f) => (-f, pair) }.take(20)
    val got = LangModel.bpeMerges(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.forall(_._1.length == 2))
  }
}
