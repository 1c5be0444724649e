package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-5 operators
  * (X180–X184).
  */
class Round8eOpsSpec extends SparkSpec {

  // Spark's round(double, 6) = scala.BigDecimal(double) (exact binary
  // expansion under DECIMAL128) setScale HALF_UP
  private def q6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  // Spark's round(decimal, 6) stays in exact decimal
  private def r6d(b: BigDecimal): BigDecimal =
    b.setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def quantized(): Map[(Long, Int), (Int, Array[BigDecimal])] =
    graft.tables.Tables.embeddings(spark, sf001).collect().map { r =>
      val vec = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(v => q6(v.toDouble)).toArray
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label")) ->
        (r.getAs[Int]("label"), vec)
    }.toMap

  test("embed outliers equal an in-JVM exact-decimal recomputation") {
    val vecs = quantized().map { case ((id, _), (lab, v)) => (id, lab, v) }
    val dims = vecs.head._3.length
    val byLabel = vecs.groupBy(_._2)
    val cents = byLabel.map { case (lab, g) =>
      lab -> Array.tabulate(dims) { d =>
        // impl casts the decimal sum to double BEFORE the IEEE division
        val s = g.map(_._3(d)).sum
        q6(s.toDouble / g.size)
      }
    }
    val expect = byLabel.flatMap { case (lab, g) =>
      g.map { case (id, _, v) =>
        val c = cents(lab)
        val d2 = v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
        (lab, id, d2)
      }.toSeq.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((l, id, d2), i) =>
          (l, i + 1L, id, q6(d2.toDouble).toDouble) }
    }.toSet
    val got = Similarity.embedOutliers(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
  }

  test("pca power iteration matches an in-JVM decimal replay") {
    val vecs = quantized().values.map(_._2).toArray
    val dims = vecs.head.length
    val n = vecs.length
    val mu = Array.tabulate(dims)(d => q6(vecs.map(_(d)).sum.toDouble / n))
    // cov round is a DECIMAL-typed round in the impl — no double transit
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      r6d(vecs.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum)
    }
    var v = Array.fill(dims)(BigDecimal(1))
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cov(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = w.map(wj => q6(wj.toDouble / mx.toDouble))
    }
    val got = Similarity.embedPcaPower(spark, sf001).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    assert(got.size == dims)
    (1 to dims).foreach { d =>
      assert(got(d) == v(d - 1).toDouble, s"dim $d")
    }
  }

  test("ks statistic equals a brute-force ecdf comparison") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max + 1) / 2
    val got = DataQuality.ksTest(spark, sf001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    ev.groupBy(_._1).foreach { case (t, g) =>
      val a = g.filter(_._2 < mid).map(_._3).sorted
      val b = g.filter(_._2 >= mid).map(_._3).sorted
      val pooled = (a ++ b).distinct.sorted
      val dnum = pooled.map { v =>
        math.abs(a.count(_ <= v).toLong * b.length -
          b.count(_ <= v).toLong * a.length)
      }.max
      val (na, nb, ks) = got(t)
      assert(na == a.length.toLong && nb == b.length.toLong, t)
      assert(ks == math.rint(
        dnum.toDouble / (na.toDouble * nb.toDouble) * 1e6) / 1e6, t)
    }
  }

  test("forecast backtest errors recompute from the daily counts") {
    val daily = graft.tables.Tables.events(spark, sf001)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val got = Events.forecastBaseline(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val errs = daily.collect {
        case ((`t`, d), c) if daily.contains((t, d - 7)) =>
          c - daily((t, d - 7))
      }.toSeq
      assert(r.getAs[Long]("n_days") == errs.length.toLong)
      assert(r.getAs[Long]("total_abs_err") == errs.map(math.abs).sum)
      assert(r.getAs[Long]("bias") == errs.sum)
      assert(r.getAs[Double]("rmse") == math.rint(math.sqrt(
        errs.map(e => e * e).sum.toDouble / errs.length) * 1e6) / 1e6)
    }
  }

  test("perplexity sweep is consistent with the scorer relation") {
    val ppl = LangModel.perplexity3(spark, sf001)
      .select("doc_id", "n_trigrams", "perplexity").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    val got = LangModel.perplexitySweep(spark, sf001).collect()
    info(s"ppl range on fixture: ${ppl.map(_._2).min} .. ${ppl.map(_._2).max}")
    assert(got.length == 6)
    var prev = -1L
    got.foreach { r =>
      val t = r.getDouble(0)
      val kept = ppl.filter(_._2 <= t)
      assert(r.getAs[Long]("docs_kept") == kept.length.toLong, s"T=$t")
      assert(r.getAs[Long]("tris_kept") == kept.map(_._1).sum, s"T=$t")
      assert(r.getAs[Long]("docs_kept") >= prev, "curve must be nondecreasing")
      prev = r.getAs[Long]("docs_kept")
    }
    // the bracket carries signal: neither all-in nor all-out at the ends
    assert(got.head.getAs[Long]("docs_kept") > 0)
    assert(got.last.getAs[Long]("docs_kept") == ppl.length.toLong)
  }
}
