package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the second round-6 operator batch beyond what the DuckDB
  * oracles pin (those already prove value equality): Pareto prefix
  * structure, DSIR feature accounting and slice exclusion, centroid
  * cosine geometry, semantic-cluster/pair-graph consistency, and the
  * capped-session rollup identity back onto plain sessionization.
  */
class Round6bOpsSpec extends SparkSpec {

  test("pareto coverage: cum is a permutation prefix sum; flag is a prefix") {
    val rows = TextStats.paretoCoverage(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    // ordered output: cum strictly increases by exactly n_tokens
    rows.sliding(2).withFilter(_.length == 2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(b._3 - b._2 == a._3, s"gap at doc ${b._1}")
    }
    assert(rows.head._3 == rows.head._2)
    // the 80% membership is a PREFIX of the size order: never true
    // again after the first false
    val flags = rows.map(_._4)
    assert(flags.head, "the largest doc always starts inside the budget")
    assert(!flags.dropWhile(identity).contains(true), "flag must be a prefix")
    // the flagged set is minimal-by-construction: the last flagged doc
    // STARTS before the 80% point, the first unflagged one doesn't
    val total = rows.last._3
    val lastIn = rows.takeWhile(_._4).last
    assert((lastIn._3 - lastIn._2) * 5 < total * 4)
  }

  test("dsir: target slice never scored; n_feats = unigrams + bigrams") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        expr("filter(split(lower(text), '[^a-z]+'), t -> t <> '')").as("ws"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    val got = LangModel.dsirWeights(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = docs.filter(_._2 != "src0")
    assert(got.keySet == raw.map(_._1).toSet, "exactly the raw slice is scored")
    raw.foreach { case (id, _, ws) =>
      val want = ws.length + math.max(ws.length - 1, 0)
      assert(got(id) == want, s"doc $id feature count")
    }
  }

  test("centroid similarity: full label pair matrix, cosine within [-1, 1]") {
    val nLabels = graft.tables.Tables.embeddings(spark, sf001)
      .select("label").distinct().count()
    val rows = Similarity.centroidSim(spark, sf001).collect()
    assert(rows.length == nLabels * (nLabels - 1) / 2)
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0 && r.getInt(0) < r.getInt(1))
    }
  }

  test("semantic clusters: pair endpoints co-labeled, sizes partition, min id canonical") {
    val pairs = Similarity.embedCosinePairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = Similarity.semanticClusters(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val label = rows.map(r => r._1 -> r._2).toMap
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"pair ($a,$b) split across clusters")
    }
    // every row carries its cluster's true cardinality
    val bySize = rows.groupBy(_._2).map { case (c, rs) => c -> rs.length.toLong }
    rows.foreach(r => assert(r._3 == bySize(r._2)))
    // canonical = the min id of its cluster, exactly one per cluster
    val mins = rows.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._1).min }
    rows.foreach(r => assert(r._4 == (r._1 == mins(r._2))))
    assert(rows.count(_._4) == bySize.size)
  }

  test("novelty: the first document is fully novel; ratios in (0, 1]") {
    val rows = TextDedup.noveltyScore(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val first = rows.minBy(_._1)
    assert(first._2 == first._3 && first._4 == 1.0,
      "every shingle of the minimum doc_id first-occurs there")
    rows.foreach { case (id, n, novel, ratio) =>
      assert(novel >= 0 && novel <= n && ratio >= 0.0 && ratio <= 1.0, s"doc $id")
    }
  }

  test("source overlap: full pair matrix, coefficient laws") {
    val k = graft.tables.Tables.documents(spark, sf001)
      .select("source").distinct().count()
    val rows = TextDedup.sourceOverlap(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // sparse pairs with zero shared shingles may be absent; never more
    // than the full matrix
    assert(rows.length <= k * (k - 1) / 2 && rows.nonEmpty)
    rows.foreach { case (a, b, na, nb, shared, coef) =>
      assert(a < b && shared <= math.min(na, nb) && coef > 0.0 && coef <= 1.0)
    }
  }

  test("label prop: labels are member node ids; sizes partition the node set") {
    val rows = Graphs.labelProp(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byComm = rows.groupBy(_._2)
    rows.foreach(r => assert(r._3 == byComm(r._2).length.toLong))
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("attribution: purchase count and revenue are conserved") {
    val ev = graft.tables.Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), sum(col("value").cast("decimal(18,2)")))
      .head()
    val rows = Events.attribution(spark, sf001).collect()
    assert(rows.map(_.getLong(1)).sum == ev.getLong(0))
    val got = BigDecimal(rows.map(r => BigDecimal(r.getDouble(2))).sum.toString)
    assert((got - BigDecimal(ev.getDecimal(1).toString)).abs < BigDecimal("0.01"))
  }

  test("trimmed mean: integer-rank cut counts; trimmed within [min, max]") {
    val rows = Analytics.trimmedMean(spark, sf001).collect()
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      // #{rn : rn*10 > n && rn*10 <= 9n} counted directly
      val want = (1L to n).count(rn => rn * 10 > n && rn * 10 <= 9 * n)
      assert(kept == want, s"${r.getString(0)}: kept $kept want $want")
      assert(!r.getDouble(3).isNaN && !r.getDouble(4).isNaN)
    }
  }

  test("vocab coverage: ratios in [0,1]; token totals match the tokenizer") {
    val rows = TextStats.vocabCoverage(spark, sf001).collect()
    val want = graft.tables.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        size(expr("filter(split(lower(text), '[^a-z]+'), t -> t <> '')"))
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == want(r.getLong(0)))
      assert(r.getLong(2) <= r.getLong(1) && r.getDouble(3) <= 1.0)
    }
  }

  test("bucket assignment: depths are equal within ceil slack; ranges disjoint") {
    val rows = Analytics.bucketAssign(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 8L))
    val n = rows.map(_._2).sum
    // exact equi-depth: every bucket holds between floor and ceil of n/8
    // (+1 slack for boundary-tie pile-up on duplicate values; prices at
    // this SF are near-distinct)
    rows.foreach { case (b, cnt, _, _) =>
      assert(math.abs(cnt - n / 8.0) <= n / 8.0 * 0.02 + 2, s"bucket $b: $cnt")
    }
    rows.sliding(2).withFilter(_.length == 2).foreach { w =>
      assert(w(0)._4 <= w(1)._3, "bucket value ranges must not interleave")
    }
  }

  test("top paths: counts descend; paths have at most 3 steps") {
    val rows = Events.topPaths(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.sliding(2).withFilter(_.length == 2).foreach { w =>
      assert(w(0)._2 > w(1)._2 || (w(0)._2 == w(1)._2 && w(0)._1 < w(1)._1))
    }
    rows.foreach { case (p, _) => assert(p.split(">").length <= 3) }
  }

  test("degree distribution: cumulative share reaches exactly 1") {
    val rows = Graphs.degreeDist(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.last._3 == rows.map(_._2).sum && rows.last._4 == 1.0)
    rows.sliding(2).withFilter(_.length == 2).foreach { w =>
      assert(w(1)._3 - w(1)._2 == w(0)._3, "cum must telescope")
    }
  }

  test("greedy throttle vs window debounce: the burst case that separates them") {
    import spark.implicits._
    // one user, one type, events 40 min apart: the lag-window debounce
    // (X71) keeps only the burst start; the sequential greedy (X95)
    // admits #1 (t=0) and #3 (t=80min >= 1h since #1) — the recurrence
    // on ADMITTED events, not a window over raw ones
    val min40 = 40L * 60 * 1000000
    val tmp = java.nio.file.Files.createTempDirectory("thr")
    // the stream source globs for a FILE named events.parquet (the
    // fixture layout); stage the single part file under that name
    val stage = java.nio.file.Files.createTempDirectory("thr-stage")
    (0 to 2).map(i => (i.toLong, i * min40 * 1000, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = {
      val s = java.nio.file.Files.list(stage)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst.get
      finally s.close()
    }
    java.nio.file.Files.move(part, tmp.resolve("events.parquet"))
    val greedy = graft.streaming.EventStream.throttleGreedy(spark, tmp.toString)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val window = Events.throttleDedup(spark, tmp.toString)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(greedy.toSeq == Seq(0L, 2L), s"greedy got ${greedy.toSeq}")
    assert(window.toSeq == Seq(0L), s"window got ${window.toSeq}")
  }

  test("weighted sample: size-biased — the sample is heavier than the corpus") {
    val rows = TextStats.weightedSample(spark, sf001).collect()
    assert(rows.length == 50 &&
      rows.map(_.getLong(1)).distinct.length == 50)
    val sampleMean = rows.map(_.getLong(3).toDouble).sum / rows.length
    val corpusMean = graft.tables.Tables.documents(spark, sf001)
      .agg(avg("n_chars")).head().getDouble(0)
    // A-Res with w = n_chars: inclusion probability grows with weight,
    // so the sampled mean weight must exceed the corpus mean (a
    // deterministic fact of this fixed hash + corpus, not a flaky
    // statistical assertion)
    assert(sampleMean > corpusMean, s"$sampleMean vs $corpusMean")
  }

  test("quantile normalization: monotone within language; top maps to global top") {
    val rows = TextStats.quantileNormalize(spark, sf001).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4),
        r.getDouble(2), r.getDouble(5)))
    val globalMax = rows.map(_._4).max
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_._2)
      byRank.sliding(2).withFilter(_.length == 2).foreach { w =>
        assert(w(0)._5 <= w(1)._5, s"$lang: norm_score must be monotone in rank")
      }
      // the in-group top doc lands on the global maximum score
      assert(byRank.last._5 == globalMax, s"$lang top")
    }
  }

  test("multi-probe LSH dominates single-bucket LSH (superset candidate set)") {
    val single = Similarity.annLshTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val multi = Similarity.annMultiProbeTopK(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getDouble(3)))
    assert(multi.nonEmpty && multi.length <= 10)
    // the probe set is a superset of the home bucket, so the best
    // multi-probe hit can never be worse than the best single-bucket hit
    if (single.nonEmpty)
      assert(multi.head._3 >= single.head._2)
    // every multi-probe result from the home bucket also appears in the
    // single-bucket candidate ranking (same bucket, same scoring)
    val singleIds = single.map(_._1).toSet
    multi.filter(_._2).foreach { case (id, _, cos) =>
      assert(singleIds.contains(id) || cos <= single.last._2,
        s"home-bucket hit $id missing from the single-bucket top-k")
    }
  }

  test("capped sessions roll back up to plain sessions; sub spans bounded by cap") {
    val cap = 10L * 60 * 1000000
    val capped = Events.sessionizeCapped(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getLong(4), r.getLong(5))))
    // every sub-session fits inside one cap window
    capped.foreach { case (_, (_, s, e)) => assert(e - s < cap) }
    // re-aggregating the cap splits reproduces sessionize exactly
    val rolled = capped.groupBy(_._1).map { case (k, subs) =>
      k -> (subs.map(_._2._1).sum, subs.map(_._2._2).min, subs.map(_._2._3).max)
    }
    val plain = Events.sessionize(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rolled == plain)
  }
}
