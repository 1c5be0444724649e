package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the scale-critical queries
  * so pushdown / broadcast / codegen can be audited (`sbt "runMain
  * graft.PlanCheck [names...]"`).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_q1", "tpch_q3_top10", "sync_match_pass1",
        "embed_cosine_topk", "events_tumbling", "dedup_minhash_pairs")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
