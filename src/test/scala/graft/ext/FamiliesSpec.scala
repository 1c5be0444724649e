package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-checks for the expression-family entries that go beyond what the
  * value oracle states: structural invariants tying them back to the
  * fixture's own columns.
  */
class FamiliesSpec extends SparkSpec {

  test("array HOF family: token lengths reconstruct n_chars exactly") {
    // space-separated text ⟹ Σ token_len == n_chars - (n_tokens - 1)
    val bad = TextStats.arrayHofFamily(spark, sf001)
      .join(graft.tables.Tables.documents(spark, sf001), "doc_id")
      .filter(col("total_len") =!= col("n_chars") - (col("n_tokens") - 1))
    assert(bad.isEmpty)
  }

  test("bernoulli sample: every kept bucket under threshold, rate ~ 16/256") {
    val docs = graft.tables.Tables.documents(spark, sf001).count().toDouble
    val kept = TextStats.bernoulliSample(spark, sf001)
    assert(kept.filter(col("bucket") >= "10").isEmpty)
    val rate = kept.count() / docs
    assert(rate > 0.01 && rate < 0.15, s"sample rate $rate implausible for 6.25%")
  }

  test("generator family: positions are dense 0..n-1 per doc") {
    val shape = TextStats.generatorTokens(spark, sf001)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(shape.isEmpty)
  }

  test("set ops ALL: multiplicities obey max(0,a-b) / min(a,b) per user") {
    val ev = graft.tables.Tables.events(spark, sf001)
    def counts(t: String) = ev.filter(col("event_type") === t)
      .groupBy("user_id").agg(count(lit(1)).as(s"n_$t"))
    val expected = counts("view").join(counts("click"), Seq("user_id"), "full_outer")
      .na.fill(0L)
      .select(col("user_id"),
        greatest(col("n_view") - col("n_click"), lit(0L)).as("exp_except"),
        least(col("n_view"), col("n_click")).as("exp_intersect"))
    val got = Analytics.setOpsAll(spark, sf001)
      .groupBy("user_id")
      .pivot("op", Seq("except_all", "intersect_all")).sum("n")
      .na.fill(0L)
    val bad = got.join(expected, Seq("user_id"), "full_outer").na.fill(0L)
      .filter(col("except_all") =!= col("exp_except") ||
        col("intersect_all") =!= col("exp_intersect"))
    assert(bad.isEmpty)
  }
}
