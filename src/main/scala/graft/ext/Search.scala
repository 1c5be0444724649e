package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** X4+ — keyword relevance search over `documents`: BM25 scoring with a
  * fixed query-term set and a bounded top-k.
  *
  * Shape choice: for a SMALL fixed query (a handful of terms), per-doc
  * term frequencies are narrow `filter(ws, w -> w = t)` array
  * expressions — the corpus is scanned once with zero shuffles, and the
  * only aggregations are one single-row corpus-stats row (broadcast back
  * via crossJoin) and the final bounded top-k, which plans as
  * TakeOrderedAndProject (per-partition heaps, no global sort). A large /
  * dynamic vocabulary would instead use the inverted posting-list
  * relation (explode → groupBy term), the same shape as
  * [[TextDedup]]'s shingle-occurrence relation.
  *
  * Cross-engine float parity: `dl` is an integral double (token count),
  * so `AVG(dl)` sums exactly in any partition order; the per-doc score is
  * a fixed left-to-right sum of three terms, associated identically in
  * the DuckDB twin. Ordering uses the UNROUNDED score (ties are exactly
  * equal doubles in both engines, broken by doc_id); only the projected
  * output is rounded.
  */
object Search {

  /** BM25 (Robertson/Spärck Jones; the +1-inside-ln variant so idf stays
    * positive for df > N/2) over whitespace tokens.
    */
  def bm25TopK(spark: SparkSession, dir: String,
               terms: Seq[String] = Seq("spark", "join", "window"),
               k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 10): DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .select(Seq(col("doc_id"),
        size(col("ws")).cast("double").as("dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          size(expr(s"filter(ws, w -> w = '$t')")).cast("double").as(s"tf$i")
        }: _*)
    val statsCols =
      Seq(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl")) ++
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double")
            .as(s"df$i"))
    val stats = perDoc.agg(statsCols.head, statsCols.tail: _*)
    // Per-term BM25 contribution; the total is the left-to-right sum the
    // oracle twin spells out in the same order.
    def contrib(i: Int): String =
      s"ln(1 + (n_docs - df$i + 0.5) / (df$i + 0.5)) * " +
        s"(tf$i * ${k1 + 1.0}) / (tf$i + $k1 * (1 - $b + $b * dl / avgdl))"
    val scoreExpr = terms.indices.map(contrib).mkString(" + ")
    val matchedExpr = terms.indices
      .map(i => s"(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score_raw", expr(scoreExpr))
      .filter(col("score_raw") > 0)
      .orderBy(col("score_raw").desc, col("doc_id"))
      .limit(topK)
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        expr(matchedExpr).cast("long").as("n_matched"),
        round(col("score_raw"), 6).as("score"))
  }
}
