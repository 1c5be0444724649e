package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X49 — incremental (batch-vs-corpus) dedup: branch coverage on the
  * fixture split and value-equality with the bloom-free exact form (the
  * prefilter must be invisible in the results).
  */
class IncrementalDedupSpec extends SparkSpec {

  test("fixture split populates corpus-dup, batch-dup and keep branches") {
    val out = TextDedup.incrementalDedup(spark, sf001)
    val rows = out.collect()
    assert(rows.length == 50) // doc_id % 10 == 0 batch
    val corpusDups = rows.filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val batchDups = rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val keeps = rows.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    // doc_id%17==5 ∧ doc_id%10==0 → 90 (dup_2), 260 (dup_0), 430 (dup_2):
    // all three keys exist in the corpus; 430 repeats 90's key in-batch
    assert(corpusDups == Set(90L, 260L, 430L))
    assert(batchDups == Set(430L))
    assert(keeps.size == 47 && !keeps.exists(corpusDups))
  }

  test("bloom prefilter is value-invisible: equals the plain exact join") {
    val keyed = graft.tables.Tables.documents(spark, sf001).select(
      col("doc_id"),
      when(col("doc_id") % 17 === 5,
        md5(concat(lit("dup_"), (col("doc_id") % 4).cast("string"))))
        .otherwise(md5(col("text"))).as("h"))
    val corpus = keyed.filter(col("doc_id") % 10 =!= 0).select("h").distinct()
    val batch = keyed.filter(col("doc_id") % 10 === 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val plain = batch
      .join(corpus.withColumn("in_corpus", lit(true)), Seq("h"), "left")
      .withColumn("in_corpus", coalesce(col("in_corpus"), lit(false)))
      .withColumn("first_id", min("doc_id").over(w))
      .select(col("doc_id"), col("in_corpus").as("dup_in_corpus"),
        (col("doc_id") =!= col("first_id")).as("dup_in_batch"),
        (!col("in_corpus") && col("doc_id") === col("first_id")).as("keep"))
      .orderBy("doc_id")
      .collect().toSeq.map(_.toSeq)
    val bloomed = TextDedup.incrementalDedup(spark, sf001)
      .collect().toSeq.map(_.toSeq)
    assert(bloomed == plain)
  }
}
