package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X1-X4 extension operators on small inline data. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical vectors similarity 1, orthogonal 0") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 0)
      .select(transform($"embedding", _.cast("double")).as("qv"))
    val sims = df.filter($"vec_id" =!= 0).crossJoin(q)
      .select($"vec_id",
        (Similarity.dot(transform($"embedding", _.cast("double")), $"qv") /
          (sqrt(Similarity.dot(transform($"embedding", _.cast("double")),
            transform($"embedding", _.cast("double")))) *
            sqrt(Similarity.dot($"qv", $"qv")))).as("cos"))
      .orderBy("vec_id").collect()
    assert(math.abs(sims(0).getAs[Double]("cos") - 1.0) < 1e-12)
    assert(math.abs(sims(1).getAs[Double]("cos")) < 1e-12)
  }

  test("minhash: identical docs agree on all signatures, disjoint docs on none") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val sigs = TextDedup.minhashSignatures(docs)
    val s1 = sigs.filter($"doc_id" === 1).orderBy("j").select("sig").as[String].collect()
    val s2 = sigs.filter($"doc_id" === 2).orderBy("j").select("sig").as[String].collect()
    val s3 = sigs.filter($"doc_id" === 3).orderBy("j").select("sig").as[String].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.toSeq.zip(s3.toSeq).forall { case (a, b) => a != b })
  }

  test("simhash of identical docs is identical; bitstring is 32 chars of 0/1") {
    val docs = Seq(
      (1L, "spark query engine test"), (2L, "spark query engine test"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val h = TextDedup.simhash(docs).orderBy("doc_id")
      .select("simhash").as[String].collect()
    assert(h(0) == h(1))
    assert(h.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
  }

  test("jaccard: near-identical pair found, disjoint pair absent") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"),
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val sh = TextDedup.shingles(docs)
    val card = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // doc1/doc2 share shingles; doc3 shares none
    val shared = sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).count().collect()
    assert(shared.length == 1)
    assert(shared.head.getLong(0) == 1L && shared.head.getLong(1) == 2L)
  }

  test("IVF ANN: results come only from probed cells; self excluded; bounded k") {
    val r = Similarity.ivfTopK(spark, sf001, queryId = 0L, k = 10, nProbe = 2)
      .collect()
    assert(r.length <= 10 && r.nonEmpty)
    assert(r.map(_.getAs[Long]("vec_id")).forall(_ != 0L))
    assert(r.map(_.getAs[Int]("cell")).distinct.length <= 2) // ≤ nProbe cells
    // sims sorted descending
    val sims = r.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("langid/quality agree with a scala recomputation on a fixture doc") {
    val doc0 = graft.tables.Tables.documents(spark, sf001)
      .filter($"doc_id" === 0).select("text").as[String].collect().head
    val words = doc0.split(" ")
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    val expectedStops = words.count(stop)
    val li = TextStats.langId(spark, sf001).filter($"doc_id" === 0).collect().head
    assert(li.getAs[Long]("n_words") == words.length.toLong)
    assert(li.getAs[Long]("n_stopwords") == expectedStops.toLong)
    val q = TextStats.quality(spark, sf001).filter($"doc_id" === 0).collect().head
    assert(q.getAs[Long]("n_distinct_words") == words.distinct.length.toLong)
    assert(q.getAs[Long]("n_letters") == words.map(_.length).sum.toLong)
  }
}
