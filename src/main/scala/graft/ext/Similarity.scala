package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** X3 — vector similarity search over the `embeddings` table
  * (`embedding ARRAY<FLOAT>`, dim 64).
  *
  * Three tiers, in ascending scale:
  *  - [[cosineTopK]]: brute-force scan vs one broadcast query vector —
  *    the exact baseline; O(n) scan, no shuffle, top-k via
  *    TakeOrderedAndProject (Catalyst turns ORDER BY+LIMIT into a
  *    per-partition heap + driver merge, never a global sort).
  *  - [[annLshTopK]]: sign-LSH (axis hyperplanes on the leading dims)
  *    bucketing — candidates restricted to the query's bucket; the
  *    bucket column is what you'd persist/bucket-by at 100 TB.
  *  - [[knnJoin]]: batch k-NN for a query set, cosine + per-query window
  *    top-k; at scale the same plan runs per LSH bucket instead of
  *    cross-join (swap `candidates` for the bucket join).
  *
  * Math is float->double element casts + a sequential fold — deterministic
  * and bit-identical across engines (verified against DuckDB's
  * list_dot_product), so the oracle can compare on rounded values.
  */
object Similarity {

  /** Left-fold dot product of two ARRAY<DOUBLE> columns via higher-order
    * functions — the composable baseline; [[graft.functions.CosineSim]]
    * is the fused codegen kernel used by the queries (same fold order,
    * bit-identical results).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  private def dbl(c: Column): Column = transform(c, _.cast("double"))

  private def cosine(e: Column, q: Column): Column =
    graft.functions.CosineSim.cosine(e, q)

  /** Exact top-k by cosine against the query vector `queryId`. */
  def cosineTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
                 k: Int = 20): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === queryId)
      .select(dbl(col("embedding")).as("qv"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(dbl(col("embedding")), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Sign-LSH bucket id: '0'/'1' signs of the first `bits` dimensions. */
  def signBucket(e: Column, bits: Int = 8): Column =
    concat((1 to bits).map(i =>
      when(element_at(e, i) >= 0, "1").otherwise("0")): _*)

  /** ANN: restrict candidates to the query's sign-LSH bucket, then exact
    * cosine within it.
    */
  def annLshTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
                 k: Int = 10): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val b = Tables.embeddings(spark, dir)
      .withColumn("bucket", signBucket(col("embedding")))
    val q = b.filter(col("vec_id") === queryId)
      .select(dbl(col("embedding")).as("qv"), col("bucket").as("qb"))
    b.crossJoin(broadcast(q))
      .filter(col("bucket") === col("qb") && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("bucket"),
        round(cosine(dbl(col("embedding")), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-style ANN: coarse-quantize vectors into inverted lists (the
    * fixture's `label` column stands in for a k-means cell assignment),
    * rank cells by centroid distance to the query, then search only the
    * `nProbe` nearest cells. At 100 TB the inverted lists are the
    * partitioning key — a probe touches nProbe partitions instead of the
    * full corpus. Rows-only checked (centroid float averaging is
    * reduction-order dependent, so no cross-engine oracle).
    */
  def ivfTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
              k: Int = 10, nProbe: Int = 2): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), dbl(col("embedding")).as("v"))
    // element-wise centroid per cell
    val centroids = emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("cx"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        _.getField("cx")).as("centroid"))
    val q = emb.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    val probed = centroids.crossJoin(broadcast(q))
      .select(col("label"), col("qv"),
        cosine(col("centroid"), col("qv")).as("c_sim"))
      .orderBy(col("c_sim").desc, col("label"))
      .limit(nProbe)
      .select(col("label"), col("qv"))
    emb.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        round(cosine(col("v"), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch k-NN: top-`k` neighbours for every query vector (vec_id <
    * `nQueries`) via broadcast of the query set + per-query window top-k.
    */
  def knnJoin(spark: SparkSession, dir: String, nQueries: Long = 20L,
              k: Int = 5): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), dbl(col("embedding")).as("qv"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(dbl(col("embedding")), col("qv")), 6).as("cos_sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy("q_id", "rk")
  }
}
