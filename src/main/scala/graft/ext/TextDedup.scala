package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** X1/X2 — document deduplication for large-scale training-data pipelines:
  * exact (content hash), MinHash+LSH banding, SimHash, and n-gram Jaccard
  * verification.
  *
  * All operators follow the scalable shape: shingle/token explosion ->
  * hash -> band/bucket -> *bucket-local* pair join. Nothing ever forms the
  * full O(n²) pair space; candidate pairs only materialize inside a band
  * bucket (MinHash), a bit-prefix bucket (SimHash) or a shared-shingle
  * inverted-index posting (Jaccard). That is exactly the structure that
  * survives 100 TB: every stage is a hash shuffle on a well-distributed
  * key, and AQE splits any hot shingle/bucket.
  *
  * Hashes are md5-derived (deterministic, engine-portable) rather than
  * Murmur3 `hash()` so the DuckDB oracle can reproduce them bit-for-bit.
  */
object TextDedup {

  /** Distinct word n-gram shingles per document. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n)))")).as("sh"))
      .distinct()

  /** X1 — exact dedup by content hash; deterministic survivor = min doc_id
    * (DW.js:312-348's "first wins" restated set-wise).
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")

  /** MinHash signatures: sig_j = min over shingles of md5(j || shingle),
    * j = 0..numPerms-1. A lexicographic min over an md5 image is a valid
    * min-wise permutation approximation and is reproducible in any engine.
    *
    * Computed as one `numPerms`-column aggregate over the shingle relation
    * (partial-agg friendly, no ×numPerms row explosion), then unpivoted to
    * the (doc_id, j, sig) long form the banding stage consumes.
    */
  def minhashSignatures(docs: DataFrame, numPerms: Int = 8): DataFrame = {
    val sigCols = (0 until numPerms).map(j =>
      min(md5(concat(lit(s"$j|"), col("sh")))).as(s"s$j"))
    val stackArgs = (0 until numPerms).map(j => s"$j, s$j").mkString(", ")
    shingles(docs)
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        expr(s"stack($numPerms, $stackArgs) AS (j, sig)"))
  }

  /** X2 — MinHash LSH near-dup candidates: band the signature (2 rows per
    * band), bucket-join on (band, band_hash), then score candidates by
    * signature agreement. Only bucket collisions ever pair up.
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(Tables.documents(spark, dir)).cache()
    val bands = sigs
      .groupBy(col("doc_id"), expr("j div 2").as("b"))
      .agg(md5(concat(
        max(when(col("j") % 2 === 0, col("sig"))), lit("|"),
        max(when(col("j") % 2 === 1, col("sig"))))).as("band_hash"))
    val a = bands.select(col("doc_id").as("doc_a"), col("b"), col("band_hash"))
    val b = bands.select(col("doc_id").as("doc_b"), col("b"), col("band_hash"))
    val cand = a.join(b, Seq("b", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sa = sigs.select(col("doc_id").as("doc_a"), col("j"), col("sig").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("j"), col("sig").as("sig_b"))
    cand.join(sa, Seq("doc_a")).join(sb, Seq("doc_b", "j"))
      .groupBy("doc_a", "doc_b")
      .agg((sum(when(col("sig_a") === col("sig_b"), 1).otherwise(0))
        .cast("double") / 8).as("est_sim"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash: 32-bit signature from token md5s — bit i is the sign of the
    * token-vote sum where a token votes +1 if hex digit i of its md5 has
    * its high bit set. Surfaced as a '0'/'1' string for portability.
    */
  def simhash(docs: DataFrame): DataFrame = {
    // md5 computed once per token; the 32 bit-votes are 32 aggregate
    // expressions over it (single shuffle on doc_id, partial-agg friendly —
    // not a ×32 row explosion).
    val hexHigh = Set('8', '9', 'a', 'b', 'c', 'd', 'e', 'f').map(_.toString).toSeq
    val voteCols = (1 to 32).map(i =>
      when(sum(when(substring(col("h"), i, 1).isin(hexHigh: _*), 1)
        .otherwise(-1)) >= 0, "1").otherwise("0").as(s"b$i"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        concat((1 to 32).map(i => col(s"b$i")): _*).as("simhash"))
  }

  def simhashQuery(spark: SparkSession, dir: String): DataFrame =
    simhash(Tables.documents(spark, dir)).orderBy("doc_id")

  /** End-to-end curation: the composed training-data pipeline — quality
    * gate (X4) -> near-dup removal via MinHash candidates (X2, drop the
    * higher doc_id of every confident pair) -> per-language corpus stats.
    * One query a data-curation user actually runs; every stage is the
    * operator implemented above, unchanged.
    */
  def curationPipeline(spark: SparkSession, dir: String,
                       simThreshold: Double = 0.75): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val quality = TextStats.quality(spark, dir)
      .select(col("doc_id"), col("n_words"), col("quality_score"))
    val dropDups = minhashPairs(spark, dir)
      .filter(col("est_sim") >= simThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(quality, Seq("doc_id"))
      .filter(col("quality_score") >= 0.2 && col("n_words") >= 20)
      .join(dropDups, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        // scores are exact 6-decimal doubles (post-round): the decimal cast
        // is lossless and makes the sum order-independent
        round(sum(col("quality_score")
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double") / count(lit(1)), 6).as("avg_quality"))
      .orderBy("lang")
  }

  /** X2 via spark.ml — the MinHashLSH estimator pipeline (shingles ->
    * HashingTF sparse vectors -> MinHashLSH -> approxSimilarityJoin).
    * Hash family is Spark-internal (seeded, deterministic) so this entry
    * is rows-only checked rather than DuckDB-oracled; [[minhashPairs]] is
    * the engine-portable twin. This is the path that scales candidate
    * generation with `approxSimilarityJoin`'s internal banding.
    */
  def mlMinhashPairs(spark: SparkSession, dir: String,
                     maxDistance: Double = 0.5): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val sh = shingles(Tables.documents(spark, dir))
      .groupBy("doc_id").agg(collect_list("sh").as("shs"))
    val tf = new HashingTF().setInputCol("shs").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(sh)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, maxDistance, "dist")
      .select(col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        round(lit(1.0) - col("dist"), 6).as("est_jaccard"))
      .filter(col("doc_a") < col("doc_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** X1 under skew — the salted two-phase form of [[exact]]: partial
    * aggregation on (md5, salt) spreads a pathological hot hash over
    * `salts` reducers before the final per-md5 combine. Identical output;
    * at 100 TB this (or AQE skew splitting) is what keeps one viral
    * document from stalling a straggler reducer.
    */
  def exactSalted(spark: SparkSession, dir: String, salts: Int = 8): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_md5"),
        pmod(col("doc_id"), lit(salts)).as("salt"))
      .agg(min("doc_id").as("partial_keep"), count(lit(1)).as("partial_n"))
      .groupBy("content_md5")
      .agg(min("partial_keep").as("keep_doc_id"),
        sum("partial_n").as("n_copies"))
      .orderBy("keep_doc_id")

  /** X2 verification — exact n-gram Jaccard over candidate pairs from a
    * shared-shingle inverted index (set-similarity join). `threshold`
    * bounds the output; the inverted index bounds the pair space.
    */
  def jaccardPairs(spark: SparkSession, dir: String,
                   threshold: Double = 0.6): DataFrame = {
    val sh = shingles(Tables.documents(spark, dir)).cache()
    val card = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
    val inter = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("both"))
    val jac = col("both").cast("double") /
      (col("na") + col("nb") - col("both"))
    inter
      .join(card.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(card.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }
}
