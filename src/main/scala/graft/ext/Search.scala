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

  /** X216: posting-list BM25 — the dynamic-vocabulary form the
    * [[bm25TopK]] scaladoc reserves: instead of per-doc narrow tf
    * arrays (right for a handful of literal terms, wrong for a query
    * that arrives at runtime), the scoring rides the (doc, term, tf)
    * POSTING relation — the query-term semi-join prunes it to |query|
    * postings' worth of rows BEFORE any scoring work, so at 100 TB
    * this is a posting-list read plus a doc-keyed accumulation, never
    * a corpus scan per query. df falls out of the pruned postings
    * (df(t) = posting length), corpus stats (N, avgdl) are one
    * broadcast row shared with the fixed form.
    *
    * Float discipline: the per-(doc, term) contribution is the SAME
    * fixed IEEE expression string as [[bm25TopK]]; the per-doc total
    * is NOT an unordered float sum — matched terms pivot back to one
    * fixed column per query term (max-of-one-row per (doc, term)) and
    * sum left-to-right in query order, so the score is bit-identical
    * to the fixed-term form on the same query (the agreement
    * Round9OpsSpec pins) and hash-stable under any partitioning.
    *
    * Scale shape: one corpus-wide (doc, term) count builds the posting
    * relation (at 100 TB it is the materialized X57 index, written
    * once, term-partitioned); per query: an `isin` prune at the scan,
    * a broadcast df/stats attach, one doc-keyed pivot aggregate, and a
    * TakeOrderedAndProject top-k.
    */
  def bm25Posting(spark: SparkSession, dir: String,
                  terms: Seq[String] = Seq("spark", "join", "window"),
                  k1: Double = 1.2, b: Double = 0.75,
                  topK: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("dl"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      avg("dl").as("avgdl"))
    // the posting relation, pruned to the query terms at the scan
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    // the bm25TopK contribution expression verbatim (generic columns)
    val contrib =
      s"ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * " +
        s"(tf * ${k1 + 1.0}) / (tf + $k1 * (1 - $b + $b * dl / avgdl))"
    val pivotCols = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("contrib"))).as(s"c$i")
    }
    val scoreExpr = terms.indices
      .map(i => s"coalesce(c$i, cast(0.0 as double))").mkString(" + ")
    tf.join(broadcast(df), Seq("term"))
      .join(docs, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(contrib))
      .groupBy("doc_id", "dl")
      .agg(pivotCols.head, (pivotCols.tail :+
        count(lit(1)).as("n_matched")): _*)
      .withColumn("score_raw", expr(scoreExpr))
      .filter(col("score_raw") > 0)
      .orderBy(col("score_raw").desc, col("doc_id"))
      .limit(topK)
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        col("n_matched"), round(col("score_raw"), 6).as("score"))
  }

  /** Collocation mining: the top co-occurring token pairs by document
    * co-frequency, scored with PMI. The pair space is generated by a
    * per-document self-join of the DISTINCT token relation — shuffled
    * once on doc_id, so the blow-up is bounded by (distinct tokens per
    * doc)² locally, never corpus² (at 100 TB the guard is a per-doc
    * distinct-token cap upstream, the same lever the shingle stages
    * use). df products stay integral so ordering ties are exact; PMI's
    * single ln over an integral ratio is the established round-6 parity
    * surface.
    */
  def collocations(spark: SparkSession, dir: String,
                   topK: Int = 20, minDf: Int = 5): DataFrame = {
    val dw = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val wdf = dw.groupBy("w").agg(count(lit(1)).as("dfw"))
    val a = dw.select(col("doc_id"), col("w").as("w1"))
    val b = dw.select(col("doc_id"), col("w").as("w2"))
    a.join(b, Seq("doc_id")).filter(col("w1") < col("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("dfp"))
      .filter(col("dfp") >= minDf)
      .join(broadcast(wdf.select(col("w").as("w1"), col("dfw").as("dfw1"))), Seq("w1"))
      .join(broadcast(wdf.select(col("w").as("w2"), col("dfw").as("dfw2"))), Seq("w2"))
      .crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("dfp"), col("dfw1"), col("dfw2"),
        round(expr("ln(cast(dfp as double) * n_docs / (dfw1 * dfw2))"), 6)
          .as("pmi"))
      .orderBy(col("dfp").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** X57: inverted-index materialization — the posting-list relation the
    * [[bm25TopK]] scaladoc reserves for dynamic vocabularies, built as a
    * first-class artifact: one row per term with document frequency and
    * the SORTED posting list (id-ordered, the property merge-based query
    * evaluation needs), serialized as a CSV string so the artifact is
    * engine-portable and hash-comparable.
    *
    * Scale shape: distinct (doc, term) pairs → one shuffle on term; the
    * posting list is `sort_array(collect_list(...))`, per-term state
    * bounded by df. Terms below `minDf` are dropped (singleton postings
    * are index noise); the df>=2 survivors are exactly the terms worth a
    * posting list. At 100 TB the same plan lands partitioned by term
    * range — posting lists for hot stopword-like terms are the known
    * skew case, handled by AQE or a df cap at write time.
    */
  def invertedIndex(spark: SparkSession, dir: String,
                    minDf: Int = 2): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
      .filter(col("df") >= minDf)
      .orderBy("term")

  /** X69: TF-IDF top terms per document — the classic keyword-extraction
    * / feature-weighting pass. tf = in-doc term count, idf = ln(N/df)
    * over the corpus; the per-doc top-3 terms by (tf·idf, term) rank via
    * `row_number <= k`, which plans as WindowGroupLimit (bounded
    * per-group heap — no full per-doc sort materializes).
    *
    * Scale shape: the (doc, term, tf) relation shuffles once on term to
    * attach df, once on doc for the group-limit — both high-cardinality
    * keys. tf, df and N stay integral, so the score is tf · ln(N/df)
    * over exactly-represented doubles — identical IEEE on both engines
    * (the collocation entry pinned this ln parity surface), and rank
    * ties resolve on exactly-equal doubles before the term tiebreak.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String,
                    topK: Int = 3, minDf: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("doc_id"), col("rn").cast("long").as("rn"),
        col("term"), col("tf"), col("df"),
        round(col("tfidf"), 6).as("tfidf"))
      .orderBy("doc_id", "rn")
  }

  /** X96: conjunctive (AND) term search — documents containing ALL query
    * terms, the boolean-retrieval primitive on top of the X57 posting
    * lists. Relational form: the distinct (doc, term) stream is
    * IN-filtered to the query set FIRST (so only |query| postings' worth
    * of rows survive the scan — at 100 TB this is the posting-list read,
    * not a corpus scan), then a doc-keyed count enforces the
    * conjunction: a doc matches iff it hit all |terms| terms. The
    * oracle states the same predicate as |terms| correlated EXISTS
    * semi-joins — a genuinely different plan shape agreeing on values.
    */
  def searchAnd(spark: SparkSession, dir: String,
                terms: Seq[String] = Seq("join", "hash", "scan")): DataFrame = {
    val hits = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(col("term").isin(terms: _*))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === terms.size)
    Tables.documents(spark, dir)
      .join(hits, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** X270: exact PHRASE search — the positional-index query shape that
    * X93's inverted index (doc-set postings) cannot answer: "these
    * tokens, ADJACENT, in this order". Positional postings for the two
    * phrase terms only (the filter is pushed below the explode, so the
    * posting relation is query-sized, never corpus-sized), adjacency as
    * the classic positional merge-join `b.p = a.p + 1` on (doc_id,
    * position), then one per-doc aggregate: occurrence count and first
    * match position. Positions are 1-based raw split indices — the
    * SAME array both engines index, so adjacency is byte-identical
    * (the RAKE/X131 position convention).
    *
    * Scale shape: two tiny filtered posting streams shuffled on
    * (doc_id, p) — at 100 TB the postings of a fixed 2-term phrase are
    * the broadcast side of everything downstream; one doc-keyed
    * aggregate; no corpus-sized window, no self-join of the full token
    * stream.
    */
  def phraseSearch(spark: SparkSession, dir: String,
                   phrase: Seq[String] = Seq("table", "hash")): DataFrame = {
    require(phrase.length == 2, "two-term phrase")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z]+")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("w"))
    val a = toks.filter(col("w") === phrase.head)
      .select(col("doc_id"), col("p"))
    val b = toks.filter(col("w") === phrase(1))
      .select(col("doc_id"), (col("p") - 1).as("p"))
    a.join(b, Seq("doc_id", "p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occ"), min("p").cast("long").as("first_pos"))
      .orderBy("doc_id")
  }

  /** X281: context-window packing — the assembly step between retrieval
    * and the prompt: from X269's chunk table, score each chunk by the
    * number of query-term occurrences inside its token span, rank by
    * (score DESC, doc_id, chunk_id), keep the top-`cand` candidates,
    * and admit chunks in rank order while the running token total stays
    * within the context `budget`. Everything is integer (occurrence
    * counts, token counts, prefix sums), so the packed sequence is
    * cross-engine deterministic.
    *
    * Scale shape: term positions are query-sized postings (broadcast
    * side of the chunk join); the chunk join is doc-keyed with a span
    * range predicate; the ranked cut is a TakeOrdered top-`cand`, and
    * the budget cumsum runs over that ≤cand-row cut (the zipf allowlist
    * class) — nothing corpus-sized past the scan.
    */
  def contextPack(spark: SparkSession, dir: String,
                  terms: Seq[String] = Seq("table", "hash", "scan"),
                  cand: Int = 64, budget: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = TextStats.chunkOverlap(spark, dir)
      .select("doc_id", "chunk_id", "start_pos", "end_pos", "n_toks")
    val hits = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("w"))
      .filter(col("w").isin(terms: _*))
    val scored = chunks.join(hits, Seq("doc_id"))
      .filter(col("p") >= col("start_pos") && col("p") <= col("end_pos"))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("score"))
    val top = chunks.join(scored, Seq("doc_id", "chunk_id"))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_id"))
      .limit(cand)
    val w = Window.orderBy(col("score").desc, col("doc_id"), col("chunk_id"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_toks",
        sum("n_toks").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("cum_toks") <= budget)
      .select(col("rank"), col("doc_id"), col("chunk_id"), col("score"),
        col("n_toks"), col("cum_toks"))
      .orderBy("rank")
  }

  /** X285: hybrid retrieval fusion — the standard RAG retrieval stack:
    * the LEXICAL ranking (X216's fixed-term BM25 posting top-10) and
    * the DENSE ranking (X3's exact cosine top-10, embedding i ↔
    * document i by the fixture convention) fused with reciprocal-rank
    * fusion (k = 60, the X250 constant). Docs surfaced by only one
    * retriever keep their single term (the full-outer null leg), which
    * is exactly why RRF is the production fusion: no score calibration
    * across heterogeneous retrievers is needed — only ranks.
    *
    * Scale shape: both retrievers end in bounded top-k cuts (posting
    * join / TakeOrdered); the rank windows and the fusion join run on
    * ≤ k rows (the zipf allowlist class).
    */
  def hybridRetrieval(spark: SparkSession, dir: String, queryId: Long = 0L,
                      k: Int = 10, out: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25Posting(spark, dir, topK = k)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"), col("rank_lex"))
    val dense = graft.ext.Similarity.cosineTopK(spark, dir, queryId, k)
      .withColumn("rank_dense", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("id"), col("rank_dense"))
    lex.join(dense, Seq("id"), "full_outer")
      .select(col("id"), col("rank_lex"), col("rank_dense"),
        (coalesce(lit(1.0) / (lit(60) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rank_dense")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(out)
      .select(col("id"), col("rank_lex"), col("rank_dense"),
        round(col("rrf"), 6).as("rrf_score"))
  }

  /** X131: RAKE keyword extraction (Rose et al. 2010) with the
    * integer `deg` scoring variant — candidate phrases are the maximal
    * stopword-free token runs, each word scores its corpus DEGREE
    * (Σ length of every phrase instance containing it — frequency plus
    * co-occurrence), and a phrase scores the sum of its words' degrees.
    * The paper's deg/freq ratio variant is deliberately not used: a
    * per-word float ratio summed per phrase would make the score a
    * partition-order-dependent double; `deg` keeps every quantity an
    * order-free integer, so the whole output hash-oracles.
    *
    * Relational shape (no per-doc UDF): tokens with positions
    * (posexplode), phrase ids by the gaps-and-islands running stopword
    * count (one per-doc window), per-phrase reassembly via
    * sort_array(collect_list(struct(pos, w))) — the X107 rebuild idiom,
    * sorting inside a row, never across rows — then two bounded
    * aggregates (word degrees over the member stream; phrase scores).
    * Shuffles key on doc id and word — corpus-sized but narrow; the
    * final top-20 plans as TakeOrderedAndProject.
    */
  def rakeKeywords(spark: SparkSession, dir: String,
                   stopwords: Seq[String] = Seq("the", "a"),
                   topK: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "w").withColumnRenamed("pos", "pos")
      .withColumn("is_stop", col("w").isin(stopwords: _*))
      .withColumn("grp",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
    val members = toks.filter(!col("is_stop"))
      .select(col("doc_id"), col("grp"), col("pos"), col("w"))
    // one phrase instance per (doc, grp): text + length
    val phrases = members
      .groupBy("doc_id", "grp")
      .agg(array_join(expr("transform(sort_array(collect_list(struct(pos, w))), x -> x.w)"),
          " ").as("phrase"),
        count(lit(1)).as("plen"))
    // word degree: Σ phrase length over every member occurrence
    val deg = members
      .join(phrases.select("doc_id", "grp", "plen"), Seq("doc_id", "grp"))
      .groupBy("w").agg(sum("plen").as("deg"))
    // phrase instance score = Σ member-word degrees (repeats count)
    val instScore = members
      .join(deg, Seq("w"))
      .groupBy("doc_id", "grp").agg(sum("deg").as("score"))
    phrases.join(instScore, Seq("doc_id", "grp"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_instances"), max("plen").as("n_words"),
        max("score").as("score"))
      .orderBy(desc("score"), desc("n_instances"), col("phrase"))
      .limit(topK)
  }
}
