package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Corpus-statistics language modeling for data curation — the two
  * classic tokenizer/quality primitives a training-data pipeline runs
  * over raw text before anything model-based exists:
  *
  *  - [[lmCrossEntropy]]: per-document cross-entropy under a corpus-
  *    trained add-one-smoothed unigram model (the CCNet-style "does this
  *    look like the corpus" quality signal — reference has no text ops;
  *    mandated by the X-surface, cf. `DataWarehouse.js:324` for the
  *    closest content-hash analogue);
  *  - [[bpeMerges]]: highest-frequency adjacent symbol pairs over the
  *    corpus vocabulary — the selection step of byte-pair-encoding
  *    tokenizer training (Sennrich et al. 2016), computed the way real
  *    BPE trainers do: over word TYPES weighted by their counts, never
  *    over raw occurrences.
  */
object LangModel {

  /** Lowercased alphabetic word stream — one row per token occurrence.
    * The `[^a-z]+` split matches the oracle's `string_split_regex`
    * tokenization exactly (both emit boundary empties, both drop them).
    */
  private def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(col("tok") =!= "")

  /** X50: per-doc cross-entropy (bits/token) under the corpus unigram
    * model, add-one smoothed: p(w) = (c(w)+1)/(N+V).
    *
    * Scale shape: occurrences collapse to (doc, type, cnt) BEFORE the
    * model join — the scoring join's left side is per-doc vocabulary,
    * not the raw token stream, and the per-doc sum rides the same
    * aggregate. The model itself is vocabulary-sized (heavy-hitter
    * skewed on stopwords — exactly what AQE skew-split handles on the
    * `tok` shuffle; at 100 TB the vocabulary also comfortably broadcasts
    * after a count-min cut). Rounded to 6dp so occurrence-order float
    * association never reaches the comparison.
    */
  def lmCrossEntropy(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(spark, dir)
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum("c").as("n"), count(lit(1)).as("v"))
    val model = counts.crossJoin(broadcast(totals))
      .select(col("tok"),
        ((col("c") + lit(1)).cast("double") / (col("n") + col("v"))).as("p"))
    val docTypes = toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("cnt"))
    docTypes.join(model, Seq("tok"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_tokens"),
        round(-sum(col("cnt") * log2(col("p"))) / sum("cnt"), 6)
          .as("bits_per_token"))
      .orderBy("doc_id")
  }

  /** X51: top-`topK` adjacent character pairs by corpus frequency — the
    * pair-selection step of BPE training. Ties break lexicographically
    * so the cut is deterministic on both engines.
    *
    * Scale shape: the corpus collapses to its VOCABULARY (word type +
    * count) before any pair expansion — pair rows are then bounded by
    * Σ|type| over distinct words, not corpus length, and the final
    * aggregate's key space is ≤ alphabet². The top-k is a single-stage
    * TakeOrdered over ≤676 rows; nothing here rescans text twice.
    */
  def bpeMerges(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val wc = tokens(spark, dir)
      .filter(length(col("tok")) >= 2)
      .groupBy(col("tok").as("w"))
      .agg(count(lit(1)).as("wc"))
    wc.select(col("wc"), explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("wc").as("freq"))
      .orderBy(desc("freq"), asc("pair"))
      .limit(topK)
  }
}
