package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Record-linkage / co-occurrence operators: edit-distance similarity
  * join via deletion neighborhoods and market-basket association rules.
  * Both replace a naive O(n²) pair space with a bounded blocking key —
  * the pattern that makes entity resolution feasible at corpus scale.
  */
object Linkage {

  /** X61: edit-distance-≤1 similarity join over customer names, WITHOUT
    * a cross join. Blocking key = the deletion neighborhood (the string
    * itself plus every single-character deletion, |s|+1 keys per name —
    * the FastSS scheme): two strings within Levenshtein distance 1
    * always share a key (equality → the string itself; insert/delete →
    * the shorter string is a deletion of the longer; substitution at i →
    * both delete position i to the same variant). The key join yields a
    * small candidate superset (shared variants can also arise from
    * transpositions, which are distance 2), so an exact
    * `levenshtein(a,b) <= 1` verify filters candidates — never the n²
    * name space. At 100 TB the key join is an ordinary hash shuffle on
    * short strings; candidates per name are bounded by alphabet ×
    * length, not corpus size. The oracle states the naive quadratic
    * spelling (self cross join + levenshtein), proving the neighborhood
    * blocking is lossless.
    */
  def fuzzyNameJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.customer(spark, dir)
      .select(col("c_name").as("name")).distinct()
    val keyed = names.select(col("name"), explode(concat(
        array(col("name")),
        expr("transform(sequence(1, length(name)), " +
          "i -> concat(substring(name, 1, i-1), substring(name, i+1)))")))
      .as("k"))
    keyed.as("x").join(keyed.as("y"),
        col("x.k") === col("y.k") && col("x.name") < col("y.name"))
      .select(col("x.name").as("name_a"), col("y.name").as("name_b"))
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .orderBy("name_a", "name_b")
  }

  /** X62: market-basket association rules over co-ordered parts —
    * support / confidence / lift for the top pairs. The pair space is
    * per-order (Σ|order|², bounded by basket size), aggregated once on
    * the (a, b) pair key; item counts and the basket total are separate
    * cheap aggregates, the total riding a broadcast 1-row join. All
    * three ratios divide exactly-representable BIGINTs as IEEE doubles,
    * so they hash-compare cross-engine. Top-k is fully tie-broken
    * (pair_cnt desc, part_a, part_b) → TakeOrderedAndProject, no global
    * sort materialization.
    */
  def marketBasket(spark: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .persist()
    val nOrders = li.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCnt = li.groupBy("pk").agg(count(lit(1)).as("cnt"))
    val pairs = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("part_a"), col("y.pk").as("part_b"))
      .agg(count(lit(1)).as("pair_cnt"))
    val out = pairs
      .join(itemCnt.select(col("pk").as("part_a"), col("cnt").as("cnt_a")), Seq("part_a"))
      .join(itemCnt.select(col("pk").as("part_b"), col("cnt").as("cnt_b")), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        (col("pair_cnt").cast("double") / col("n_orders").cast("double"))
          .as("support"),
        (col("pair_cnt").cast("double") / col("cnt_a").cast("double"))
          .as("confidence"),
        ((col("pair_cnt") * col("n_orders")).cast("double") /
          (col("cnt_a") * col("cnt_b")).cast("double")).as("lift"))
      .orderBy(col("pair_cnt").desc, col("part_a"), col("part_b"))
      .limit(topK)
    out
  }
}
