package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Iterative graph analytics over relationship graphs derived from the
  * warehouse tables — the second join-loop algorithm family beside
  * [[Components]] (which converges to a fixpoint; PageRank runs a FIXED
  * number of power-iteration rounds, so the oracle can state it exactly
  * by unrolling).
  */
object Graphs {

  /** X56: PageRank (damping 0.85, `iters` power iterations) over the
    * symmetric customer↔supplier trade graph: an edge per distinct
    * (customer, supplier) pair that shares a lineitem, supplier ids
    * offset by 1e7 into a disjoint node-id space. Symmetrization means
    * every node has out-degree ≥ 1, so no dangling-mass redistribution
    * term is needed and the unrolled oracle stays a plain join chain.
    *
    * Scale shape: one shuffle per round on the edge source key (join
    * pr⋈edges) and one on the destination (the contribution aggregate);
    * edges/out-degrees/nodes are computed once and persisted, the rank
    * vector is the only thing that iterates. The node count rides a
    * broadcast 1-row aggregate — no driver-side scalar. Ranks are
    * reported ×N (mean 1.0) so the 6dp round is meaningful at any graph
    * size.
    */
  def pagerank(spark: SparkSession, dir: String,
               iters: Int = 3, d: Double = 0.85): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
    val cs = li.join(ord, Seq("ok"))
      .select(col("ck").as("cust"), (col("sk") + lit(10000000L)).as("supp"))
      .distinct()
    val edges = cs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(cs.select(col("supp").as("src"), col("cust").as("dst")))
      .persist()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val nodes = edges.select(col("src").as("id")).distinct().persist()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n"))
    // rank vector carries n so every round's teleport term is plan-side
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("id"), col("n"), (lit(1.0) / col("n")).as("pr"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(outdeg, Seq("src"))
        .join(pr.select(col("id").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("pr") / col("deg")).as("c"))
      pr = nodes.crossJoin(broadcast(nRow))
        .join(contribs, Seq("id"), "left")
        .select(col("id"), col("n"),
          (lit(1.0 - d) / col("n") + lit(d) * coalesce(col("c"), lit(0.0)))
            .as("pr"))
    }
    val out = pr.select(col("id"), round(col("pr") * col("n"), 6).as("pr_norm"))
      .orderBy("id")
    out
  }
}
