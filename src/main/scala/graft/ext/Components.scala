package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star edge rewiring (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014 — the public O(log n)-round
  * algorithm). This is the adversarial-diameter companion to
  * [[TextDedup.nearDupClusters]]' min-label propagation: propagation
  * needs component-diameter rounds (fine for near-dup graphs, whose
  * diameter is small by construction), while star rewiring halves chain
  * lengths every iteration, so a pathological long-chain pair graph —
  * e.g. boilerplate that daisy-chains otherwise-unrelated docs — still
  * converges in logarithmic rounds.
  *
  * Representation: directed edges (u, v) with u > v ("big points at
  * small"), deduplicated. Each round is two map-reduce shaped passes:
  *
  *  - large-star: every node u connects its LARGER neighbours to
  *    m(u) = min(Γ(u) ∪ u) — one symmetrize + groupBy(min) + join;
  *  - small-star: every node u connects its smaller neighbours (and
  *    itself) to their minimum — one groupBy(min) + join.
  *
  * Both passes shuffle on the node id only; no stage ever materializes a
  * neighborhood in memory (the min is an aggregate, neighbour fan-out
  * stays relational), so a 100 TB edge set runs with plain hash
  * partitioning + AQE skew splits. At the fixpoint every component is a
  * star rooted at its minimum id; labels read off the edges directly.
  * Rounds are driver-coordinated Spark jobs; only one-row convergence
  * probes ever reach the driver.
  */
object Components {

  /** Component assignment and the round count it took (the spec asserts
    * the O(log n) bound on an adversarial path graph).
    */
  final case class StarResult(labels: DataFrame, rounds: Int)

  /** `pairs`: two id columns, one row per (possibly repeated, either
    * orientation) edge. Returns one (id, comp) row per node that appears
    * in `pairs`, comp = min id of the node's component.
    */
  def starComponents(pairs: DataFrame, maxRounds: Int = 48): StarResult = {
    val spark = pairs.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // canonical direction (big, small) + dedup; self-edges contribute
    // nothing to connectivity. Partitioned once on the round's join key.
    // LINEAGE IS CUT EVERY ROUND (eager Checkpoints.cut): each pass
    // references its input several times (symmetrize + min-join), so a
    // merely-persisted chain would grow the ANALYZED plan ~6× per round —
    // exponential in rounds, an analyzer OOM long before any data
    // pressure. Checkpointing makes every round's plan O(1); a cluster
    // run sets `graft.checkpoint.dir` to durable storage and the cuts
    // become reliable `checkpoint()`s for executor-loss resilience.
    val cols = pairs.columns
    val init = graft.Checkpoints.cut(pairs
      .select(col(cols(0)).as("a"), col(cols(1)).as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct()
      .repartition(parts, col("u")))
    // nodes whose only edges were self-loops still deserve a label
    val allNodes = graft.Checkpoints.cut(pairs
      .select(explode(array(col(cols(0)), col(cols(1)))).as("id"))
      .distinct())

    // large-star over the symmetrized neighborhood: (x, m(u)) for every
    // neighbour x > u. Result is (big, small)-directed again since
    // m(u) ≤ u < x.
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      nbrs.filter(col("v") > col("u"))
        .join(mins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    // small-star on (big, small) edges: all of u's smaller neighbours
    // (exactly its v's) plus u itself re-point at their minimum.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      e.join(mins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .unionByName(mins.select(col("u"), col("m").as("v")))
        .distinct()
    }

    // Fixpoint ⟺ the edge set stops changing. Since the per-round output
    // is distinct, equality is two exceptAll-emptiness probes — sound
    // (no checksum collisions), and at O(log n) total rounds the two
    // extra jobs per round stay cheap.
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    var edges = init
    var rounds = 0
    var converged = edges.isEmpty // a loop-free pair set is already done
    while (!converged && rounds < maxRounds) {
      // eager: materialized before the probes, plan truncated to a scan
      val next = graft.Checkpoints.cut(
        smallStar(largeStar(edges)).repartition(parts, col("u")))
      converged = same(next, edges)
      edges.unpersist()
      edges = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star components did not converge in $maxRounds rounds")

    // stars: every child row is (child, root); roots only appear on the
    // small side. Nodes with no surviving edge are their own component.
    val labels = edges.select(col("u").as("id"), col("v").as("comp"))
      .unionByName(allNodes.join(
        edges.select(col("u").as("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("comp")))
      .persist()
    labels.count()
    edges.unpersist()
    allNodes.unpersist()
    StarResult(labels, rounds)
  }
}
