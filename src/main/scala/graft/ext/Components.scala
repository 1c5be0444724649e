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
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt

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
      .repartition(sessionParts, col("u")))
    // Scale-adaptive loop sizing (r14, guide §2): every per-round shuffle
    // inside the fixpoint is sized to the MEASURED canonical edge count
    // (~2M edge rows ≈ 50–100 MB per reduce partition), not to the
    // session default — at bench SF the loop stops scheduling dozens of
    // ~1ms tasks per stage, at 100 TB the same formula yields hundreds
    // of right-sized partitions. The count is one trivial job over the
    // just-checkpointed init relation. AQE is OFF inside the loop for
    // the established reason (per-exchange re-planning is pure latency
    // on a chain of small bounded shuffles whose sizes we just derived);
    // both confs are loop-local and restored on exit.
    val nEdges = init.count()
    val loopParts = math.max(4L,
      math.min(sessionParts.toLong, nEdges / 2000000L + 1L)).toInt
    val loopConfs = Seq(
      "spark.sql.shuffle.partitions" -> loopParts.toString,
      "spark.sql.adaptive.enabled" -> "false")
    val prevConfs = loopConfs.map { case (k, _) => k -> spark.conf.get(k) }
    loopConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
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

    // Fixpoint ⟺ the edge set stops changing. Both sides are distinct
    // sets, so equality = empty symmetric difference, computed in ONE
    // hash-aggregate job (±1 tags, non-zero group survives) instead of
    // the former two exceptAll anti-join jobs per round (r14, guide
    // §2.4: two probe shuffles → one) — still sound, no checksums. The
    // probe only runs at all when the cheap row-count gate (a trivial
    // count over just-checkpointed data, the kcore pattern) says the
    // cardinality held: a round that changed the edge count cannot be
    // the fixpoint, so early rounds pay one ~ms count and no diff job.
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.select(col("u"), col("v"), lit(1L).as("s"))
        .unionByName(b.select(col("u"), col("v"), lit(-1L).as("s")))
        .groupBy("u", "v").agg(sum("s").as("s"))
        .filter(col("s") =!= 0)
        .isEmpty

    var edges = init
    var prevCount = nEdges
    var rounds = 0
    var converged = nEdges == 0 // a loop-free pair set is already done
    while (!converged && rounds < maxRounds) {
      // eager: materialized before the probes, plan truncated to a scan
      val next = graft.Checkpoints.cut(
        smallStar(largeStar(edges)).repartition(loopParts, col("u")))
      val nextCount = next.count()
      converged = nextCount == prevCount && same(next, edges)
      prevCount = nextCount
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
    } finally prevConfs.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
