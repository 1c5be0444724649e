package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components: the O(log n) round bound
  * on the adversarial graph shape (a long path — exactly where min-label
  * propagation degrades to diameter rounds), correctness on disconnected
  * multi-component graphs, and agreement with the propagation form on
  * the real near-dup pair graph.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def withLoopConfs[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("10k-node path graph converges in O(log n) rounds, one component") {
    withLoopConfs {
      val n = 10000
      val path = (0L until (n - 1).toLong).map(i => (i, i + 1))
        .toDF("a", "b")
      val r = Components.starComponents(path)
      // diameter is n-1: propagation would need ~n rounds; star rewiring
      // must stay logarithmic. ceil(log2 10000) = 14; small constant slack.
      val bound = math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 4
      assert(r.rounds <= bound,
        s"took ${r.rounds} rounds on a $n-node path, bound $bound")
      val labs = r.labels.collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(labs.length == n)
      assert(labs.forall(_._2 == 0L), "every node joins the min-id root")
      r.labels.unpersist()
    }
  }

  test("multi-component graph with self-loops, duplicate and reversed edges") {
    withLoopConfs {
      val edges = Seq(
        (1L, 2L), (2L, 1L), (2L, 3L),   // comp {1,2,3} with a reversed dup
        (10L, 11L),                     // comp {10,11}
        (20L, 20L),                     // self-loop only: singleton {20}
        (30L, 31L), (31L, 32L), (30L, 32L)) // triangle {30,31,32}
        .toDF("x", "y")
      val r = Components.starComponents(edges)
      val got = r.labels.collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == Set(
        (1L, 1L), (2L, 1L), (3L, 1L),
        (10L, 10L), (11L, 10L),
        (20L, 20L),
        (30L, 30L), (31L, 30L), (32L, 30L)))
      r.labels.unpersist()
    }
  }

  test("durable checkpoint flag: star-CC green with reliable checkpoints on disk") {
    withLoopConfs {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ckpt").toString
      spark.conf.set(graft.Checkpoints.ConfKey, dir)
      try {
        val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("x", "y")
        val r = Components.starComponents(edges)
        val got = r.labels.collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
        r.labels.unpersist()
        // reliable checkpoints actually landed under the configured dir
        def rddFiles(f: java.io.File): Seq[java.io.File] =
          Option(f.listFiles()).toSeq.flatten
            .flatMap(c => if (c.isDirectory) rddFiles(c) else Seq(c))
        assert(rddFiles(new java.io.File(dir)).nonEmpty,
          s"no checkpoint files written under $dir")
      } finally {
        spark.conf.unset(graft.Checkpoints.ConfKey)
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(dir))
      }
    }
  }

  test("star clustering equals min-label propagation on the fixture pair graph") {
    val prop = TextDedup.nearDupClusters(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val star = TextDedup.nearDupClustersStar(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(star == prop)
    assert(star.nonEmpty)
  }
}
