package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused codegen kernel must agree bit-for-bit with the composable
  * higher-order-function form (same sequential fold).
  */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("fused kernel == composable dot/norm form, bit-exact") {
    CosineSim.register(spark)
    val emb = graft.tables.Tables.embeddings(spark, sf001)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val q = emb.filter($"vec_id" === 1).select($"v".as("qv"))
    val both = emb.crossJoin(q).select(
      $"vec_id",
      CosineSim.cosine($"v", $"qv").as("fused"),
      (graft.ext.Similarity.dot($"v", $"qv") /
        (sqrt(graft.ext.Similarity.dot($"v", $"v")) *
          sqrt(graft.ext.Similarity.dot($"qv", $"qv")))).as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Double]("fused") == r.getAs[Double]("composed"),
        s"vec ${r.getAs[Long]("vec_id")}")
    }
  }

  test("IVF recall: hash-seeded probe covers most of the exact top-k") {
    val k = 10
    val exact = graft.ext.Similarity.cosineTopK(spark, sf001, queryId = 0L, k = k)
      .select("vec_id").as[Long].collect().toSet
    val ivf = graft.ext.Similarity
      .ivfTopK(spark, sf001, queryId = 0L, k = k, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & ivf).size.toDouble / k
    // probing half the cells of a well-separated fixture must recover most
    // true neighbours; 0.6 leaves headroom for boundary vectors
    assert(recall >= 0.6, s"IVF recall $recall < 0.6 (exact=$exact ivf=$ivf)")
  }

  test("sorted-intersect kernel == size(array_intersect) on sorted distinct arrays") {
    SortedIntersectSize.register(spark)
    // deterministic varied overlap patterns, including empty and disjoint
    val rows = (0 until 50).map { i =>
      val a = (0 until i % 7).map(k => f"s${(i * 3 + k * 2) % 23}%03d").distinct.sorted
      val b = (0 until (i + 3) % 8).map(k => f"s${(i + k * 3) % 23}%03d").distinct.sorted
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .select($"id",
        SortedIntersectSize.intersectSize($"a", $"b").as("kernel"),
        size(array_intersect($"a", $"b")).cast("long").as("builtin"))
      .collect()
    df.foreach(r => assert(r.getAs[Long]("kernel") == r.getAs[Long]("builtin"),
      s"row ${r.getAs[Long]("id")}"))
  }

  test("known values: parallel=1, orthogonal=0, antiparallel=-1") {
    CosineSim.register(spark)
    val df = Seq(
      (Array(1.0, 2.0), Array(2.0, 4.0)),
      (Array(1.0, 0.0), Array(0.0, 3.0)),
      (Array(1.0, 1.0), Array(-1.0, -1.0))).toDF("a", "b")
      .select(CosineSim.cosine($"a", $"b").as("c")).as[Double].collect()
    assert(math.abs(df(0) - 1.0) < 1e-15)
    assert(df(1) == 0.0)
    assert(math.abs(df(2) + 1.0) < 1e-15)
  }
}
