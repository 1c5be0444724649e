package graft.sync

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based reconciliation invariants over *generated* inputs
  * (SURVEY.md §5.2#3) — not just the fixture distribution. Raw ScalaCheck
  * generators with fixed seeds (scalatest-plus bridge isn't on the
  * offline classpath; determinism is a feature here anyway).
  */
class GeneratedInputSpec extends SparkSpec {
  import spark.implicits._

  private val hashes = Gen.oneOf("h1", "h2", "h3", "h4", "h5")
  private val fileGen = for {
    n <- Gen.choose(1, 12)
    rows <- Gen.listOfN(n, hashes)
  } yield rows.zipWithIndex.map { case (h, i) => (i.toLong, s"d$i/f$i.shp", h) }

  private val projGen = for {
    n <- Gen.choose(0, 8)
    rows <- Gen.listOfN(n, Gen.zip(hashes, Gen.oneOf(true, false), Gen.choose(0, 11)))
  } yield rows.zipWithIndex.map { case ((h, exact, fi), i) =>
    (100L + i, if (exact) s"d$fi/f$fi.shp" else s"remote/p$i.shp", h)
  }

  private def toFiles(rows: Seq[(Long, String, String)]) =
    rows.toDF("ord", "file", "md5")
      .selectExpr("ord", "ord AS ino", "CAST(10 AS BIGINT) AS size", "file", "md5")

  private def toProjects(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "p_file", "p_md5")
      .selectExpr("id", "'gatherbot' AS iam", "p_file", "p_md5",
        "'t' AS title", "true AS is_dataset")

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("invariants hold on 15 generated input pairs") {
    import org.apache.spark.sql.functions._
    val cats = Seq(("files", "files/d0", "d0", "files/", "gatherbot", 1L))
      .toDF("category", "name", "short_name", "path", "iam", "id")
    (1 to 15).foreach { seed =>
      val fs = sample(fileGen, seed.toLong)
      val ps = sample(projGen, seed.toLong * 7919)
      val r = Pipeline.sync(toFiles(fs), toProjects(ps), cats)
      val marked = r.marked.cache()
      // 1. dedup: exactly one canonical per md5 group
      assert(marked.filter(col("alias").isNull).select("md5").distinct().count()
        == marked.select("md5").distinct().count(), s"seed=$seed dedup")
      assert(marked.filter(col("alias").isNull).count()
        == marked.select("md5").distinct().count(), s"seed=$seed canonical-count")
      // 2. mains partition into matched xor created
      val mains = marked.filter(col("alias").isNull).count()
      val matched = r.pass1.filter(col("project").isNotNull).count()
      val createdMains = r.creates.join(
        marked.filter(col("alias").isNull).select("ino"), Seq("ino"), "left_semi").count()
      assert(matched + createdMains == mains, s"seed=$seed mains")
      // 3. projects partition into processed xor pass2 xor archived
      assert(Matching.processedIds(r.pass1).count() + r.pass2.count() +
        r.archives.count() == ps.length.toLong, s"seed=$seed projects")
      // 4. updates only reference matched projects
      val known = Matching.processedIds(r.pass1)
        .union(r.pass2.select("id")).distinct()
      assert(r.updates.select("id").distinct()
        .join(known, Seq("id"), "left_anti").count() == 0, s"seed=$seed updates")
      marked.unpersist()
    }
  }
}
