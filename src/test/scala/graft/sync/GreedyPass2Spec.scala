package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Matching.pass2Greedy]] — the faithful sequential-claim variant must
  * reproduce the reference's order-dependent behavior where the set-based
  * [[Matching.pass2]] deviates.
  */
class GreedyPass2Spec extends SparkSpec {
  import spark.implicits._

  private def files(rows: (Long, String, String)*): DataFrame =
    rows.toDF("ord", "file", "md5")
      .selectExpr("ord", "ord AS ino", "CAST(100 AS BIGINT) AS size", "file", "md5")

  private def projects(rows: (Long, String, String)*): DataFrame =
    rows.toDF("id", "p_file", "p_md5")
      .selectExpr("id", "'gatherbot' AS iam", "p_file", "p_md5",
        "'t' AS title", "true AS is_dataset")

  // f1 'd/a.shp' is claimed in pass 1 (exact project 102); aliases f2, f3
  // remain. Project 100 (no exact path) runs first and greedily takes f2;
  // project 101's exact-path candidate f2 is then GONE, so it gets f3 with
  // the single-candidate label — exactly the reference's sequential
  // behavior (DW.js:465-536).
  private val fs = files((1L, "d/a.shp", "h"), (2L, "d/b.shp", "h"), (3L, "d/c.shp", "h"))
  private val ps = projects((100L, "d/x.shp", "h"), (101L, "d/b.shp", "h"),
    (102L, "d/a.shp", "h"))

  test("greedy claims sequentially; set-based double-claims — the documented divergence") {
    val marked = Dedup.markDuplicates(fs)
    val p1 = Matching.pass1(marked, ps)
    // sanity: pass 1 claims only f1 via exact path on project 102
    assert(Matching.processedIds(p1).as[Long].collect().toSeq == Seq(102L))

    val greedy = Matching.pass2Greedy(marked, ps, p1)
      .orderBy("id").collect()
    assert(greedy.map(r => (r.getAs[Long]("id"), r.getAs[Long]("ino"),
      r.getAs[String]("match"))).toSeq == Seq(
      (100L, 2L, "unmatched md5 match"),
      (101L, 3L, "unmatched md5 match"))) // f2 already taken -> single cand
    // greedy assignments are injective
    assert(greedy.map(_.getAs[Long]("ino")).distinct.length == greedy.length)

    val setBased = Matching.pass2(marked, ps, p1).orderBy("id").collect()
    assert(setBased.map(r => (r.getAs[Long]("id"), r.getAs[Long]("ino"),
      r.getAs[String]("match"))).toSeq == Seq(
      (100L, 2L, "unmatched md5 match"),
      (101L, 2L, "alias exactMatch"))) // both claim f2: the deviation
  }

  test("greedy agrees with set-based when no claims conflict (fixture)") {
    val r = Pipeline.syncFixture(spark, sf001)
    val projects = SyncInputs.projects(spark, sf001)
    val greedy = Matching.pass2Greedy(r.marked, projects, r.pass1)
    // both match the same project set on the fixture (conflicts only
    // change which file a later project receives, not whether it matches,
    // unless a group runs out of files)
    val g = greedy.select("id").as[Long].collect().toSet
    val s = r.pass2.select("id").as[Long].collect().toSet
    assert(g.subsetOf(s))
    // injectivity always holds for greedy
    assert(greedy.select("ino").distinct().count() == greedy.count())
  }
}
