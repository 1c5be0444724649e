package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.Row

/** J7/A1 — `_markDuplicates` edge cases (DW.js:312-348). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def files(rows: (Long, String, String)*) =
    rows.toDF("ord", "file", "md5")
      .selectExpr("ord", "ord AS ino", "CAST(100 AS BIGINT) AS size", "file", "md5")

  test("duplicate group: first by ord is canonical, later files alias to it") {
    val df = Dedup.markDuplicates(files(
      (10L, "a/x.shp", "h1"), (11L, "b/y.shp", "h1"), (12L, "c/z.shp", "h1"),
      (13L, "d/u.shp", "h2")))
    val byOrd = df.orderBy("ord").collect()
    assert(byOrd.map(_.getAs[Any]("alias")).toSeq == Seq(null, 10L, 10L, null))
    assert(byOrd(0).getAs[Long]("n_duplicates") == 2L)
    assert(byOrd(0).getAs[String]("duplicates_csv") == "11,12")
    assert(byOrd(3).getAs[Long]("n_duplicates") == 0L)
    assert(byOrd(3).getAs[String]("duplicates_csv") == null)
  }

  test("canonical choice is a function of (md5, ord) only — input order irrelevant") {
    val a = Dedup.markDuplicates(files(
      (2L, "b.shp", "h"), (1L, "a.shp", "h"))).orderBy("ord").collect()
    val b = Dedup.markDuplicates(files(
      (1L, "a.shp", "h"), (2L, "b.shp", "h"))).orderBy("ord").collect()
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq))
    assert(a(0).getAs[Any]("alias") == null) // lowest ord wins
    assert(a(1).getAs[Long]("alias") == 1L)
  }

  test("duplicate report: md5 asc, canonical first, only dup-group rows (DW.js:109-133)") {
    val rep = Dedup.duplicateReport(Dedup.markDuplicates(files(
      (1L, "solo.shp", "zz"), (2L, "p/one.shp", "aa"), (3L, "q/two.shp", "aa"))))
      .collect()
    assert(rep.length == 2) // 'zz' solo row filtered out
    assert(rep(0).getAs[String]("basename") == "one.shp")
    assert(!rep(0).getAs[Boolean]("is_alias") && rep(1).getAs[Boolean]("is_alias"))
  }
}
