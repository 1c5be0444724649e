package graft.sync

import graft.SparkSpec

/** H1/H2/J5/J6 — tree flatten row shape (DW.js:662-709) and category
  * reconciliation (DW.js:392-463).
  */
class CategoriesSpec extends SparkSpec {
  import spark.implicits._

  private val files = Seq(
    (1L, "Ward/GIS/Site.shp"), (2L, "Ward/GIS/Other.shp"), (3L, "Ward/Deep/X/Y.shp"))
    .toDF("ord", "file")

  test("folder categories mirror the BFS flatten row shape (root dropped, DW.js:683-706)") {
    val rows = Categories.folderCats(files, "Files")
      .orderBy("name").collect()
    val asTuples = rows.map(r => (r.getAs[String]("type"), r.getAs[String]("name"),
      r.getAs[String]("short_name"), r.getAs[String]("path"))).toSeq
    assert(asTuples == Seq(
      ("files", "Files/Ward", "Ward", "Files/"),
      ("files/ward", "Files/Ward/Deep", "Deep", "Files/Ward/"),
      ("files/ward/deep", "Files/Ward/Deep/X", "X", "Files/Ward/Deep/"),
      ("files/ward", "Files/Ward/GIS", "GIS", "Files/Ward/")))
    // type is lowercased parent path; name/shortName keep original case;
    // path has the trailing slash; no row for the root itself.
  }

  test("files at the scan root produce no categories (dirname empty)") {
    assert(Categories.folderCats(Seq((1L, "rootfile.shp")).toDF("ord", "file"),
      "files").isEmpty)
  }

  test("match/create/remove partition the category space; non-bot rows ignored (P5)") {
    val folder = Categories.folderCats(files, "files")
    val server = Seq(
      (1L, "files", "files/Ward", "Ward", "files/", "gatherbot"),       // matched
      (2L, "files", "files/legacy", "legacy", "files/", "gatherbot"),   // deprecated
      (3L, "files/ward", "files/Ward/GIS", "GIS", "files/Ward/", "admin") // not ours
    ).toDF("id", "category", "name", "short_name", "path", "iam")
    assert(Categories.matched(folder, server).select("id").as[Long]
      .collect().toSeq == Seq(1L))
    assert(Categories.toRemove(folder, server).select("id").as[Long]
      .collect().toSeq == Seq(2L))
    // unmatched folder cats (incl. the one only the admin row covers) -> create
    assert(Categories.toCreate(folder, server).count() == 3)
  }

  test("duplicate (category,name) server keys are flagged (DW.js:432-434 throw)") {
    val server = Seq(
      (1L, "files", "files/W", "W", "files/", "gatherbot"),
      (2L, "files", "files/W", "W", "files/", "gatherbot"))
      .toDF("id", "category", "name", "short_name", "path", "iam")
    val guard = Categories.duplicateKeyGuard(server).collect()
    assert(guard.length == 1 && guard.head.getAs[Long]("n") == 2L)
  }
}
