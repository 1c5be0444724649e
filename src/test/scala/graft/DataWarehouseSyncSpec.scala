package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-memory remote CMS: applies action tables to its own state so a
  * second sync run can verify convergence end-to-end.
  */
class InMemoryGatherClient(spark: SparkSession) extends GatherClient {
  import spark.implicits._

  // flat internal state (id, iam, p_file, p_md5, title, is_dataset)
  var projects: DataFrame = Seq.empty[(Long, String, String, String, String, Boolean)]
    .toDF("id", "iam", "p_file", "p_md5", "title", "is_dataset")
  var categories: DataFrame = Seq.empty[(Long, String, String, String, String, String)]
    .toDF("id", "category", "name", "short_name", "path", "iam")
  var archived: Seq[Long] = Nil
  private var nextId = 1000L

  def seedProject(id: Long, file: String, md5: String): Unit =
    projects = projects.unionByName(
      Seq((id, "gatherbot", file, md5, "seeded", true))
        .toDF("id", "iam", "p_file", "p_md5", "title", "is_dataset"))

  override def listProjects(): DataFrame = projects.select(
    col("id"),
    struct(col("iam"), struct(col("p_file").as("file"), col("p_md5").as("md5")).as("file")).as("metadata"),
    struct(struct(col("title"), col("is_dataset").as("isDataset")).as("proposalAttributes")).as("attributes"))

  override def listArchivedProjects(): DataFrame = listProjects().limit(0)
  override def listCategories(): DataFrame = categories

  override def applyCreates(creates: DataFrame): Unit = {
    val rows = creates.collect().toSeq.map { r =>
      nextId += 1
      (nextId, "gatherbot", r.getAs[String]("file"), r.getAs[String]("md5"),
        r.getAs[String]("title"), r.getAs[Boolean]("is_dataset"))
    }
    projects = projects.unionByName(
      rows.toDF("id", "iam", "p_file", "p_md5", "title", "is_dataset"))
  }

  override def applyUpdates(updates: DataFrame): Unit = {
    val u = updates.select(col("id"), col("new_file"), col("md5").as("upd_md5"))
      .dropDuplicates("id")
    projects = projects.join(u, Seq("id"), "left")
      .select(col("id"), col("iam"),
        coalesce(col("new_file"), col("p_file")).as("p_file"),
        coalesce(col("upd_md5"), col("p_md5")).as("p_md5"),
        col("title"), col("is_dataset"))
  }

  override def applyArchives(archives: DataFrame): Unit = {
    archived = archived ++ archives.select("id").collect().map(_.getLong(0))
    projects = projects.join(archives.select("id"), Seq("id"), "left_anti")
  }

  override def applyCategoryCreates(cats: DataFrame): Unit = {
    val rows = cats.collect().toSeq.map { r =>
      nextId += 1
      (nextId, r.getAs[String]("category"), r.getAs[String]("name"),
        r.getAs[String]("short_name"), r.getAs[String]("path"), "gatherbot")
    }
    categories = categories.unionByName(
      rows.toDF("id", "category", "name", "short_name", "path", "iam"))
  }

  override def applyCategoryRemoves(cats: DataFrame): Unit =
    categories = categories.join(cats.select("id"), Seq("id"), "left_anti")
}

/** End-to-end: a reference user's whole workflow — scan a real directory,
  * sync against a (simulated) remote, apply, and converge.
  */
class DataWarehouseSyncSpec extends SparkSpec {

  test("full sync converges: second run is a no-op (E2+E3 end-to-end)") {
    val root = Files.createTempDirectory("graft-e2e")
    Files.createDirectories(root.resolve("Ward/GIS"))
    Files.createDirectories(root.resolve("Ward/Docs"))
    Files.write(root.resolve("Ward/GIS/Site.shp"), "site".getBytes)
    Files.write(root.resolve("Ward/GIS/Copy.shp"), "site".getBytes)   // duplicate
    Files.write(root.resolve("Ward/Docs/Plan.shp"), "plan".getBytes)
    Files.write(root.resolve("Ward/Docs/readme.txt"), "skip".getBytes)

    val client = new InMemoryGatherClient(spark)
    // seed: one project that was renamed on disk (old path, same content md5)
    val planMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("plan".getBytes).map("%02x".format(_)).mkString
    client.seedProject(500L, "Old/Plan.shp", planMd5)
    // seed: one orphan project -> archive
    client.seedProject(501L, "Gone/Missing.shp", "0" * 32)

    val dw = new DataWarehouseSync(spark,
      GraftConfig(root.toString, rootCategory = "files"), client)

    val r1 = dw.syncFilesystem()
    assert(r1.updates.count() == 1)           // rename detected
    assert(client.archived == Seq(501L))      // orphan archived
    assert(client.projects.count() == 3)      // 500 + created Site + created Copy? (dup alias)
    val matched1 = dw.syncCategories()
    assert(client.categories.count() == 3)    // files/Ward, files/Ward/GIS, files/Ward/Docs

    // second run: converged — no actions
    val r2 = dw.syncFilesystem()
    assert(r2.updates.isEmpty, "no updates on second run")
    assert(r2.archives.isEmpty, "no archives on second run")
    assert(r2.creates.isEmpty, "no creates on second run")
    val matched2 = dw.syncCategories()
    assert(matched2.count() == client.categories.count())
    assert(matched2.count() >= matched1.count())
  }

  test("duplicate server categories make syncCategories throw (DW.js:432-434)") {
    val root = Files.createTempDirectory("graft-e2e2")
    Files.createDirectories(root.resolve("A"))
    Files.write(root.resolve("A/x.shp"), "x".getBytes)
    val client = new InMemoryGatherClient(spark)
    client.applyCategoryCreates(
      spark.createDataFrame(Seq(("files", "files/A", "A", "files/"),
        ("files", "files/A", "A", "files/")))
        .toDF("category", "name", "short_name", "path"))
    val dw = new DataWarehouseSync(spark, GraftConfig(root.toString), client)
    intercept[IllegalStateException] { dw.syncCategories() }
  }
}
