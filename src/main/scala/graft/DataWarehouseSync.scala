package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.FileInventory
import graft.sync.{Categories, Matching, Pipeline, SyncResult}

/** Engine configuration — the reference's `config.json` shape
  * (`example.config.json`: path + rootCategory; iam from DW.js:359).
  */
final case class GraftConfig(
    path: String,
    rootCategory: String = "files",
    iam: String = "gatherbot",
    fileGlob: String = "*.{shp,SHP}")

/** The remote-CMS boundary (the reference's `gather-node-client`),
  * batch-oriented: list calls return DataFrames in the §1.1 record shapes;
  * apply calls receive whole action tables (computed-then-applied,
  * replacing the reference's unawaited per-row calls — SURVEY.md §7.4#3).
  *
  * Implementations: JDBC/REST behind `foreachPartition`
  * ([[graft.sink.Actions.applyPartitioned]]), or [[InMemoryGatherClient]]
  * for tests.
  */
trait GatherClient {
  /** Projects with nested `metadata.file` (may contain null metadata). */
  def listProjects(): DataFrame
  def listArchivedProjects(): DataFrame
  /** Categories: id, category, name, short_name, path, iam. */
  def listCategories(): DataFrame

  def applyCreates(creates: DataFrame): Unit
  def applyUpdates(updates: DataFrame): Unit
  def applyArchives(archives: DataFrame): Unit
  def applyCategoryCreates(cats: DataFrame): Unit
  def applyCategoryRemoves(cats: DataFrame): Unit
}

/** The reference's top-level API (`DataWarehouse`, DW.js:8), Spark-native:
  * `syncFilesystem()` scans `config.path`, reconciles against the client's
  * project list and applies the K1-K3 actions; `syncCategories()`
  * reconciles the folder hierarchy and applies K4. A reference user swaps
  * `new DataWarehouse(config, client)` for
  * `new DataWarehouseSync(spark, config, client)`.
  */
object DataWarehouseSync {
  /** P1/P2 normalization of a nested project list (DW.js:79-84): drop null
    * metadata.file, flatten for the match core. Shared by the batch sync
    * and [[graft.streaming.StreamingSync]].
    */
  def normalizeProjects(projects: DataFrame, defaultIam: String): DataFrame =
    projects
      .filter(col("metadata.file").isNotNull)
      .select(col("id"),
        coalesce(col("metadata.iam"), lit(defaultIam)).as("iam"),
        col("metadata.file.file").as("p_file"),
        col("metadata.file.md5").as("p_md5"),
        col("attributes.proposalAttributes.title").as("title"),
        col("attributes.proposalAttributes.isDataset").as("is_dataset"))
}

class DataWarehouseSync(spark: SparkSession, config: GraftConfig,
                        client: GatherClient) {

  /** P1/P2 normalization of a nested project list (DW.js:79-84): drop null
    * metadata.file, flatten for the match core.
    */
  private def normalize(projects: DataFrame): DataFrame =
    DataWarehouseSync.normalizeProjects(projects, config.iam)

  private def normalizedProjects(): DataFrame = normalize(client.listProjects())

  /** The normalized archived-project list. The reference eagerly fetches
    * and normalizes it (DW.js:74, 85-89) and then never reads the
    * variable — dead code there. Here the relation is *declared* but,
    * being a lazy V2 scan, issues no remote call until a caller actually
    * uses it — a deliberate, documented improvement over the reference's
    * wasted fetch (the declaration in [[syncFilesystem]] preserves the
    * shape of the reference's Promise.all without its cost).
    */
  def normalizedArchivedProjects(): DataFrame =
    normalize(client.listArchivedProjects())

  /** E2 (DW.js:67-258): scan -> dedup -> match -> apply actions. Returns
    * the computed [[SyncResult]] so callers can inspect/report (A2).
    */
  def syncFilesystem(): SyncResult = {
    val files = FileInventory.scan(spark, config.path, config.fileGlob)
    // mirrors the reference's fetch-then-ignore of archived projects
    // (DW.js:74,85-89): the relation is built but, like there, unused
    normalizedArchivedProjects()
    // ST3 snapshot isolation: the V2 list relations are lazy (each job
    // re-reads the endpoint), so pin one remote snapshot per run — every
    // action table of this sync is computed against the same list state,
    // like the reference's single Promise.all fetch (DW.js:74). The action
    // tables themselves stay persisted (they are small — the run's output)
    // so the returned SyncResult remains consistent with what was applied;
    // the input lists are released once the actions are materialized.
    val projects = normalizedProjects().persist()
    val cats = client.listCategories().persist()
    try {
      val r = Pipeline.sync(files, projects, cats, config.rootCategory)
      Seq(r.updates, r.archives, r.creates).foreach(_.persist())
      client.applyUpdates(r.updates)
      client.applyArchives(r.archives)
      client.applyCreates(r.creates)
      r
    } finally { projects.unpersist(); cats.unpersist() }
  }

  /** E3 (DW.js:392-463): folder hierarchy vs server categories; returns
    * matched ids (the reference's resolve value, DW.js:455). Throws on
    * duplicate server keys like the reference (DW.js:432-434).
    */
  def syncCategories(): DataFrame = {
    val files = FileInventory.scan(spark, config.path, config.fileGlob)
    val folder = Categories.folderCats(files, config.rootCategory)
    // one remote snapshot for the whole pass (ST3): the guard, create,
    // remove and matched relations must all see the same list state —
    // unpinned, toRemove/matched would re-fetch a list already mutated
    // by applyCategoryCreates above
    val server = client.listCategories().persist()
    val dups = Categories.duplicateKeyGuard(server)
    if (!dups.isEmpty)
      throw new IllegalStateException(
        "Unexpected multiple results: " + dups.collect().mkString(", "))
    client.applyCategoryCreates(Categories.toCreate(folder, server))
    client.applyCategoryRemoves(Categories.toRemove(folder, server))
    val matched = Categories.matched(folder, server).select("id").persist()
    matched.count() // materialize under the snapshot before releasing it
    server.unpersist()
    matched
  }
}
