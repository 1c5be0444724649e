package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** H1/H2 — the folder-category hierarchy, plus J5/J6 category matching
  * (`_addPath` DW.js:616-637, `_flattenTreeChildrenBFS` DW.js:662-709,
  * `syncCategories` DW.js:392-463).
  *
  * The reference builds an in-memory trie per path then BFS-flattens it.
  * Downstream consumption (J5 join) is order-independent, so the Spark
  * derivation is purely relational: explode each file path into its
  * directory-prefix ancestors and `distinct` — one narrow shuffle, no
  * driver-side tree. Row shape per DW.js:683-689 (root row dropped,
  * DW.js:706):
  *   type      = lowercased parent path (root category for depth-1)
  *   name      = root + '/' + full dir path
  *   shortName = leaf segment
  *   path      = parent path + '/'
  */
object Categories {

  /** Input: files(file, ...); output: distinct (type, name, short_name, path). */
  def folderCats(files: DataFrame, rootCategory: String): DataFrame = {
    val parts = split(col("file"), "/")
    files
      .select(slice(parts, lit(1), size(parts) - 1).as("dirs"))
      .filter(size(col("dirs")) > 0)
      // one row per ancestor prefix depth i = 1..#dirs
      .select(col("dirs"), explode(sequence(lit(1), size(col("dirs")))).as("i"))
      .select(
        when(col("i") === 1, lit(rootCategory.toLowerCase))
          .otherwise(lower(concat(lit(rootCategory + "/"),
            array_join(slice(col("dirs"), lit(1), col("i") - 1), "/"))))
          .as("type"),
        concat(lit(rootCategory + "/"),
          array_join(slice(col("dirs"), lit(1), col("i")), "/")).as("name"),
        element_at(col("dirs"), col("i")).as("short_name"),
        when(col("i") === 1, lit(rootCategory + "/"))
          .otherwise(concat(lit(rootCategory + "/"),
            array_join(slice(col("dirs"), lit(1), col("i") - 1), "/"), lit("/")))
          .as("path"))
      .distinct()
  }

  /** P5 — only server categories owned by the bot are reconciled
    * (DW.js:403-405).
    */
  def gatherbotCats(serverCats: DataFrame): DataFrame =
    serverCats.filter(col("iam") === "gatherbot")

  /** J5 guard — duplicate (category, name) keys on the server side make the
    * reference throw (DW.js:432-434). Returned as a relation: non-empty
    * result == assertion failure.
    */
  def duplicateKeyGuard(serverCats: DataFrame): DataFrame =
    gatherbotCats(serverCats)
      .groupBy(col("category"), col("name"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** J5 — folder categories matched to server categories on
    * (type == category AND name == name); matched ids (A3, DW.js:438).
    */
  def matched(folderCats: DataFrame, serverCats: DataFrame): DataFrame = {
    val sc = gatherbotCats(serverCats)
    folderCats.join(sc,
      folderCats("type") === sc("category") && folderCats("name") === sc("name"),
      "inner")
      .select(sc("id"), folderCats("type"), folderCats("name"))
  }

  /** K4 create — folder categories with no server match (DW.js:425-426).
    * Payload shape per the createCategory call (description '', color null).
    */
  def toCreate(folderCats: DataFrame, serverCats: DataFrame): DataFrame = {
    val sc = gatherbotCats(serverCats).select(col("category"), col("name"))
    folderCats.join(sc,
      folderCats("type") === sc("category") && folderCats("name") === sc("name"),
      "left_anti")
      .select(col("name"), col("type").as("category"), lit("").as("description"),
        col("short_name"), col("path"))
  }

  /** J6/K4 remove — server categories not matched by any folder category
    * (DW.js:443-451).
    */
  def toRemove(folderCats: DataFrame, serverCats: DataFrame): DataFrame =
    gatherbotCats(serverCats)
      .join(matched(folderCats, serverCats).select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("category"), col("name"))
}
