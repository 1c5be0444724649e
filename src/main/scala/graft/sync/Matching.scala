package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1/J2 — the prioritized file<->project matching passes
  * (`_getProjectMatch` DW.js:538-571, `_getFileMatch` DW.js:465-536) plus
  * C1/C2 change detection (`_syncProjectFile` DW.js:260-291).
  *
  * The reference runs per-row linear scans over in-memory arrays (O(n·m),
  * order-dependent: "first match" = JS array order, and pass 2 claims files
  * sequentially). The Spark restatement is set-based and order-independent:
  *
  *   - "first match" -> lowest project `id` (the server list is id-ordered);
  *   - pass-2 "not yet claimed" -> the claim set is exactly the output of
  *     pass 1, not earlier pass-2 iterations. Two same-md5 unprocessed
  *     projects would both select the same rank-1 candidate; the reference
  *     would give the second project the next file. Documented deviation
  *     (SURVEY.md §7.4#1) — deterministic, scale-friendly, and equivalent on
  *     any input where unprocessed projects don't share an md5 with two+
  *     available files claimed by competing projects.
  *
  * Join strategy at scale: both passes are equi-joins on (path) and (md5).
  * The projects side is the dimension (≪ file inventory) — Catalyst picks
  * broadcast-hash automatically below the threshold; at 100 TB the joins
  * shuffle on their keys with AQE handling md5 skew. Nothing is collected
  * to the driver.
  */
object Matching {

  /** J1 pass 1 over main (non-alias) files.
    *
    * Input: `marked` from [[Dedup.markDuplicates]];
    * `projects` flat (id, iam, p_file, p_md5, title, is_dataset).
    * Output: main-file rows + project BIGINT (nullable), match STRING
    * ('exactMatch' | 'md5Match' | null), proj_file, proj_md5 (the matched
    * project's recorded path/hash, for C1/C2).
    */
  def pass1(marked: DataFrame, projects: DataFrame): DataFrame = {
    // Deterministic "first" (DW.js:551,564): lowest id per join key.
    val byPath = projects
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_file").orderBy("id")))
      .filter(col("rn") === 1)
      .select(col("p_file"), col("id").as("pe_id"), col("p_md5").as("pe_md5"))
    val byMd5 = projects
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_md5").orderBy("id")))
      .filter(col("rn") === 1)
      .select(col("p_md5"), col("id").as("pm_id"), col("p_file").as("pm_file"))

    marked.filter(col("alias").isNull)
      .join(byPath, marked("file") === byPath("p_file"), "left")
      .join(byMd5, marked("md5") === byMd5("p_md5"), "left")
      .select(
        marked("ord"), marked("ino"), marked("size"), marked("file"),
        marked("md5"), marked("n_duplicates"), marked("duplicates_csv"),
        coalesce(col("pe_id"), col("pm_id")).as("project"),
        when(col("pe_id").isNotNull, "exactMatch")
          .when(col("pm_id").isNotNull, "md5Match")
          .as("match"),
        when(col("pe_id").isNotNull, col("p_file"))
          .otherwise(col("pm_file")).as("proj_file"),
        when(col("pe_id").isNotNull, col("pe_md5"))
          .otherwise(col("p_md5")).as("proj_md5"))
  }

  /** A3 — the distinct claimed-project id set from pass 1 (DW.js:143,158). */
  def processedIds(p1: DataFrame): DataFrame =
    p1.filter(col("project").isNotNull)
      .select(col("project").as("id")).distinct()

  /** J2 pass 2: for each project not claimed in pass 1, pick a file by md5
    * among files not claimed in pass 1 (aliases included, DW.js:473-499).
    * Tie-break (DW.js:500-529): with >1 candidates an exact-path candidate
    * wins and is labeled 'alias exactMatch'; otherwise the first candidate
    * in report order (duplicate-group canonicals first, then scan order) is
    * labeled 'unmatched md5 match' — even when its path matches exactly
    * (single-candidate quirk preserved).
    *
    * Output: one row per matched project: id, p_file, p_md5, ino, file,
    * is_alias, match.
    */
  def pass2(marked: DataFrame, projects: DataFrame, p1: DataFrame): DataFrame = {
    val unproc = projects.join(processedIds(p1), Seq("id"), "left_anti")
    val claimedInos = p1.filter(col("project").isNotNull).select("ino")
    val avail = marked.join(claimedInos, Seq("ino"), "left_anti")
      .select(col("ino"), col("ord"), col("file"), col("md5"),
        col("alias"), col("n_duplicates"))

    val cand = unproc.join(avail, unproc("p_md5") === avail("md5"), "inner")
    val byProject = Window.partitionBy(unproc("id"))
    cand
      .withColumn("n_cand", count(lit(1)).over(byProject))
      .withColumn("has_exact",
        max((col("file") === col("p_file")).cast("int")).over(byProject))
      .withColumn("rn", row_number().over(byProject.orderBy(
        when(col("file") === col("p_file"), 0).otherwise(1),
        when(col("n_duplicates") > 0, 0).otherwise(1),
        col("ord"))))
      .filter(col("rn") === 1)
      .select(
        col("id"), col("p_file"), col("p_md5"), col("ino"), col("file"),
        col("alias").isNotNull.as("is_alias"),
        when(col("n_cand") > 1 && col("has_exact") === 1, "alias exactMatch")
          .otherwise("unmatched md5 match").as("match"))
  }

  /** J2, faithful-greedy variant: reproduces the reference's *sequential*
    * claim semantics exactly (DW.js:465-536) — projects iterate in server
    * order (ascending id) and each claim removes the file from later
    * projects' candidate sets.
    *
    * Claims only interact within one md5 group (candidates are md5-equal),
    * so the global sequential pass decomposes into independent per-md5
    * greedy matches — `cogroup` on md5 distributes them across the
    * cluster; each group is bounded by one content-hash's duplicate count.
    * This closes the set-based deviation of [[pass2]] where same-md5
    * projects could double-claim one alias.
    */
  def pass2Greedy(marked: DataFrame, projects: DataFrame, p1: DataFrame): DataFrame = {
    val spark = marked.sparkSession
    import spark.implicits._

    // tuple-encoded datasets: (id, p_file, p_md5) and
    // (ino, ord, file, is_alias, has_dups, md5)
    val unproc = projects.join(processedIds(p1), Seq("id"), "left_anti")
      .select(col("id"), col("p_file"), col("p_md5"))
      .as[(Long, String, String)]
    val avail = marked
      .join(p1.filter(col("project").isNotNull).select("ino"), Seq("ino"), "left_anti")
      .select(col("ino"), col("ord"), col("file"),
        col("alias").isNotNull, col("n_duplicates") > 0, col("md5"))
      .as[(Long, Long, String, Boolean, Boolean, String)]

    unproc.groupByKey(_._3)
      .cogroup(avail.groupByKey(_._6)) { (_, ps, fs) =>
        // candidates in report order (O1): dup-group canonicals first, then ord
        val candidates = scala.collection.mutable.ArrayBuffer(
          fs.toSeq.sortBy(c => (!c._5, c._2)): _*)
        ps.toSeq.sortBy(_._1).iterator.flatMap { case (id, pFile, pMd5) =>
          if (candidates.isEmpty) Iterator.empty
          else {
            val exactIdx = candidates.indexWhere(_._3 == pFile)
            val multi = candidates.length > 1
            val idx = if (multi && exactIdx >= 0) exactIdx else 0
            val c = candidates.remove(idx)
            val label = if (multi && exactIdx >= 0) "alias exactMatch"
                        else "unmatched md5 match"
            Iterator((id, pFile, pMd5, c._1, c._3, c._4, label))
          }
        }
      }
      .toDF("id", "p_file", "p_md5", "ino", "file", "is_alias", "match")
  }

  /** C1/K2 — metadata updates for renamed files (DW.js:264-280). Faithful
    * quirk: the update writes the file's NEW path with the project's OLD
    * md5 (DW.js:277). Pass-2 matches only sync when the file is an alias
    * (DW.js:186-193).
    */
  def updates(p1: DataFrame, p2: DataFrame): DataFrame = {
    val u1 = p1.filter(col("project").isNotNull && col("file") =!= col("proj_file"))
      .select(col("project").as("id"), col("file").as("new_file"),
        col("proj_md5").as("md5"), lit("pass1").as("src"))
    val u2 = p2.filter(col("is_alias") && col("file") =!= col("p_file"))
      .select(col("id"), col("file").as("new_file"),
        col("p_md5").as("md5"), lit("pass2").as("src"))
    u1.unionByName(u2)
  }

  /** C2 — content-change detection (DW.js:282-284; log-only in the
    * reference, surfaced as a relation here).
    */
  def contentChanged(p1: DataFrame, p2: DataFrame): DataFrame = {
    val c1 = p1.filter(col("project").isNotNull && col("md5") =!= col("proj_md5"))
      .select(col("project").as("id"), col("file"),
        col("md5").as("file_md5"), col("proj_md5").as("project_md5"),
        lit("pass1").as("src"))
    // pass-2 sync only runs for aliases, and the file/project md5s are equal
    // by construction (md5 equi-join) — the branch is provably empty but kept
    // for shape fidelity with DW.js:282-284.
    val c2 = p2.filter(col("is_alias") && lit(false))
      .select(col("id"), col("file"), col("p_md5").as("file_md5"),
        col("p_md5").as("project_md5"), lit("pass2").as("src"))
    c1.unionByName(c2)
  }

  /** K3 — projects to archive: unclaimed after both passes (DW.js:196-200). */
  def archives(projects: DataFrame, p1: DataFrame, p2: DataFrame): DataFrame =
    projects.join(processedIds(p1), Seq("id"), "left_anti")
      .join(p2.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("p_file"), col("p_md5"))

  /** K1/J4 — files to create as new projects: mains unmatched in pass 1
    * (queued at DW.js:163-165 *before* pass 2 runs, so a later pass-2 claim
    * does not unqueue them) plus alias files never claimed (DW.js:211-221).
    * Payload per DW.js:357-367: title = basename minus extension,
    * isDataset = true.
    */
  def creates(marked: DataFrame, p1: DataFrame, p2: DataFrame): DataFrame = {
    val newMains = p1.filter(col("project").isNull)
      .select("ord", "ino", "size", "file", "md5")
    val leftoverAliases = marked.filter(col("alias").isNotNull)
      .join(p2.select(col("ino")), Seq("ino"), "left_anti")
      .select("ord", "ino", "size", "file", "md5")
    newMains.unionByName(leftoverAliases)
      .withColumn("basename", element_at(split(col("file"), "/"), -1))
      // JS `split('.').slice(0,-1).join('.')` yields '' for extensionless
      // names — preserved.
      .withColumn("title",
        when(col("basename").contains("."),
          regexp_replace(col("basename"), "\\.[^.]*$", ""))
          .otherwise(lit("")))
      .drop("basename")
      .withColumn("is_dataset", lit(true))
  }
}
