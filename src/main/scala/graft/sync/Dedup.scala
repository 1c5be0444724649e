package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J7/A1 — duplicate marking (`_markDuplicates`, DW.js:312-348).
  *
  * The reference runs an O(n²) `indexOf`-inside-`filter` scan: the first
  * file (array order) per md5 is canonical and collects the inos of later
  * copies in `duplicates`; each later copy points back via `alias`.
  *
  * Spark restatement: one hash-shuffle on `md5` + window functions — O(n).
  * "First in array order" becomes "lowest `ord`" (deterministic surrogate,
  * SURVEY.md §7.4). At 100 TB scale the md5 shuffle is the hot spot; key
  * skew only arises from pathologically duplicated content, which AQE's
  * skew-join/partition splitting handles (no salting needed because window
  * partitions are processed per-key, and a single md5 group is bounded by
  * the duplicate count of one object).
  */
object Dedup {

  /** Input: files(ord, ino, size, file, md5).
    * Output: input + alias BIGINT (canonical ino, null on canonicals),
    * n_duplicates BIGINT (count of later copies, 0 unless canonical of a
    * duplicate group), duplicates_csv STRING (ascending inos of the copies,
    * null unless a dup group canonical).
    */
  def markDuplicates(files: DataFrame): DataFrame = {
    val byMd5 = Window.partitionBy("md5").orderBy("ord")
    val grp   = Window.partitionBy("md5")
    files
      .withColumn("rn", row_number().over(byMd5))
      .withColumn("grp_n", count(lit(1)).over(grp))
      .withColumn("canonical_ino", first("ino").over(byMd5))
      .withColumn("dup_inos",
        sort_array(collect_list(when(col("rn") > 1, col("ino"))).over(grp)))
      .withColumn("alias", when(col("rn") > 1, col("canonical_ino")))
      .withColumn("n_duplicates",
        when(col("rn") === 1 && col("grp_n") > 1, col("grp_n") - 1)
          .otherwise(lit(0L)))
      .withColumn("duplicates_csv",
        when(col("rn") === 1 && col("grp_n") > 1,
          array_join(transform(col("dup_inos"), _.cast("string")), ",")))
      .drop("rn", "grp_n", "canonical_ino", "dup_inos")
  }

  /** O1 — the duplicate report sort (DW.js:109-133): md5 ascending,
    * canonical-with-duplicates first within a group, else scan order.
    * (`localeCompare` on ASCII hex == binary ordering, SURVEY.md §7.4.)
    * Only rows that are part of a duplicate relationship are reported
    * (filter `duplicates || alias`, DW.js:125).
    */
  def duplicateReport(marked: DataFrame): DataFrame =
    marked
      .filter(col("alias").isNotNull || col("n_duplicates") > 0)
      .select(
        col("md5"), col("ino"),
        element_at(split(col("file"), "/"), -1).as("basename"),
        col("file"),
        col("alias").isNotNull.as("is_alias"))
      .orderBy(col("md5"), col("is_alias").asc, col("ino"))
}
