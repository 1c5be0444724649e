package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.types.StructType

/** §1 data model — the reference's duck-typed JS records as fixed Scala
  * case classes (SURVEY.md §1.1), used at API boundaries where type safety
  * helps; the relational core stays DataFrame-shaped so Catalyst sees
  * plain columns.
  */
object Schemas {

  /** File record (DW.js:48-56, enriched per §1.1). */
  final case class FileStats(size: Long, ino: Long)
  final case class FileRecord(
      file: String, md5: String, stats: FileStats,
      duplicates: Option[Seq[Long]] = None, alias: Option[Long] = None,
      project: Option[Long] = None, `match`: Option[String] = None)

  /** Project record (DW.js:79-81, 264-283, 357-367). */
  final case class FileRef(file: String, md5: String)
  final case class ProjectMetadata(iam: String, file: FileRef)
  final case class ProposalAttributes(title: String, isDataset: Boolean)
  final case class ProjectAttributes(proposalAttributes: ProposalAttributes)
  final case class ProjectRecord(
      id: Long, metadata: ProjectMetadata, attributes: ProjectAttributes)

  /** Category record (DW.js:683-689, 418). */
  final case class CategoryMetadata(
      iam: String, selectable: Boolean, editable: Boolean)
  final case class CategoryRecord(
      `type`: String, name: String, metadata: CategoryMetadata,
      shortName: String, path: String)

  val fileSchema: StructType = Encoders.product[FileRecord].schema
  val projectSchema: StructType = Encoders.product[ProjectRecord].schema
  val categorySchema: StructType = Encoders.product[CategoryRecord].schema

  /** Typed view of the nested project relation
    * ([[graft.sync.SyncInputs.nestedProjects]] produces this shape).
    */
  def asProjects(df: DataFrame): Dataset[ProjectRecord] = {
    implicit val enc = Encoders.product[ProjectRecord]
    df.as[ProjectRecord]
  }
}
