package graft.sink

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K1-K5 — action sinks.
  *
  * The reference fires client calls per row, unawaited (create DW.js:351-375,
  * update DW.js:294-309, archive DW.js:376-389, category create/remove
  * DW.js:419-426,449-451) — racy and non-idempotent (SURVEY.md §7.4#3).
  * Here every sync run *computes* its action tables first
  * ([[graft.sync.Pipeline]]); applying them is a separate, explicitly
  * batched step:
  *
  *  - [[applyPartitioned]] drives an arbitrary client callback per
  *    partition on the executors (connection per partition, not per row,
  *    and not on the driver) — the production path for a REST/JDBC client.
  *  - [[toSqlInsert]] renders the reference's `_toSql` INSERT statement
  *    (DW.js:744-755) faithfully — including its quirks (double-quoted
  *    values, JSON-stringified metadata) — for parity tests; real
  *    relational delivery would be `df.write.jdbc`.
  */
object Actions {

  /** Apply an action table by calling `send` for each batch of rows, one
    * client per partition. `send` must be idempotent — a failed task
    * retries its whole partition. The escape hatch for arbitrary clients
    * (JDBC, queues); REST delivery goes through [[applyV2]].
    */
  def applyPartitioned(actions: DataFrame)(send: Iterator[Row] => Unit): Unit =
    actions.foreachPartition(send)

  /** Apply an action table through the gather DataSourceV2 write boundary
    * ([[graft.sources.v2.GatherWriteBuilder]]) — symmetric with the V2
    * scan the read side uses, with Spark-managed task retry/commit
    * semantics. `http(s)` urls POST idempotency-keyed JSON batches per
    * partition; other urls land JSON-lines part files in a directory.
    */
  def applyV2(actions: DataFrame, url: String, retries: Int = 3,
              batchSize: Int = 1000, token: Option[String] = None): Unit =
    token.foldLeft(
      actions.write.format(graft.sources.v2.GatherSource.Format)
        .option("url", url)
        .option("retries", retries)
        .option("batchSize", batchSize))((w, t) => w.option("token", t))
      .mode("append")
      .save()

  /** Faithful `_toSql` (DW.js:744-755): one multi-row INSERT, values
    * double-quoted, metadata JSON-stringified, columns
    * (type, name, metadata, shortName).
    */
  def toSqlInsert(categories: Seq[Row]): String = {
    val keys = Seq("type", "name", "metadata", "shortName")
    val rows = categories.map { r =>
      val metaJson =
        """{"iam":"gatherbot","selectable":false,"editable":false}"""
      val vals = Map(
        "type" -> r.getAs[String]("category"),
        "name" -> r.getAs[String]("name"),
        "metadata" -> metaJson,
        "shortName" -> r.getAs[String]("short_name"))
      "\"" + keys.map(vals).mkString("\", \"") + "\""
    }
    s"INSERT INTO $$tablename (" + keys.mkString(", ") +
      ") VALUES (" + rows.mkString("), \n (") + ");"
  }

  /** Relational form of K5 for the oracle: one VALUES fragment per
    * category row (the reference's row-rendering loop as a column).
    */
  def sqlInsertRows(categories: DataFrame): DataFrame = {
    val metaJson =
      """{"iam":"gatherbot","selectable":false,"editable":false}"""
    categories.select(
      col("name"),
      concat(
        lit("(\""), col("category"),
        lit("\", \""), col("name"),
        lit("\", \"" + metaJson + "\", \""), col("short_name"),
        lit("\")")).as("values_fragment"))
      .orderBy("name")
  }
}
