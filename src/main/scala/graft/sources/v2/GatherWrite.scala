package graft.sources.v2

import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.client.HttpGatherClient

/** DataSourceV2 write path of the gather source — the mutation boundary
  * the reference crosses at DW.js:297,357,381,419,450 (K1-K4), symmetric
  * with the [[GatherScan]] read boundary: `df.write.format("gather")
  * .option("url", ...).mode("append").save()` plans a real V2
  * `BatchWrite`, and the deliveries run executor-side per partition with
  * Spark-managed task retry/commit semantics instead of a hand-rolled
  * `foreachPartition` loop.
  *
  * Transports mirror the scan:
  *
  *  - `http(s)://` — each partition POSTs its rows as JSON-array batches
  *    of at most `batchSize` rows through [[HttpGatherClient.post]], every
  *    batch carrying an md5-of-payload `Idempotency-Key`. Task retries
  *    replay the partition; deterministic input order reproduces the same
  *    batch bodies and therefore the same keys, so a keying server
  *    deduplicates replays — at-least-once delivery, exactly-once effect.
  *  - anything else — a landing directory: each partition streams JSON
  *    lines to a hidden temp file and atomically renames it to
  *    `part-NNNNN.jsonl` on task commit (driver commit coordination keeps
  *    concurrent attempts from double-committing). A landing dir holds ONE
  *    action batch: re-landing the same batch overwrites the same part
  *    names with identical bytes (idempotent replay), and the job-level
  *    commit removes batch parts a previous landing left that this batch
  *    did not rewrite — so the dir always reads back as exactly the last
  *    committed batch. The [[GatherScan]] file transport reads it back.
  *
  * Append-only by design: an action table is a batch of deliveries, not a
  * table state — there is nothing to truncate or overwrite.
  */
private[v2] class GatherWriteBuilder(schema: StructType, url: String,
                                     retries: Int, batchSize: Int,
                                     token: Option[String] = None)
    extends WriteBuilder {
  override def build(): Write = GatherWrite(schema, url, retries, batchSize, token)
}

private[v2] final case class GatherWriteCommit(partitionId: Int, rows: Long)
  extends WriterCommitMessage

private[v2] final case class GatherWrite(schema: StructType, url: String,
                                         retries: Int, batchSize: Int,
                                         token: Option[String] = None)
    extends Write with BatchWrite with StreamingWrite
    with DataWriterFactory with StreamingDataWriterFactory {

  override def toBatch: BatchWrite = this

  /** The continuous form of the same delivery — the reference is a daemon
    * (DW.js:32,67: every watch-idle cycle re-syncs), so the action stream
    * can `writeStream` straight into this sink: each micro-batch epoch
    * delivers like one batch write. Epoch replay (the streaming retry
    * unit) is idempotent the same two ways — landed part files carry the
    * epoch in their name, so a replayed epoch overwrites its own files;
    * HTTP batches reproduce their bodies and idempotency keys.
    */
  override def toStreaming: StreamingWrite = this

  override def description(): String =
    s"GatherWrite url=$url, batchSize=$batchSize"

  // both parent traits supply the same default; Scala requires the
  // diamond be resolved explicitly — keep driver commit coordination so
  // only one task attempt commits a partition (the rename-commit relies
  // on it for single-writer part files)
  override def useCommitCoordinator(): Boolean = true

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = this
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = this

  // HTTP deliveries are per-task (POST batches); for a landing DIRECTORY
  // the job-level commit enforces the one-batch-per-dir contract: batch
  // part files from a PREVIOUS landing that this batch did not rewrite
  // (fewer partitions, or a partition that went empty and so renamed no
  // file) are removed, so the directory always reads back as exactly the
  // last committed batch — never a stale mix. Epoch-named streaming parts
  // (part-EEEEE-PPPPP) are untouched: epochs accumulate by design.
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (!isHttp) {
      val kept = messages.collect {
        case GatherWriteCommit(p, rows) if rows > 0 => f"part-$p%05d.jsonl"
      }.toSet
      val dir = Paths.get(
        if (url.startsWith("file:")) URI.create(url).getPath else url)
      if (Files.isDirectory(dir)) {
        import scala.jdk.CollectionConverters._
        // Files.list holds a directory-stream fd until closed — a leak per
        // committed landing if left to GC.
        val stream = Files.list(dir)
        try {
          stream.iterator().asScala
            .filter { f =>
              val n = f.getFileName.toString
              n.matches("part-\\d{5}\\.jsonl") && !kept(n)
            }
            .foreach(f => Files.deleteIfExists(f))
        } finally stream.close()
      }
    }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()

  private def isHttp: Boolean = {
    val s = url.takeWhile(_ != ':').toLowerCase
    s == "http" || s == "https"
  }

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    if (isHttp) new HttpBatchWriter(schema, url, retries, batchSize, partitionId, token)
    else new LandingFileWriter(schema, url, partitionId, taskId, epoch = None)

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    if (isHttp) new HttpBatchWriter(schema, url, retries, batchSize, partitionId, token)
    else new LandingFileWriter(schema, url, partitionId, taskId, epoch = Some(epochId))
}

/** Schema-typed JSON rendering shared by both writers — the exact dual of
  * [[GatherPartitionReader.toRow]]'s type support.
  */
private[v2] abstract class JsonRowWriter(schema: StructType)
    extends DataWriter[InternalRow] {
  private val mapper = new ObjectMapper()

  protected def rowJson(row: InternalRow): String = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case LongType    => node.put(f.name, row.getLong(i))
        case IntegerType => node.put(f.name, row.getInt(i))
        case DoubleType  => node.put(f.name, row.getDouble(i))
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case StringType  => node.put(f.name, row.getUTF8String(i).toString)
        case other => throw new IllegalArgumentException(
          s"gather sink: unsupported field type $other for ${f.name}")
      }
    }
    mapper.writeValueAsString(node)
  }
}

/** POSTs JSON-array batches of at most `batchSize` rows; the final,
  * possibly short batch flushes on commit (a task that never reaches
  * commit re-POSTs the same deterministic chunks on retry — deduped by
  * the md5-of-body idempotency key).
  */
private[v2] final class HttpBatchWriter(schema: StructType, url: String,
                                        retries: Int, batchSize: Int,
                                        partitionId: Int,
                                        token: Option[String] = None)
    extends JsonRowWriter(schema) {

  private val buf = new scala.collection.mutable.ArrayBuffer[String](batchSize)
  private var rows = 0L

  private def flush(): Unit = if (buf.nonEmpty) {
    HttpGatherClient.post(url, buf.mkString("[", ",", "]"), retries, token)
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    buf += rowJson(row)
    rows += 1
    if (buf.length >= batchSize) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    GatherWriteCommit(partitionId, rows)
  }

  // already-POSTed chunks can't be recalled; the replay of this partition
  // reproduces their bodies and keys, so the server discards them
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

/** Streams JSON lines to a hidden temp file, atomically renamed to its
  * final `part-NNNNN.jsonl` name on task commit. Empty partitions land no
  * file. Local/mounted filesystems only — the production transport at
  * cluster scale is HTTP (or Spark's own parquet/json writers for bulk
  * landing), which is why the rename-commit here stays deliberately
  * simple.
  */
private[v2] final class LandingFileWriter(schema: StructType, url: String,
                                          partitionId: Int, taskId: Long,
                                          epoch: Option[Long])
    extends JsonRowWriter(schema) {

  private val dir: Path =
    if (url.startsWith("file:")) Paths.get(URI.create(url)) else Paths.get(url)
  // streaming epochs own their file names: a replayed epoch (the
  // streaming retry unit) overwrites its own parts, never a neighbour's
  private val stem = epoch match {
    case Some(e) => f"part-$e%05d-$partitionId%05d"
    case None    => f"part-$partitionId%05d"
  }
  private val target = dir.resolve(s"$stem.jsonl")
  private val tmp = dir.resolve(f".$stem%s.$taskId%d.tmp")

  private var out: java.io.BufferedWriter = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      Files.createDirectories(dir)
      out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    }
    out.write(rowJson(row)); out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) {
      out.close(); out = null
      // rename(2) semantics: replaces an existing target atomically, so a
      // re-landed batch (or a committed retry) can never interleave bytes
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    }
    GatherWriteCommit(partitionId, rows)
  }

  override def abort(): Unit = close0(delete = true)
  override def close(): Unit = close0(delete = false)

  private def close0(delete: Boolean): Unit = {
    if (out != null) { out.close(); out = null }
    if (delete) Files.deleteIfExists(tmp)
  }
}
