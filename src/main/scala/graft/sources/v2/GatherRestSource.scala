package graft.sources.v2

import java.net.{URI, URLEncoder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.client.HttpGatherClient

/** DataSourceV2 `TableProvider` for the Gather CMS list endpoints — the
  * remote-scan boundary the reference crosses at DW.js:74,400 (S6),
  * re-expressed as a first-class Spark source instead of an eager
  * driver-side fetch:
  *
  *  - `spark.read.format("gather").option("url", ...)` plans a real
  *    `BatchScan`; the HTTP GET happens executor-side at scan time, with
  *    the same bounded-retry client the sink path uses.
  *  - Column pruning ([[SupportsPushDownRequiredColumns]]) reaches the
  *    wire as a `fields=` query parameter; limit pushdown
  *    ([[SupportsPushDownLimit]]) is wire-pushed as `limit=` only for
  *    filterless scans (with filters riding along, a server honoring the
  *    limit but ignoring the filters would truncate before filtering and
  *    cost rows, so the limit is then enforced reader-side only). A
  *    cooperating server trims its payload; an ignoring one costs only
  *    bytes — the reader projects/truncates either way, so results are
  *    identical.
  *  - Size statistics ([[SupportsReportStatistics]]): caller-declared
  *    `statsSizeBytes`/`statsRows` (catalog numbers) or the landed
  *    file/dir footprint, scaled by column pruning — so Catalyst
  *    auto-broadcasts small remote lists in joins without per-call-site
  *    `broadcast()` hints (spec'd in GatherRestSourceSpec).
  *  - Simple predicates ([[SupportsPushDownFilters]]: `EqualTo`,
  *    `IsNotNull` on top-level columns) are accepted, forwarded as
  *    `f_<col>=` parameters and re-applied reader-side — the source stays
  *    correct against servers that ignore them.
  *  - `parts=N` plans N input partitions. With `serverPaging=true` each
  *    requests its page via `part=i&parts=N` (the four reference lists
  *    are one logical call each, DW.js:74 — paging is how the same
  *    endpoint shards once a list outgrows one response); without it,
  *    each partition takes a disjoint stripe of the full response, so a
  *    server that ignores unknown params can never duplicate rows.
  *
  * Transports: `http(s)://` via [[HttpGatherClient.get]]; anything else is
  * a local path / `file:` URI (the landed-file case: at list sizes beyond
  * a response body the endpoint pages into object storage and this same
  * scan reads the landing files — each partition takes every
  * `parts`-th line).
  *
  * Wire shape is flat JSON-lines ([[GatherSource.ProjectsSchema]] /
  * [[GatherSource.CategoriesSchema]], selected by `kind`); nesting to the
  * §1.1 API shape is a projection on top (see
  * [[graft.client.HttpGatherClient.listProjects]]), which Catalyst prunes
  * straight through to this scan.
  */
class GatherSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gather"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GatherSource.schemaFor(options)

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GatherTable(schema, new CaseInsensitiveStringMap(properties))
}

object GatherSource {
  /** Flat wire schema of the project list endpoints (DW.js:357-367). */
  val ProjectsSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("iam", StringType),
    StructField("p_file", StringType), StructField("p_md5", StringType),
    StructField("title", StringType), StructField("is_dataset", BooleanType)))

  /** Flat wire schema of the category list endpoint (DW.js:400-426). */
  val CategoriesSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("category", StringType),
    StructField("name", StringType), StructField("short_name", StringType),
    StructField("path", StringType), StructField("iam", StringType)))

  def schemaFor(options: CaseInsensitiveStringMap): StructType =
    options.getOrDefault("kind", "projects") match {
      case "categories" => CategoriesSchema
      case _            => ProjectsSchema
    }

  /** The fully-qualified format name (no META-INF registration needed). */
  val Format: String = classOf[GatherSource].getName
}

private[v2] class GatherTable(tableSchema: StructType,
                              options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"gather(${options.get("url")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    // table-level properties win if the read options lack them
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ o.asScala).asJava)
    new GatherScanBuilder(tableSchema, merged)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ info.options().asScala).asJava)
    new GatherWriteBuilder(
      info.schema(),
      Option(merged.get("url")).getOrElse(
        throw new IllegalArgumentException("gather sink requires a url option")),
      merged.getInt("retries", 3),
      math.max(1, merged.getInt("batchSize", 1000)),
      Option(merged.get("token")))
  }
}

private[v2] class GatherScanBuilder(fullSchema: StructType,
                                    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var limit: Int = -1
  private var pushed: Array[Filter] = Array.empty
  private var aggSpec: Option[GatherAggSpec] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep wire order; an empty requirement (count(*)) still reads rows.
    // In aggregate mode the scan's output schema IS the aggregation
    // schema — pruning requests against it don't name wire columns.
    if (aggSpec.isEmpty)
      required = StructType(
        fullSchema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  // Symmetric with pushAggregation's limit guard: once an aggregate is
  // pushed, a limit ABOVE it must not reach the wire — a cooperating
  // server would truncate the body BEFORE the scan-side aggregation and
  // corrupt count/min/max. (Spark pushes aggregates before limits, so
  // both orders of the hazard are now refused.)
  override def pushLimit(n: Int): Boolean =
    if (aggSpec.isDefined) false else { limit = n; true }
  // isPartiallyPushed stays default-true: Spark re-applies the limit, so a
  // multi-partition scan (each partition truncates to n locally) is exact.

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val topLevel = fullSchema.fieldNames.toSet
    def simple(v: Any): Boolean =
      v == null || v.isInstanceOf[String] || v.isInstanceOf[java.lang.Number] ||
        v.isInstanceOf[java.lang.Boolean]
    val (ok, rest) = filters.partition {
      case EqualTo(a, v) => topLevel.contains(a) && simple(v)
      case In(a, vs)     => topLevel.contains(a) && vs.forall(simple)
      case IsNotNull(a)  => topLevel.contains(a)
      case _ => false
    }
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Global (no GROUP BY) COUNT(*)/COUNT(col)/MIN(col)/MAX(col) compute
    * inside the scan over the (filtered) body — each partition emits one
    * partial row and Spark merges, so an aggregate over a remote list
    * surfaces `parts` rows instead of the whole list. Complete pushdown
    * is claimed only for single-partition scans (one partial IS the
    * final answer); multi-part scans let Spark plan the final merge.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    translateAgg(aggregation).isDefined &&
      math.max(1, options.getInt("parts", 1)) == 1

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    // a pushed limit truncates the body before aggregation — refuse the
    // combination rather than aggregate over a truncated list
    if (limit >= 0) return false
    translateAgg(aggregation) match {
      case Some(spec) => aggSpec = Some(spec); true
      case None => false
    }
  }

  private def topLevel(ref: NamedReference): Option[String] = {
    val names = ref.fieldNames()
    if (names.length == 1 && fullSchema.fieldNames.contains(names(0)))
      Some(names(0))
    else None
  }

  private def translateAgg(aggregation: Aggregation): Option[GatherAggSpec] = {
    if (aggregation.groupByExpressions().nonEmpty) return None
    val funcs = aggregation.aggregateExpressions().map {
      case _: CountStar => Some(GatherAggFunc("count_star", None, LongType))
      case c: Count if !c.isDistinct =>
        c.column() match {
          case r: NamedReference => topLevel(r)
            .map(n => GatherAggFunc("count", Some(n), LongType))
          case _ => None
        }
      case m: Min => m.column() match {
        case r: NamedReference => topLevel(r)
          .map(n => GatherAggFunc("min", Some(n),
            fullSchema(fullSchema.fieldIndex(n)).dataType))
        case _ => None
      }
      case m: Max => m.column() match {
        case r: NamedReference => topLevel(r)
          .map(n => GatherAggFunc("max", Some(n),
            fullSchema(fullSchema.fieldIndex(n)).dataType))
        case _ => None
      }
      case _: AggregateFunc => None
    }
    if (funcs.exists(_.isEmpty)) None
    else Some(GatherAggSpec(funcs.flatten.toIndexedSeq))
  }

  override def build(): Scan = GatherScan(
    url = Option(options.get("url")).getOrElse(
      throw new IllegalArgumentException("gather source requires a url option")),
    parts = math.max(1, options.getInt("parts", 1)),
    retries = options.getInt("retries", 3),
    // paging params are only sent when the caller declares the server
    // implements them; otherwise each partition takes a disjoint stripe
    // of the full response — correct (if byte-wasteful) against servers
    // that ignore unknown query params, instead of silently duplicating
    // every row parts-fold
    serverPaging = options.getBoolean("serverPaging", false),
    wireSchema = fullSchema, required = required, limit = limit,
    pushed = pushed, agg = aggSpec,
    statsSizeBytes = options.getLong("statsSizeBytes", -1L),
    statsRows = options.getLong("statsRows", -1L),
    token = Option(options.get("token")))
}

private[v2] final case class GatherInputPartition(
    requestUrl: String, part: Int, parts: Int, stripe: Boolean, local: Boolean)
  extends InputPartition

/** One pushed aggregate function: op ∈ count_star|count|min|max, its input
  * column (None for count_star) and result type.
  */
private[v2] final case class GatherAggFunc(op: String, column: Option[String],
                                           resultType: DataType)

private[v2] final case class GatherAggSpec(funcs: IndexedSeq[GatherAggFunc]) {
  /** The scan's output schema in aggregate mode (positional — Spark maps
    * pushed-aggregate results by position, names are informational).
    */
  def schema: StructType = StructType(funcs.zipWithIndex.map { case (f, i) =>
    StructField(s"agg_$i", f.resultType, nullable = f.op == "min" || f.op == "max")
  })
  /** Wire columns the aggregation actually reads. */
  def inputColumns: Seq[String] = funcs.flatMap(_.column).distinct
  override def toString: String =
    funcs.map(f => f.column.fold(f.op)(c => s"${f.op}($c)")).mkString(", ")
}

private[v2] final case class GatherScan(url: String, parts: Int, retries: Int,
                                        serverPaging: Boolean,
                                        wireSchema: StructType,
                                        required: StructType, limit: Int,
                                        pushed: Array[Filter],
                                        agg: Option[GatherAggSpec] = None,
                                        statsSizeBytes: Long = -1L,
                                        statsRows: Long = -1L,
                                        token: Option[String] = None)
    extends Scan with Batch with PartitionReaderFactory
    with SupportsReportStatistics {

  override def readSchema(): StructType = agg.fold(required)(_.schema)
  override def toBatch: Batch = this

  /** Size statistics for the join planner. Without them a V2 relation
    * defaults to `defaultSizeInBytes` (effectively ∞), so a join against
    * a 200-row remote list sort-merges both sides; with them Catalyst
    * auto-broadcasts the small list — no `broadcast()` hint at every call
    * site. Priority: caller-declared `statsSizeBytes`/`statsRows` (the
    * catalog numbers a production deployment has) > the landed file/dir
    * footprint for local transports > unknown. Declared-or-measured bytes
    * are then scaled by the pruned-to-wire column ratio, mirroring
    * FileSourceScan's pruning-aware sizing.
    */
  override def estimateStatistics(): Statistics = {
    val raw: Long =
      if (statsSizeBytes >= 0) statsSizeBytes
      else if (!isHttp) localFootprint(Paths.get(
        if (url.startsWith("file:")) URI.create(url).getPath else url))
      else -1L
    val pruned: Long =
      if (raw < 0) -1L
      else math.max(1L,
        raw * math.max(1, readSchema().size) / math.max(1, wireSchema.size))
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (pruned >= 0) java.util.OptionalLong.of(pruned)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (statsRows >= 0) java.util.OptionalLong.of(statsRows)
        else java.util.OptionalLong.empty()
    }
  }

  private def localFootprint(p: java.nio.file.Path): Long =
    try {
      if (Files.isDirectory(p)) {
        // close the directory stream eagerly — each leaked stream pins an fd
        val stream = Files.list(p)
        try stream.iterator().asScala
          .filter(Files.isRegularFile(_)).map(Files.size).sum
        finally stream.close()
      } else if (Files.isRegularFile(p)) Files.size(p)
      else -1L
    } catch { case _: Throwable => -1L }

  /** Mirrors the FileSourceScan explain vocabulary so plan-assert specs
    * (and humans) can check what reached the source.
    */
  override def description(): String =
    s"GatherScan url=$url, parts=$parts, " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"PushedAggregates: [${agg.fold("")(_.toString)}], " +
      s"PushedLimit: ${if (limit >= 0) limit.toString else "none"}, " +
      s"ReadSchema: ${readSchema().catalogString}"

  private def isHttp: Boolean = {
    val s = url.takeWhile(_ != ':').toLowerCase
    s == "http" || s == "https"
  }

  private def requestUrlFor(part: Int): String =
    if (!isHttp) url
    else {
      val enc = (s: String) => URLEncoder.encode(s, "UTF-8")
      // the wire projection must cover the pushed filters' columns too:
      // the reader re-applies them, and Spark trusts accepted filters
      // (no post-scan Filter), so a cooperating server trimming to the
      // *output* columns alone would make every filter read null
      val filterAttrs = pushed.flatMap(_.references)
      // aggregate mode reads the aggregation's input columns, not the
      // (aggregate-shaped) output schema
      val dataCols = agg.fold(required.fieldNames.toSeq)(_.inputColumns)
      val fetchCols = (dataCols ++ filterAttrs).distinct
      val params = (if (serverPaging) Seq(s"part=$part", s"parts=$parts") else Nil) ++
        (if (fetchCols.nonEmpty) Seq(s"fields=${enc(fetchCols.mkString(","))}") else Nil) ++
        // limit= is only safe to send when no filters ride along: a server
        // that honors limit but ignores filters would truncate the body
        // *before* filtering, and the reader's re-filter of the truncated
        // body could return fewer matching rows than exist while Spark
        // trusts the scan as complete. With filters pushed, the limit is
        // enforced reader-side only (an ignoring server costs only bytes;
        // a partially-cooperating one can no longer cost rows).
        (if (limit >= 0 && pushed.isEmpty) Seq(s"limit=$limit") else Nil) ++
        pushed.collect {
          case EqualTo(a, v) => s"f_${enc(a)}=${enc(String.valueOf(v))}"
          // advisory for cooperating servers; the reader re-applies the
          // full typed IN either way (null members can never match).
          // Each VALUE is encoded separately and values are joined with a
          // raw ',' — an embedded comma travels as %2C, so the separator
          // stays unambiguous and a cooperating server can never split a
          // value in two (and drop rows the reader cannot restore)
          case In(a, vs) => s"in_${enc(a)}=" +
            vs.filter(_ != null).map(v => enc(String.valueOf(v))).mkString(",")
          case IsNotNull(a)  => s"nn_${enc(a)}=1"
        }
      url + (if (url.contains('?')) "&" else "?") + params.mkString("&")
    }

  override def planInputPartitions(): Array[InputPartition] =
    (0 until parts).map(i =>
      GatherInputPartition(requestUrlFor(i), i, parts,
        stripe = !isHttp || !serverPaging, local = !isHttp)).toArray

  override def createReaderFactory(): PartitionReaderFactory = this

  /** The continuous form of the scan — the reference daemon re-lists the
    * remote every watch-idle cycle (DW.js:67-74); here each micro-batch
    * trigger is one such poll, re-fetching the list snapshot with the
    * same pushdown/partitioning as the batch scan.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GatherPollStream(this)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GatherInputPartition]
    new GatherPartitionReader(gp, retries, wireSchema, required, limit, pushed, agg, token)
  }
}

/** Poll-sequence offset of the micro-batch list stream: `n` = how many
  * polls have been admitted.
  */
private[v2] final case class GatherPollOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Snapshot-per-trigger poll stream over the same [[GatherScan]]: every
  * admitted micro-batch re-reads the current list (partitioning, pushdown
  * and transports identical to the batch scan — the reader factory IS the
  * scan's). A batch spanning several elapsed polls still reads ONE
  * snapshot: polls are idempotent re-lists, so collapsing them loses
  * nothing — exactly like the reference daemon skipping cycles while
  * busy. `Trigger.AvailableNow` therefore yields exactly one snapshot
  * batch and stops: the per-cycle list the daemon sees, as a bounded
  * streaming read.
  */
private[v2] final class GatherPollStream(scan: GatherScan)
    extends MicroBatchStream {
  private val polls = new java.util.concurrent.atomic.AtomicLong(0L)

  override def initialOffset(): Offset = GatherPollOffset(0L)
  override def latestOffset(): Offset = GatherPollOffset(polls.incrementAndGet())
  override def deserializeOffset(json: String): Offset = {
    val n = json.trim.toLong
    // restart: resync the poll counter past the checkpointed offset so
    // latestOffset keeps advancing monotonically across runs
    polls.updateAndGet(p => math.max(p, n))
    GatherPollOffset(n)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    if (start == end) Array.empty else scan.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Executor-side reader: fetch the partition's body, parse JSON lines
  * strictly (a malformed line fails the task — same FAILFAST posture as
  * the client), re-apply pushed filters, stop at the pushed limit.
  */
private[v2] final class GatherPartitionReader(
    p: GatherInputPartition, retries: Int, wireSchema: StructType,
    required: StructType, limit: Int, pushed: Array[Filter],
    agg: Option[GatherAggSpec] = None, token: Option[String] = None)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()

  private val fieldTypes: Map[String, DataType] =
    wireSchema.fields.map(f => f.name -> f.dataType).toMap

  private val lines: Iterator[String] = {
    val body =
      if (p.local) {
        val path = if (p.requestUrl.startsWith("file:"))
          Paths.get(URI.create(p.requestUrl)) else Paths.get(p.requestUrl)
        // a landing DIRECTORY (the write path's file transport) reads as
        // its part files concatenated in name order — hidden temp files
        // from uncommitted tasks are never visible
        if (Files.isDirectory(path)) {
          val stream = Files.list(path)
          val parts =
            try stream.iterator().asScala
              .filter(f => Files.isRegularFile(f) &&
                !f.getFileName.toString.startsWith("."))
              .toSeq.sortBy(_.getFileName.toString)
            finally stream.close()
          parts.map(f => new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
            .mkString("\n")
        } else new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      } else HttpGatherClient.get(p.requestUrl, retries, token)
    val all = body.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
    // without server-side paging every partition holds the full body:
    // partition i owns every parts-th line (deterministic, disjoint,
    // exhaustive — never a parts-fold duplication)
    if (p.stripe && p.parts > 1)
      all.zipWithIndex.collect { case (l, i) if i % p.parts == p.part => l }
    else all
  }

  private var emitted = 0
  private var current: InternalRow = _

  private def fieldValue(node: JsonNode, name: String): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null else v
  }

  /** Typed equality against the wire schema — raw JSON token text would
    * mis-compare representation variants (`5.0` vs `5`, `"05"` vs `5`),
    * and Spark trusts accepted filters (no post-scan re-check), so a
    * textual mismatch here would silently drop correct rows.
    */
  private def typedEquals(node: JsonNode, a: String, exp: Any): Boolean = {
    val v = node.get(a)
    if (v == null || v.isNull || exp == null) false
    else fieldTypes.getOrElse(a, StringType) match {
      case LongType | IntegerType =>
        v.asLong() == exp.asInstanceOf[Number].longValue()
      case DoubleType =>
        v.asDouble() == exp.asInstanceOf[Number].doubleValue()
      case BooleanType => v.asBoolean() == exp.asInstanceOf[Boolean]
      case _ =>
        (if (v.isTextual) v.asText() else v.toString) == String.valueOf(exp)
    }
  }

  private def matches(node: JsonNode): Boolean = pushed.forall {
    case EqualTo(a, exp) => typedEquals(node, a, exp)
    // SQL IN: a null member can never select a row (x = NULL is unknown),
    // and typedEquals already returns false for null expectations
    case In(a, vs) => vs.exists(typedEquals(node, a, _))
    case IsNotNull(a) => fieldValue(node, a) != null
    case _ => true
  }

  private def toRow(node: JsonNode): InternalRow = {
    val vals = required.fields.map { f =>
      fieldValue(node, f.name) match {
        case null => null
        case n: JsonNode => f.dataType match {
          case LongType    => n.asLong()
          case IntegerType => n.asInt()
          case DoubleType  => n.asDouble()
          case BooleanType => n.asBoolean()
          case StringType  => UTF8String.fromString(
            if (n.isTextual) n.asText() else n.toString)
          case other => throw new IllegalArgumentException(
            s"gather source: unsupported field type $other for ${f.name}")
        }
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  /** Aggregate mode: fold the partition's (filtered) lines into ONE
    * partial row — count/min/max compute where the data is, and a scan
    * over a remote list surfaces `parts` rows instead of the list.
    * Min/max ignore nulls and yield null over zero rows, matching SQL
    * aggregate semantics; string order is binary (DuckDB agrees on
    * ASCII keys).
    */
  private def aggRow(spec: GatherAggSpec): InternalRow = {
    val counts = Array.fill(spec.funcs.length)(0L)
    val extremes = Array.fill[Any](spec.funcs.length)(null)
    def better(op: String, dt: DataType, a: Any, b: Any): Boolean = {
      val c = dt match {
        case LongType | IntegerType =>
          java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
        case DoubleType =>
          java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
        case BooleanType =>
          java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
        case _ => a.asInstanceOf[String].compareTo(b.asInstanceOf[String])
      }
      if (op == "min") c < 0 else c > 0
    }
    while (lines.hasNext) {
      val node = mapper.readTree(lines.next()) // malformed line -> throws
      if (matches(node)) {
        spec.funcs.zipWithIndex.foreach { case (f, i) =>
          f.op match {
            case "count_star" => counts(i) += 1
            case "count" =>
              if (fieldValue(node, f.column.get) != null) counts(i) += 1
            case _ =>
              val v = node.get(f.column.get)
              if (v != null && !v.isNull) {
                val typed: Any = f.resultType match {
                  case LongType | IntegerType => v.asLong()
                  case DoubleType             => v.asDouble()
                  case BooleanType            => v.asBoolean()
                  case _ => if (v.isTextual) v.asText() else v.toString
                }
                if (extremes(i) == null ||
                    better(f.op, f.resultType, typed, extremes(i)))
                  extremes(i) = typed
              }
          }
        }
      }
    }
    val vals: Array[Any] = spec.funcs.zipWithIndex.map { case (f, i) =>
      f.op match {
        case "count_star" | "count" => counts(i)
        case _ => extremes(i) match {
          case null => null
          case s: String => UTF8String.fromString(s)
          case l: Long if f.resultType == IntegerType => l.toInt
          case other => other
        }
      }
    }.toArray
    new GenericInternalRow(vals)
  }

  override def next(): Boolean = {
    agg match {
      case Some(spec) =>
        if (emitted > 0) return false
        current = aggRow(spec)
        emitted += 1
        return true
      case None => ()
    }
    if (limit >= 0 && emitted >= limit) return false
    while (lines.hasNext) {
      val node = mapper.readTree(lines.next()) // malformed line -> throws
      if (matches(node)) {
        current = toRow(node)
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
