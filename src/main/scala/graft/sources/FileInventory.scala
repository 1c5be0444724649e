package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1-S5 — the file-inventory source: what the reference's chokidar watcher
  * + md5-file + fs.statSync pipeline produces (DW.js:32-63), restated as a
  * batch snapshot scan over Spark's `binaryFile` source.
  *
  * - S1 recursive scan: `recursiveFileLookup` (streaming variant in
  *   [[graft.streaming.FileWatch]]).
  * - S2 extension predicate: `pathGlobFilter` pushes the suffix test into
  *   the file *listing* — non-matching files are never opened, the exact
  *   analogue of the reference's filter-before-hash (DW.js:34-44), and
  *   stronger: a `.filter` on the path column after load would still read
  *   every file's bytes.
  * - S3 content hash: `md5(content)` — codegen'd built-in over the binary
  *   column.
  * - S4 stat enrichment: `length`/`modificationTime` come free from the
  *   source; `ino` has no portable equivalent so a deterministic surrogate
  *   is derived from the path hash (SURVEY.md §7.4#4).
  * - S5 relative path: strip the scan root prefix.
  *
  * At 100 TB: binaryFile scans parallelize per file; listing parallelizes
  * via the driver-side listing pool. For billions of tiny files the same
  * schema can be fed from an object-store inventory table instead — every
  * downstream operator only sees the (file, md5, size, ino, ord) relation.
  */
object FileInventory {

  /** binaryFile's fixed schema (streaming sources require it explicitly). */
  val binaryFileSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))

  /** Scan `root` for files matching `glob` (default: the reference's
    * `.shp` test, case handled by a double glob since globs are
    * case-sensitive). Output: file, md5, size, ino, ord — the
    * [[graft.sync]] input relation.
    */
  def scan(spark: SparkSession, root: String,
           glob: String = "*.{shp,SHP}"): DataFrame =
    enrich(spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(root), root)

  /** Derive the (file, md5, size, ino, ord) sync input relation from a raw
    * binaryFile relation — shared by the batch [[scan]] and the per-batch
    * streaming path ([[graft.streaming.StreamingSync]]).
    */
  def enrich(raw: DataFrame, root: String): DataFrame = {
    // \Q...\E-quote the root: a scan path containing regex metacharacters
    // (+, (, [, ...) must strip literally, not as a pattern
    val rel = regexp_replace(col("path"),
      "^file:" + java.util.regex.Pattern.quote(root) + "/?", "")
    val base = raw.select(
      rel.as("file"),
      md5(col("content")).as("md5"),
      col("length").as("size"),
      // stable ino surrogate: 63-bit of xxhash64(path) (no real inode in
      // a distributed scan; sign-masked to stay positive like an inode)
      pmod(xxhash64(rel), lit(Long.MaxValue)).as("ino"))
    // Deterministic scan-order surrogate (the reference's array order is
    // fs-event arrival; we define lexicographic path order, §7.4#1).
    // Range-partitioned sort + zipWithIndex: two distributed passes —
    // NOT a single-partition global window, which would serialize the
    // scan at scale.
    val spark2 = base.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      base.schema.fields :+ org.apache.spark.sql.types.StructField(
        "ord", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = base.orderBy("file").rdd.zipWithIndex.map {
      case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark2.createDataFrame(indexed, schema)
  }

  /** Inventory scan of arbitrary files (no extension filter) — metadata
    * only; column pruning means `content` is never read when the caller
    * doesn't select it or a derivative.
    */
  def inventory(spark: SparkSession, root: String,
                glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(root)
      .select(
        regexp_replace(col("path"), "^file:", "").as("path"),
        col("length"),
        date_format(col("modificationTime"), "yyyy-MM-dd HH:mm:ss").as("mtime"))
}
