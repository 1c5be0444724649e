package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** X5 — multimodal column plumbing: opaque `BINARY` payloads with typed
  * metadata, and a partition-wise decode/feature-extract stage.
  *
  * The image/audio codecs aren't present in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic stand-in — but the
  * Spark-side plumbing is the real thing a production pipeline needs:
  *  - payloads travel as a `BinaryType` column (never stringified),
  *  - metadata is a typed struct alongside, prunable independently,
  *  - decoding runs via `mapPartitions` over a typed Dataset — the Scala
  *    analogue of `mapInPandas`: batch-at-a-time, codec state initialized
  *    once per partition (where a real decoder would open its context),
  *    output schema fixed by the `Decoded` encoder.
  *
  * At 100 TB payloads would live in Parquet binary columns (or pointers
  * into object storage); the decode stage parallelizes per partition with
  * no driver involvement and no shuffle.
  */
object Multimodal {

  /** One binary payload + its typed metadata. */
  final case class Payload(doc_id: Long, content: Array[Byte],
                           n_bytes: Long, content_sig: String)

  /** Deterministic fake of a decoded asset. A real implementation would
    * replace [[decodeOne]]'s body with the codec call; everything else
    * (schema, batching, partitioning) stays as-is.
    */
  final case class Decoded(doc_id: Long, n_bytes: Long, checksum: Long,
                           fake_width: Long, fake_height: Long)

  /** Documents as binary payloads (text bytes stand in for media bytes). */
  def payloads(spark: SparkSession, dir: String): Dataset[Payload] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("content"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        substring(md5(col("text")), 1, 8).as("content_sig"))
      .as[Payload]
  }

  /** STUB — deterministic fake decode: byte-sum checksum + fake dims
    * derived from the first bytes. Replace with the real codec.
    */
  private def decodeOne(p: Payload): Decoded = {
    var sum = 0L
    var i = 0
    while (i < p.content.length) { sum += p.content(i) & 0xff; i += 1 }
    Decoded(p.doc_id, p.n_bytes, sum % 997,
      fake_width = 16 + (p.content.headOption.getOrElse(0: Byte) & 0xff) % 16,
      fake_height = 16 + (p.content.lastOption.getOrElse(0: Byte) & 0xff) % 16)
  }

  /** The decode stage: one codec context per partition, streamed rows.
    * Deliberately `mapPartitions` even though the stub math is expressible
    * in built-ins — per-partition codec-context placement is the point
    * being demonstrated; [[metaQuery]] is the pure-Catalyst twin for
    * everything that doesn't need the codec.
    */
  def decodeStub(spark: SparkSession, dir: String): Dataset[Decoded] = {
    import spark.implicits._
    payloads(spark, dir).mapPartitions { it =>
      // real impl: open codec/context here, close after the iterator
      it.map(decodeOne)
    }
  }

  /** Oracle-checked query form: decoded features, ordered. (The byte-sum
    * checksum is reproducible in SQL because the fixture text is ASCII —
    * byte sum == codepoint sum.)
    */
  def decodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeStub(spark, dir).toDF().orderBy("doc_id")

  /** Frame sampling — the video-ish member of the X5 family: k frames per
    * payload at deterministic evenly-spaced byte offsets, each frame a
    * bounded slice with its own content signature. Bounded ×k fan-out
    * (explode of a literal sequence), narrow, no shuffle; a real codec
    * would replace the byte-slice with a frame decode at the same offsets
    * and the schema/partitioning would not change.
    */
  def frameSample(spark: SparkSession, dir: String,
                  k: Int = 4, frameLen: Int = 16): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .select(col("doc_id"), col("text"), col("n_bytes"),
        explode(expr(s"sequence(0, ${k - 1}L)")).as("frame_idx"))
      .withColumn("off",
        when(col("n_bytes") > frameLen,
          expr(s"((n_bytes - $frameLen) * frame_idx) div ${k - 1}"))
          .otherwise(lit(0L)))
      .withColumn("frame", expr(s"substr(text, off + 1, $frameLen)"))
      .select(col("doc_id"), col("frame_idx"), col("off"),
        octet_length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_sig"))
      .orderBy("doc_id", "frame_idx")

  /** Resize — stride-2 byte subsampling, the raw-payload analog of a
    * nearest-neighbour downsample: keep every 2nd byte, emit the new
    * payload's size/signature and the halved fake dimensions. Narrow
    * per-row transform; a real codec would decode, resample pixels and
    * re-encode at the same place in the plan.
    *
    * The stride is a single regexp pass — each `(.)(.)` pair collapses to
    * its first char, a trailing odd char survives unmatched — instead of
    * materializing a per-character array and re-joining it (~10× less
    * allocation, and total on empty text, where the old
    * `sequence(1, 0, 2)` form throws).
    */
  def resize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .withColumn("small",
        regexp_replace(col("text"), "(?s)(.).", "$1"))
      .select(col("doc_id"), col("n_bytes"),
        octet_length(col("small")).cast("long").as("small_bytes"),
        md5(col("small")).as("small_sig"),
        (lit(16L) + pmod(ascii(substring(col("text"), 1, 1)).cast("long"), lit(16L)))
          .as("orig_width"),
        ((lit(16L) + pmod(ascii(substring(col("text"), 1, 1)).cast("long"), lit(16L)))
          / lit(2)).cast("long").as("small_width"))
      .orderBy("doc_id")

  /** Multimodal → ANN bridge: a deterministic 8-dim "feature embedding"
    * extracted from each payload (md5 of the content, 4 hex nibbles per
    * dimension scaled to [-1, 1) — the stand-in for a real image/audio
    * encoder, exactly like [[decodeOne]] stands in for a codec), then a
    * broadcast-query cosine top-k over the derived vectors through the
    * same fused [[graft.functions.CosineSim]] kernel the embeddings
    * table uses. Every step is integral-derived doubles, so the whole
    * extract→embed→match pipeline is exactly oracle-able — the plumbing
    * (payload column → vector column → ANN) is the production shape; only
    * the encoder body is fake.
    */
  def embedTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    graft.functions.CosineSim.register(spark)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .withColumn("emb", array((0 until 8).map(j =>
        conv(substring(col("h"), j * 4 + 1, 4), 16, 10).cast("double")
          / lit(32768.0) - lit(1.0)): _*))
    val q = base.filter(col("doc_id") === 0)
      .select(col("emb").as("qemb"))
    base.filter(col("doc_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("cos", graft.functions.CosineSim.cosine(col("emb"), col("qemb")))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_bytes"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Metadata-only scan — proves the binary column prunes away (check
    * `ReadSchema` in `.explain`: content is not read).
    */
  def metaQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        substring(md5(col("text")), 1, 8).as("content_sig"),
        when(substring(col("text"), 1, 1).between("a", "m"), "bucket_am")
          .otherwise("bucket_nz").as("shard"))
      .orderBy("doc_id")
}
