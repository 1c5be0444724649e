package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** X5 — multimodal column plumbing: opaque `BINARY` payloads with typed
  * metadata, and a partition-wise decode/feature-extract stage.
  *
  * The image leg is a REAL codec: payloads are genuine PNG files
  * (encoded per-partition from deterministic test-card pixels, since the
  * read-only fixtures carry no media) and [[decodePng]] decodes them
  * with JDK `javax.imageio` — actual DEFLATE inflate + raster traversal,
  * no byte-sum stand-in. The Spark-side plumbing is the production
  * shape:
  *  - payloads travel as a `BinaryType` column (never stringified),
  *  - metadata is carried alongside, prunable independently,
  *  - codec stages run via `mapPartitions` over typed Datasets — the
  *    Scala analogue of `mapInPandas`: batch-at-a-time, codec state per
  *    partition, output schema fixed by the case-class encoder.
  *
  * Because the pixels are a stated function of (doc_id, n_chars) and PNG
  * is lossless, the decoded width/height/pixel-checksum are exactly
  * oracle-able in SQL — the oracle recomputes them arithmetically, so a
  * broken encode OR a broken decode fails the hash gate.
  *
  * At 100 TB payloads would live in Parquet binary columns (or pointers
  * into object storage); the codec stages parallelize per partition with
  * no driver involvement and no shuffle.
  */
object Multimodal {

  /** One binary payload + its typed metadata. */
  final case class Payload(doc_id: Long, content: Array[Byte],
                           n_bytes: Long, content_sig: String)

  /** A real binary media payload (PNG bytes). */
  final case class ImagePayload(doc_id: Long, content: Array[Byte])

  /** Features read back from a decoded raster. */
  final case class DecodedImage(doc_id: Long, width: Long, height: Long,
                                px_checksum: Long)

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

  /** Deterministic grayscale test-card pixel: v(d, x, y) = (31d + 7x +
    * 13y) mod 256. Stated arithmetic so the oracle can recompute the
    * decoded raster exactly.
    */
  private def pixel(d: Long, x: Int, y: Int): Int =
    java.lang.Math.floorMod(d * 31 + x * 7 + y * 13, 256).toInt

  /** The encode stage: each document becomes a REAL PNG (dimensions
    * 8 + doc_id mod 9 × 8 + n_chars mod 9, test-card pixels) via
    * `javax.imageio` inside `mapPartitions`. In production the payload
    * column arrives from storage already encoded; synthesizing it here
    * keeps the read-only fixtures untouched while making every
    * downstream byte genuinely PNG.
    */
  def pngPayloads(spark: SparkSession, dir: String): Dataset[ImagePayload] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val w = (8 + java.lang.Math.floorMod(id, 9)).toInt
          val h = (8 + java.lang.Math.floorMod(nChars, 9)).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = pixel(id, x, y)
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          ImagePayload(id, bos.toByteArray)
        }
      }
  }

  /** The decode stage: one codec pass per partition, streamed rows —
    * `ImageIO.read` inflates the PNG and the checksum walks the decoded
    * raster (one channel; the test card is grayscale so all three
    * agree). PNG byte LENGTH is deliberately not surfaced: it depends
    * on the encoder's DEFLATE choices, while the decoded pixels are
    * lossless and engine-portable.
    */
  def decodePng(spark: SparkSession, dir: String): Dataset[DecodedImage] = {
    import spark.implicits._
    pngPayloads(spark, dir).mapPartitions { it =>
      it.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.content))
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += img.getRGB(x, y) & 0xff
            x += 1
          }
          y += 1
        }
        DecodedImage(p.doc_id, img.getWidth.toLong, img.getHeight.toLong, sum)
      }
    }
  }

  /** Oracle-checked query form: real decoded features, ordered. */
  def decodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodePng(spark, dir).toDF().orderBy("doc_id")

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

  /** One 64-bit average-hash per decoded payload. */
  final case class ImageHash(doc_id: Long, ahash: Long)

  /** X136 stage 1 — perceptual hashing over the REAL decode path:
    * each PNG is inflated by `javax.imageio`, nearest-neighbour-sampled
    * to an 8×8 grid, and aHashed (bit i set ⟺ sample i above the grid
    * mean, compared as the exact integer cross-product `64·v > Σv` —
    * no float mean). Because the test-card raster is stated arithmetic
    * (see [[pngPayloads]]) and PNG is lossless, the oracle recomputes
    * the very same 64-bit hashes without any codec — a broken encode,
    * decode, or sampler all fail the hash gate.
    */
  def pngAHashes(spark: SparkSession, dir: String): Dataset[ImageHash] = {
    import spark.implicits._
    pngPayloads(spark, dir).mapPartitions { it =>
      it.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.content))
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](64)
        var s = 0L
        var i = 0
        while (i < 64) {
          val v = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8) & 0xff
          px(i) = v
          s += v
          i += 1
        }
        var bits = 0L
        i = 0
        while (i < 64) {
          if (px(i) * 64L > s) bits |= 1L << i
          i += 1
        }
        ImageHash(p.doc_id, bits)
      }
    }
  }

  /** X136: perceptual near-duplicate image join — all payload pairs
    * whose aHashes differ in ≤ `maxHam` bits. The pair space is pruned
    * by the pigeonhole split: at Hamming ≤ 1 the two 32-bit halves
    * cannot BOTH differ, so candidates are the union of two EQUI-joins
    * (one per half) — lossless, and never an all-pairs scan (the same
    * banding argument as the SimHash entry, at image-hash granularity).
    * The oracle brute-forces the quadratic form at gate scale, which is
    * exactly the losslessness proof.
    */
  def phashPairs(spark: SparkSession, dir: String,
                 maxHam: Int = 1): DataFrame = {
    val hs = pngAHashes(spark, dir).toDF()
      .withColumn("lo", expr("ahash & 4294967295"))
      .withColumn("hi", expr("shiftrightunsigned(ahash, 32)"))
    def half(key: String): DataFrame =
      hs.select(col("doc_id").as("doc_a"), col("ahash").as("ha"),
          col(key).as("k"))
        .join(hs.select(col("doc_id").as("doc_b"), col("ahash").as("hb"),
          col(key).as("k")), Seq("k"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
    half("lo").unionByName(half("hi")).distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHam)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("doc_a", "doc_b")
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
