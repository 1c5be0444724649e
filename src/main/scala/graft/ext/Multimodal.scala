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

  /** Spread a narrow pre-codec relation across the session's
    * parallelism (r14, guide §2.5 input skew): the documents fixture is
    * a single input split at bench SF, so every codec `mapPartitions`
    * leg — the expensive per-item encode/decode work — ran on ONE core.
    * A deterministic hash repartition of the few-bytes-per-row id
    * relation costs a trivial shuffle and parallelizes the codec; when
    * the source already carries at least the session's parallelism
    * (the 100 TB case — many splits), this is a no-op, so nothing is
    * tuned to local mode.
    */
  private def spreadForCodec(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col("doc_id"))
  }

  /** Executor-side codec init (r14): `ImageIO`'s default stream cache
    * is DISK-backed — every encode/decode round-trip creates and
    * deletes a temp FILE, which dwarfs the actual DEFLATE work on the
    * small test-card rasters and serializes partitions on filesystem
    * traffic. Memory-cached streams are pure per-call state; pixels are
    * unaffected. Idempotent, called once per codec closure.
    */
  private def imageIoNoDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

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
    spreadForCodec(Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars")))
      .as[(Long, Long)]
      .mapPartitions { it =>
        imageIoNoDiskCache()
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
        imageIoNoDiskCache()
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

  /** One JPEG round-trip audit row per payload. */
  final case class JpegAudit(doc_id: Long, width: Long, height: Long,
                             n_px: Long, within_tol: Boolean)

  /** Smooth (wrap-free) grayscale ramp for the LOSSY leg: max value
    * (16 + 4·15 + 6·15 = 166) < 255, so the 8×8 DCT sees a clean linear
    * gradient with no mod-256 discontinuity — the PNG test card's wrap
    * edges would ring under quantization and make the loss bound
    * meaningless.
    */
  private def smoothPixel(d: Long, x: Int, y: Int): Int =
    (java.lang.Math.floorMod(d, 17L) + 4L * x + 6L * y).toInt

  /** X154: the second codec leg — JPEG encode + decode through the same
    * `javax.imageio` `mapPartitions` framework as the PNG path, proving
    * the codec plumbing is not PNG-shaped. JPEG is LOSSY, so the
    * byte-exact oracle style of [[decodePng]] cannot apply; instead the
    * oracle states what survives quantization exactly — decoder-read
    * dimensions (wrong dims = broken container parsing) — plus the loss
    * BOUND: `within_tol` is true iff every decoded sample sits within
    * `tol` counts of the stated arithmetic raster. A broken encoder,
    * decoder, or sampler yields false (or a crash/wrong dims) and fails
    * the hash gate; the tolerance itself is pinned tighter (≤ 8 counts
    * measured) in `MultimodalSpec`.
    *
    * Codec state is per partition (one `ImageWriter` reused across the
    * partition's rows — JPEG writer construction is the expensive part),
    * the exact pattern a 100 TB media pipeline needs: no driver
    * involvement, no shuffle, codec instances scale with partitions.
    */
  def jpegRoundTrip(spark: SparkSession, dir: String,
                    tol: Int = 16): Dataset[JpegAudit] = {
    import spark.implicits._
    spreadForCodec(Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars")))
      .as[(Long, Long)]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(0.95f)
        it.map { case (id, nChars) =>
          val w = (8 + java.lang.Math.floorMod(id, 9)).toInt
          val h = (8 + java.lang.Math.floorMod(nChars, 9)).toInt
          // single-component grayscale: no chroma subsampling in the loop
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, smoothPixel(id, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
          ios.close()
          val dec = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          val dr = dec.getRaster
          var maxErr = 0
          y = 0
          while (y < dec.getHeight) {
            var x = 0
            while (x < dec.getWidth) {
              val err = java.lang.Math.abs(
                dr.getSample(x, y, 0) - smoothPixel(id, x, y))
              if (err > maxErr) maxErr = err
              x += 1
            }
            y += 1
          }
          JpegAudit(id, dec.getWidth.toLong, dec.getHeight.toLong,
            dec.getWidth.toLong * dec.getHeight, maxErr <= tol)
        }
      }
  }

  /** Oracle-checked query form of the JPEG leg. */
  def jpegQuery(spark: SparkSession, dir: String): DataFrame =
    jpegRoundTrip(spark, dir).toDF().orderBy("doc_id")

  /** One frame of decoded audio features. */
  final case class PcmFrame(doc_id: Long, frame_idx: Long, n_samples: Long,
                            energy: Long, zero_crossings: Long)

  /** X156: the AUDIO leg of the multimodal family — 16-bit little-endian
    * PCM payloads (the WAV data chunk, sans header) encoded to real
    * bytes, parsed BACK from those bytes, framed at 160 samples (10 ms
    * at 16 kHz — the standard speech hop), and reduced to the two
    * classic VAD features per frame: absolute energy and zero-crossing
    * count. Unlike JPEG this codec is exact, so every output is an
    * INTEGER the oracle recomputes arithmetically — a byte-order bug,
    * off-by-one frame boundary, or sign-extension mistake in the parser
    * shifts energy/ZCR and fails the hash gate.
    *
    * Samples are the stated arithmetic s(d,i) = ((7d + 13i) mod 4096) −
    * 2048 (a wrapping ramp that crosses zero regularly, so ZCR is
    * non-trivial); payload length is 2–5 frames by doc so the framing
    * loop sees varying counts.
    *
    * Scale shape: identical to the image legs — `mapPartitions` over a
    * typed Dataset, one parser per partition, bounded ×frames fan-out,
    * no shuffle, no driver involvement; in production the byte array
    * column arrives from storage and ONLY the synth step disappears.
    */
  def pcmFeatures(spark: SparkSession, dir: String): Dataset[PcmFrame] = {
    import spark.implicits._
    spreadForCodec(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.flatMap { d =>
          val nFrames = (2 + java.lang.Math.floorMod(d, 4)).toInt
          val n = 160 * nFrames
          // encode: int16 LE PCM bytes
          val bytes = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048).toInt
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          // decode: parse the byte buffer back (sign via Short cast)
          val dec = new Array[Int](n)
          i = 0
          while (i < n) {
            dec(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
            i += 1
          }
          (0 until nFrames).map { f =>
            var e = 0L
            var zc = 0L
            var j = 0
            while (j < 160) {
              val v = dec(f * 160 + j)
              e += java.lang.Math.abs(v)
              if (j > 0 && v.toLong * dec(f * 160 + j - 1) < 0) zc += 1
              j += 1
            }
            PcmFrame(d, f.toLong, 160L, e, zc)
          }
        }
      }
  }

  /** Oracle-checked query form of the PCM leg. */
  def pcmQuery(spark: SparkSession, dir: String): DataFrame =
    pcmFeatures(spark, dir).toDF().orderBy("doc_id", "frame_idx")

  /** X261: RMS gain-normalization (AGC) audit — before a speech corpus
    * is level-normalized, the pipeline asks per clip: what gain does
    * RMS-normalizing to the target level apply, and would that gain
    * CLIP any samples (the loudness-vs-headroom trade every AGC stage
    * documents). Target RMS = `targetRms` (3/4 of the synthetic
    * full scale — ABOVE the sawtooth corpus's natural RMS ≈ 1183, so the
    * audit exercises real clipping, not just attenuation). Everything is EXACT int64
    * off the real byte decode: mean-square floors (stated), the clip
    * test |s|·T > FULL·rms is squared into s²·T² > FULL²·ms (no
    * sqrt anywhere — max magnitude 2048²·1536² < 2⁶³), and the gain
    * ships as the scaled integer (T²·10⁶) div ms beside its one
    * rounded dB rendering.
    *
    * Scale shape: the X156 no-shuffle decode; one narrow audit row per
    * clip, one final sort. The relational twin recomputes the synth
    * samples arithmetically (the PCM-leg oracle convention).
    */
  final case class AgcRow(doc_id: Long, n_samples: Long, peak_abs: Long,
                          sum_sq: Long, mean_sq: Long, n_clip_after: Long)

  def pcmAgc(spark: SparkSession, dir: String,
             targetRms: Long = 1536L, fullScale: Long = 2047L): DataFrame = {
    import spark.implicits._
    val rows = spreadForCodec(
        Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { d =>
          val n = 160 * (2 + java.lang.Math.floorMod(d, 4)).toInt
          val bytes = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096)
              - 2048).toInt
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          var peak = 0L
          var sumSq = 0L
          val dec = new Array[Long](n)
          i = 0
          while (i < n) {
            val v = (((bytes(2 * i + 1) & 0xff) << 8) |
              (bytes(2 * i) & 0xff)).toShort.toLong
            dec(i) = v
            if (math.abs(v) > peak) peak = math.abs(v)
            sumSq += v * v
            i += 1
          }
          val meanSq = sumSq / n
          var clip = 0L
          i = 0
          while (i < n) {
            if (dec(i) * dec(i) * (targetRms * targetRms) >
                fullScale * fullScale * meanSq) clip += 1
            i += 1
          }
          AgcRow(d, n.toLong, peak, sumSq, meanSq, clip)
        }
      }.toDF()
    rows.select(col("doc_id"), col("n_samples"), col("peak_abs"),
        col("sum_sq"), col("mean_sq"),
        expr(s"${targetRms * targetRms * 1000000L} div mean_sq")
          .as("gain_sq_e6"),
        col("n_clip_after"),
        round(col("n_clip_after").cast("double") / col("n_samples"), 6)
          .as("clip_share"))
      .orderBy("doc_id")
  }

  /** One (image, luminance-bin) histogram row. */
  final case class LumaBin(doc_id: Long, n_px: Long, bin: Long, cnt: Long)

  /** X236: image luminance-histogram entropy — the flat/degenerate
    * image detector every vision-data QC runs (a uniform test card,
    * a solid color, a two-tone logo all score low; natural images
    * score near the bin limit): the REAL decoded raster is binned into
    * 16 luminance bins (v div 16) inside the codec pass, and entropy
    * comes out relationally as ln(n) − Σ c·ln(c)/n with each c·ln(c)
    * term 6dp-rounded into DECIMAL before the per-image sum (the X151
    * entropy discipline — order-free, no unordered float sum).
    *
    * Scale shape: the no-shuffle `mapPartitions` codec path emits ≤16
    * bounded rows per image; one doc-keyed aggregate closes it.
    */
  def lumaHistogram(spark: SparkSession, dir: String): Dataset[LumaBin] = {
    import spark.implicits._
    pngPayloads(spark, dir).mapPartitions { it =>
        imageIoNoDiskCache()
      it.flatMap { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.content))
        val bins = new Array[Long](16)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            bins((img.getRGB(x, y) & 0xff) / 16) += 1
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        (0 until 16).filter(bins(_) > 0)
          .map(b => LumaBin(p.doc_id, n, b.toLong, bins(b)))
      }
    }
  }

  def imageEntropy(spark: SparkSession, dir: String): DataFrame = {
    val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
    lumaHistogram(spark, dir).toDF()
      .withColumn("t", round(col("cnt") * log(col("cnt").cast("double")), 6)
        .cast(D6))
      .groupBy("doc_id", "n_px")
      .agg(count(lit(1)).as("n_bins_used"),
        max("cnt").as("max_bin"),
        sum("t").as("st"))
      .select(col("doc_id"), col("n_px"), col("n_bins_used"),
        round(log(col("n_px").cast("double")) -
          col("st").cast("double") / col("n_px"), 6).as("entropy"),
        round(col("max_bin").cast("double") / col("n_px"), 6)
          .as("max_bin_share"))
      .orderBy("doc_id")
  }

  /** One clip-level clipping/dynamics audit row. */
  final case class PcmClip(doc_id: Long, n_samples: Long, peak: Long,
                           n_clipped: Long, total_abs: Long)

  /** X232: PCM clipping / dynamics audit — the first QC gate an audio
    * ingest runs: per clip, the peak |sample|, the count of samples in
    * the clipping band (|s| ≥ `clipAt`, i.e. within 8 LSBs of the
    * synthetic ±2048 full scale), and the total absolute amplitude
    * (crest factor = peak·n/total_abs is derived relationally so the
    * only float is one final rounded division). A clip with a high
    * clipped fraction is distorted at the source and poisons
    * downstream feature extraction — this is the drop/keep signal.
    *
    * Same decode discipline as X156: the int16-LE byte payload is
    * actually encoded and re-parsed in `mapPartitions` (codecs are not
    * Catalyst expressions), every audit number is an integer off the
    * decoded samples, and the oracle recomputes them arithmetically —
    * a sign-extension or byte-order bug shifts peak/clip counts and
    * fails the hash gate.
    *
    * Scale shape: no-shuffle per-row decode, one derived projection —
    * the X156 shape with a clip-level (not frame-level) reduce done
    * inside the parser loop.
    */
  def pcmClipping(spark: SparkSession, dir: String,
                  clipAt: Int = 2040): Dataset[PcmClip] = {
    import spark.implicits._
    spreadForCodec(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { d =>
          val nFrames = (2 + java.lang.Math.floorMod(d, 4)).toInt
          val n = 160 * nFrames
          val bytes = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048).toInt
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          var peak = 0L
          var clipped = 0L
          var total = 0L
          i = 0
          while (i < n) {
            val v = (((bytes(2 * i + 1) & 0xff) << 8) |
              (bytes(2 * i) & 0xff)).toShort.toInt
            val a = java.lang.Math.abs(v).toLong
            if (a > peak) peak = a
            if (a >= clipAt) clipped += 1
            total += a
            i += 1
          }
          PcmClip(d, n.toLong, peak, clipped, total)
        }
      }
  }

  /** Oracle-checked query form of the clipping audit: integer audit
    * columns plus the derived clipped share and crest factor (the two
    * rounded divisions are the only floats).
    */
  def pcmClippingQuery(spark: SparkSession, dir: String): DataFrame =
    pcmClipping(spark, dir).toDF()
      .select(col("doc_id"), col("n_samples"), col("peak"),
        col("n_clipped"), col("total_abs"),
        round(col("n_clipped").cast("double") / col("n_samples"), 6)
          .as("clipped_share"),
        round(col("peak").cast("double") * col("n_samples") /
          col("total_abs"), 6).as("crest_factor"))
      .orderBy("doc_id")

  /** X172: energy-threshold voice-activity detection over the X156 PCM
    * frames — the canonical first stage of any speech pipeline (silence
    * trimming, segment extraction): a frame is VOICED when its energy
    * exceeds the clip's mean frame energy (the integer cross-product
    * `energy · n_frames > total_energy`, no division), and voiced runs
    * collapse to segments by the gaps-and-islands window. Every number
    * is an integer off the real byte-decoded frames, so the whole
    * decode→frame→threshold→segment chain sits under one hash gate.
    *
    * Scale shape: rides the X156 no-shuffle decode; adds one doc-keyed
    * aggregate (clip stats), one doc-keyed window chain (islands — the
    * X6 session shape, partitioned by doc, never global), and a
    * doc-keyed rollup. Per-doc frame counts are bounded (clip-length /
    * hop), so window state is O(frames-per-clip).
    */
  def pcmVad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = pcmFeatures(spark, dir).toDF()
    val clip = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), sum("energy").as("tot_energy"))
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val flagged = frames.join(clip, Seq("doc_id"))
      .withColumn("voiced",
        col("energy") * col("n_frames") > col("tot_energy"))
      .withColumn("seg_start",
        when(col("voiced") &&
          !coalesce(lag(col("voiced"), 1).over(w), lit(false)), 1L)
          .otherwise(0L))
      .withColumn("seg_id",
        when(col("voiced"), sum(col("seg_start")).over(w)))
    // every per-doc stat reads off the runs relation, so the flagged
    // frame relation is consumed exactly once
    val segs = flagged.filter(col("voiced"))
      .groupBy("doc_id", "seg_id").agg(count(lit(1)).as("run_len"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_segments"),
        sum("run_len").as("n_voiced"), max("run_len").as("max_run"))
    clip.join(segs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
      .orderBy("doc_id")
  }

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
        imageIoNoDiskCache()
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
    * by the pigeonhole split into `maxHam + 1` bit-slices: at most
    * `maxHam` bits differ, so at least one slice is IDENTICAL, and
    * candidates are the union of `maxHam + 1` EQUI-joins (one per
    * slice) — lossless for EVERY maxHam by construction (at the default
    * maxHam = 1 this degenerates to the classic two-32-bit-half split),
    * and never an all-pairs scan (the same banding argument as the
    * SimHash entry, at image-hash granularity). The oracle brute-forces
    * the quadratic form at gate scale, which is exactly the
    * losslessness proof.
    */
  def phashPairs(spark: SparkSession, dir: String,
                 maxHam: Int = 1): DataFrame = {
    require(maxHam >= 0 && maxHam < 64,
      s"maxHam must be in [0, 64) for 64-bit slicing, got $maxHam")
    val nSlices = maxHam + 1
    // r14 (guide §2.4): the hash relation is referenced 2·nSlices times
    // (both sides of every slice's equi-join) and Spark re-ran the full
    // encode→decode→hash codec pipeline for each reference; one eager
    // cut materializes the (doc_id, ahash) rows — 16 bytes/image —
    // once, so the codec runs exactly one pass per entry invocation.
    val hs = graft.Checkpoints.cut(pngAHashes(spark, dir).toDF())
    def slice(i: Int): DataFrame = {
      // slice i covers bits [i*64/n, (i+1)*64/n) — widths differ by at
      // most one bit when 64 % n != 0, which the pigeonhole never needs
      val loBit = i * 64 / nSlices
      val width = (i + 1) * 64 / nSlices - loBit
      val mask = if (width == 64) -1L else (1L << width) - 1L
      val sliced = hs.withColumn("k",
        expr(s"shiftrightunsigned(ahash, $loBit) & $mask"))
      sliced.select(col("doc_id").as("doc_a"), col("ahash").as("ha"),
          col("k"))
        .join(sliced.select(col("doc_id").as("doc_b"),
          col("ahash").as("hb"), col("k")), Seq("k"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
    }
    (0 until nSlices).map(slice).reduce(_.unionByName(_)).distinct()
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

  /** X189: 2:1 PCM downsampling (16 kHz → 8 kHz) through a halfband
    * FIR — the standard telephony-rate prep before a speech model or
    * VAD tier, and the DSP leg that proves the audio framework isn't
    * feature-extraction-shaped: y[j] = ⌊(x[2j−1] + 2·x[2j] +
    * x[2j+1]) / 4⌋ (the [1,2,1]/4 anti-aliasing kernel, left edge
    * sample-replicated), re-framed at 80 samples (the same 10 ms hop
    * at the new rate — frame count is PRESERVED, which the spec pins).
    *
    * Exactness: rides the X156 real byte decode, and every filter tap,
    * floor-division (spelled `(s + 8192) div 4 − 2048` so truncating
    * integer division IS floor on the shifted non-negative domain —
    * both engines agree without a float), energy and zero-crossing is
    * integer arithmetic: codec + filter + framing sit under one hash
    * gate where a tap-order, edge-clamp, or rounding-direction bug
    * shifts the numbers.
    *
    * Scale shape: identical to X156 — `mapPartitions` over the typed
    * payload Dataset, one filter kernel per partition, no shuffle, no
    * driver involvement; downsampling HALVES the bytes a downstream
    * stage shuffles, which is the whole point at 100 TB.
    */
  def pcmResample(spark: SparkSession, dir: String): Dataset[PcmFrame] = {
    import spark.implicits._
    spreadForCodec(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.flatMap { d =>
          val nFrames = (2 + java.lang.Math.floorMod(d, 4)).toInt
          val n = 160 * nFrames
          // X156's synth + int16 LE round-trip: the filter must consume
          // the PARSED bytes so byte-order bugs stay under this gate too
          val bytes = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048).toInt
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val dec = new Array[Int](n)
          i = 0
          while (i < n) {
            dec(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
            i += 1
          }
          // halfband decimation: y[j] over x[2j-1], x[2j], x[2j+1];
          // j=0 replicates the left edge; 2j+1 <= n-1 for every j < n/2
          val half = n / 2
          val y = new Array[Int](half)
          var j = 0
          while (j < half) {
            val xl = if (j == 0) dec(0) else dec(2 * j - 1)
            val sum3 = xl + 2 * dec(2 * j) + dec(2 * j + 1)
            y(j) = (sum3 + 8192) / 4 - 2048
            j += 1
          }
          (0 until nFrames).map { f =>
            var e = 0L
            var zc = 0L
            var k = 0
            while (k < 80) {
              val v = y(f * 80 + k)
              e += java.lang.Math.abs(v)
              if (k > 0 && v.toLong * y(f * 80 + k - 1) < 0) zc += 1
              k += 1
            }
            PcmFrame(d, f.toLong, 80L, e, zc)
          }
        }
      }
  }

  /** Oracle-checked query form of the resample leg. */
  def pcmResampleQuery(spark: SparkSession, dir: String): DataFrame =
    pcmResample(spark, dir).toDF().orderBy("doc_id", "frame_idx")

  /** Per-image channel statistics off a real decode. */
  final case class ChannelStats(doc_id: Long, n_px: Long, px_sum: Long,
                                px_sum_sq: Long, px_min: Long, px_max: Long)

  /** X190: per-image channel statistics — the normalization-constant
    * pass every vision pipeline runs before training (mean/std per
    * image feed the dataset-level running stats; min/max catch dead or
    * saturated frames): n, Σv, Σv², min, max walked off the REAL
    * `javax.imageio` PNG decode (X5's codec path), so a decoder, byte
    * order, or channel-extraction bug lands in these numbers and fails
    * the hash gate. Mean and the population std are derived OUTSIDE the
    * codec as one fixed expression each from the exact integer moments
    * (std spelled sqrt(n·Σv² − (Σv)²)/n — a single sqrt and division,
    * the X164 discipline).
    *
    * Scale shape: identical to the decode leg — `mapPartitions`, one
    * reader per partition, one row out per image, no shuffle; the
    * integer moments are exactly the mergeable partials a corpus-level
    * rollup would combine at 100 TB (sums add, min/max fold), so this
    * same relation is the map side of the global-normalization pass.
    */
  def channelStats(spark: SparkSession, dir: String): Dataset[ChannelStats] = {
    import spark.implicits._
    pngPayloads(spark, dir).mapPartitions { it =>
        imageIoNoDiskCache()
      it.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.content))
        var (s, s2) = (0L, 0L)
        var mn = 255L
        var mx = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = (img.getRGB(x, y) & 0xff).toLong
            s += v; s2 += v * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        ChannelStats(p.doc_id,
          img.getWidth.toLong * img.getHeight, s, s2, mn, mx)
      }
    }
  }

  /** Oracle-checked query form of [[channelStats]] with the derived
    * mean/std fixed expressions.
    */
  def channelStatsQuery(spark: SparkSession, dir: String): DataFrame =
    channelStats(spark, dir).toDF()
      .select(col("doc_id"), col("n_px"), col("px_sum"), col("px_sum_sq"),
        col("px_min"), col("px_max"),
        round(col("px_sum").cast("double") / col("n_px"), 6).as("px_mean"),
        round(sqrt((col("n_px") * col("px_sum_sq") -
          col("px_sum") * col("px_sum")).cast("double")) /
          col("n_px"), 6).as("px_std"))
      .orderBy("doc_id")

  /** X211: patch-grid tile statistics — the ViT-style patch
    * decomposition (mean per grid cell) every vision-transformer
    * ingest runs before embedding: the REAL decoded raster is cut into
    * a 4×4 tile grid (tile edges by integer `div` so ragged dimensions
    * distribute remainder pixels deterministically), and each tile
    * reports its exact pixel count/sum and floor-mean — per-tile
    * integers a downstream normalizer consumes, and 16× more location
    * sensitivity than X190's whole-image moments (a spatially-banded
    * corruption moves tile means while the global mean holds).
    *
    * Scale shape: same `mapPartitions` no-shuffle codec path as every
    * image leg; 16 rows out per image.
    */
  final case class TileStat(doc_id: Long, tile_x: Long, tile_y: Long,
                            n_px: Long, px_sum: Long, px_mean_floor: Long)

  def tileStats(spark: SparkSession, dir: String,
                grid: Int = 4): DataFrame = {
    import spark.implicits._
    pngPayloads(spark, dir).mapPartitions { it =>
        imageIoNoDiskCache()
      it.flatMap { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.content))
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = Array.ofDim[Long](grid, grid)
        val cnts = Array.ofDim[Long](grid, grid)
        var y = 0
        while (y < h) {
          val ty = y * grid / h
          var x = 0
          while (x < w) {
            val tx = x * grid / w
            sums(tx)(ty) += img.getRGB(x, y) & 0xff
            cnts(tx)(ty) += 1
            x += 1
          }
          y += 1
        }
        for (tx <- 0 until grid; ty <- 0 until grid)
          yield TileStat(p.doc_id, tx.toLong, ty.toLong,
            cnts(tx)(ty), sums(tx)(ty),
            if (cnts(tx)(ty) > 0) sums(tx)(ty) / cnts(tx)(ty) else 0L)
      }
    }.toDF().orderBy("doc_id", "tile_x", "tile_y")
  }

  /** X248: cross-image duplicate-tile detection — the watermark/logo/
    * template finder: every decoded image is cut into the X211 4×4
    * grid, each tile is fingerprinted by the md5 of its exact pixel
    * SEQUENCE (row-major "v,v,…" decimal serialization — a stated
    * canonical form, so equal fingerprints ⇔ equal rasters, no
    * perceptual slack), and fingerprints that recur across ≥ 2
    * DISTINCT images are reported with their spread. On real crawl
    * data this is how repeated watermarks / UI chrome / stock
    * boilerplate surface; on the test-card corpus the recurrences are
    * the arithmetically-predictable 31·Δd + 7·Δx + 13·Δy ≡ 0 (mod 256)
    * coincidences — which is what makes the whole codec→tile→hash→
    * group pipeline exactly oracle-able.
    *
    * Scale shape: the codec+hash stage is the standard no-shuffle
    * `mapPartitions` leg emitting 16 narrow rows per image; the only
    * exchange keys on the fingerprint (uniform by construction), and
    * the report is one map-combinable aggregate + a cardinality
    * filter. Identical to exact text dedup's shape (X1) with the
    * fingerprint computed from decoded pixels instead of raw bytes.
    */
  final case class TileSig(doc_id: Long, tile_x: Long, tile_y: Long,
                           n_px: Long, sig: String)

  def tileDups(spark: SparkSession, dir: String, grid: Int = 4): DataFrame = {
    import spark.implicits._
    val sigs = pngPayloads(spark, dir).mapPartitions { it =>
        imageIoNoDiskCache()
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.content))
        val (w, h) = (img.getWidth, img.getHeight)
        val bufs = Array.fill(grid, grid)(new StringBuilder)
        val cnts = Array.ofDim[Long](grid, grid)
        var y = 0
        while (y < h) {
          val ty = y * grid / h
          var x = 0
          while (x < w) {
            val tx = x * grid / w
            val sb = bufs(tx)(ty)
            if (sb.nonEmpty) sb.append(',')
            sb.append(img.getRGB(x, y) & 0xff)
            cnts(tx)(ty) += 1
            x += 1
          }
          y += 1
        }
        for (tx <- 0 until grid; ty <- 0 until grid) yield {
          md.reset()
          val hex = md.digest(bufs(tx)(ty).toString
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          TileSig(p.doc_id, tx.toLong, ty.toLong, cnts(tx)(ty), hex)
        }
      }
    }.toDF()
    sigs.groupBy("sig")
      .agg(max("n_px").as("n_px"), count(lit(1)).as("n_tiles"),
        countDistinct("doc_id").as("n_docs"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
      .filter(col("n_docs") >= 2)
      .orderBy("sig")
  }

  /** X255: global SSIM of the 2× block-mean downsample reconstruction —
    * the perceptual-quality audit a media pipeline runs on every
    * resize/transcode decision (Wang et al. 2004, the global single-
    * window form): x = the REAL decoded raster, y = its 2×2 floor-mean
    * downsample re-expanded nearest-neighbour, SSIM from the standard
    * constants C₁ = (0.01·255)², C₂ = (0.03·255)². All five moment sums
    * (Σx, Σy, Σx², Σy², Σxy) are EXACT int64 off the decode, emitted in
    * the output; SSIM itself is one fixed IEEE expression of them —
    * both facts are what make a perceptual score hash-oracle-able at
    * all. Flat images (zero variance) get SSIM's defined limit via the
    * same formula (C-terms dominate), no special case.
    *
    * Scale shape: the standard no-shuffle `mapPartitions` codec leg,
    * one narrow row out per image.
    */
  final case class SsimRow(doc_id: Long, n_px: Long, sum_x: Long,
                           sum_y: Long, sum_xx: Long, sum_yy: Long,
                           sum_xy: Long)

  def imageSsim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sums = pngPayloads(spark, dir).mapPartitions { it =>
        imageIoNoDiskCache()
      it.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.content))
        val (w, h) = (img.getWidth, img.getHeight)
        val px = Array.tabulate(w, h)((x, y) => img.getRGB(x, y) & 0xff)
        val wd = (w + 1) / 2
        val hd = (h + 1) / 2
        val down = Array.tabulate(wd, hd) { (bx, by) =>
          var s = 0L; var c = 0L
          var x = 2 * bx
          while (x < math.min(2 * bx + 2, w)) {
            var y = 2 * by
            while (y < math.min(2 * by + 2, h)) { s += px(x)(y); c += 1; y += 1 }
            x += 1
          }
          s / c
        }
        var (sx, sy, sxx, syy, sxy) = (0L, 0L, 0L, 0L, 0L)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) {
            val xv = px(x)(y).toLong
            val yv = down(x / 2)(y / 2)
            sx += xv; sy += yv; sxx += xv * xv; syy += yv * yv; sxy += xv * yv
            y += 1
          }
          x += 1
        }
        SsimRow(p.doc_id, w.toLong * h, sx, sy, sxx, syy, sxy)
      }
    }.toDF()
    sums
      .withColumn("mx", col("sum_x").cast("double") / col("n_px"))
      .withColumn("my", col("sum_y").cast("double") / col("n_px"))
      .select(col("doc_id"), col("n_px"), col("sum_x"), col("sum_y"),
        col("sum_xx"), col("sum_yy"), col("sum_xy"),
        round(
          ((lit(2.0) * col("mx") * col("my") + lit(6.5025)) *
            (lit(2.0) * (col("sum_xy").cast("double") / col("n_px") -
              col("mx") * col("my")) + lit(58.5225))) /
          ((col("mx") * col("mx") + col("my") * col("my") + lit(6.5025)) *
            ((col("sum_xx").cast("double") / col("n_px") -
              col("mx") * col("mx")) +
             (col("sum_yy").cast("double") / col("n_px") -
              col("my") * col("my")) + lit(58.5225))), 6).as("ssim"))
      .orderBy("doc_id")
  }

  /** X191: autocorrelation pitch tracking over the X156 PCM frames —
    * the classic time-domain F0 estimator (speech pipelines run it for
    * voicing/prosody features; 20–80 samples at 16 kHz spans 200–800
    * Hz): per frame, R(τ) = Σ x[i]·x[i+τ] over the in-frame overlap,
    * pitch lag = argmax R (ties to the SMALLER lag — the deterministic
    * tie rule that makes the argmax oracle-stateable). Every product
    * and sum is exact 64-bit integer arithmetic off the real byte
    * decode, so codec + framing + correlation + argmax sit under one
    * hash gate.
    *
    * Scale shape: rides the X156 no-shuffle decode — the τ-loop runs
    * inside `mapPartitions` per frame (bounded 61×160 multiplies), one
    * row out per frame; nothing leaves the partition. The relational
    * spelling (sample × lag-spine join) is the oracle's job, not the
    * engine's — a 61× row blow-up through a shuffle would be the wrong
    * plan when the kernel is partition-local.
    */
  def pcmPitch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = spreadForCodec(
        Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.flatMap { d =>
          val nFrames = (2 + java.lang.Math.floorMod(d, 4)).toInt
          val n = 160 * nFrames
          val bytes = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048).toInt
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val dec = new Array[Int](n)
          i = 0
          while (i < n) {
            dec(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
            i += 1
          }
          (0 until nFrames).map { f =>
            var bestLag = 0L
            var bestR = Long.MinValue
            var lag = 20
            while (lag <= 80) {
              var r = 0L
              var j = 0
              while (j < 160 - lag) {
                r += dec(f * 160 + j).toLong * dec(f * 160 + j + lag)
                j += 1
              }
              if (r > bestR) { bestR = r; bestLag = lag.toLong }
              lag += 1
            }
            (d, f.toLong, bestLag, bestR)
          }
        }
      }.toDF("doc_id", "frame_idx", "pitch_lag", "r_peak")
    rows.orderBy("doc_id", "frame_idx")
  }

  /** X274: spectral flux — the onset/novelty signal audio segmenters
    * threshold before cutting a long recording into training clips:
    * per 160-sample frame the SQUARED energy E_f = Σ s² (exact int64 —
    * 2048²·160 < 2³⁰), per clip the half-wave-rectified frame-to-frame
    * flux Σ_{f≥1} max(0, E_f − E_{f−1}), the rising-frame count, and
    * the peak frame energy. All integers off the real int16-LE byte
    * decode (encode → parse back, the X156 codec path), so the
    * relational twin recomputes every cell arithmetically and the hash
    * gate covers byte order, framing, and the rectifier.
    *
    * Scale shape: the X156 no-shuffle `mapPartitions` decode — one
    * parser per partition, one audit row per clip, one final sort; the
    * flux fold runs over a clip's own frames inside the row, never
    * across rows.
    */
  final case class FluxRow(doc_id: Long, n_frames: Long, total_flux: Long,
                           n_rises: Long, max_energy: Long)

  def spectralFlux(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = spreadForCodec(
        Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        imageIoNoDiskCache()
        it.map { d =>
          val nFrames = (2 + java.lang.Math.floorMod(d, 4)).toInt
          val n = 160 * nFrames
          val bytes = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048).toInt
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val dec = new Array[Int](n)
          i = 0
          while (i < n) {
            dec(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
            i += 1
          }
          var prevE = 0L
          var flux = 0L
          var rises = 0L
          var maxE = 0L
          var f = 0
          while (f < nFrames) {
            var e = 0L
            var j = 0
            while (j < 160) {
              val v = dec(f * 160 + j).toLong
              e += v * v
              j += 1
            }
            if (f > 0 && e > prevE) { flux += e - prevE; rises += 1 }
            if (e > maxE) maxE = e
            prevE = e
            f += 1
          }
          FluxRow(d, nFrames.toLong, flux, rises, maxE)
        }
      }
    rows.toDF().orderBy("doc_id")
  }

  /** X279: Sobel edge energy — the gradient-magnitude pass an image
    * curation pipeline runs to score sharpness / detect synthetic flat
    * regions: per decoded PNG, the 3×3 Sobel Gx/Gy over every interior
    * pixel, total energy Σ(Gx²+Gy²) and the count of strong-edge pixels
    * (energy > 20000 — above the test card's constant-ramp response of
    * 56²+104² = 13952, so only the mod-256 wrap seams register as
    * edges, which makes the count a real assertion on the decoded
    * raster, not a tautology). All exact int64 off the REAL `ImageIO`
    * decode; the twin recomputes the 8 neighbors from the stated pixel
    * formula arithmetically.
    *
    * Scale shape: the X111 no-shuffle codec pass — one decoder per
    * partition, one audit row per image, bounded w×h work per row.
    */
  final case class EdgeRow(doc_id: Long, width: Long, height: Long,
                           n_interior: Long, edge_energy: Long,
                           n_edge_px: Long)

  def edgeEnergy(spark: SparkSession, dir: String,
                 threshold: Long = 20000L): DataFrame = {
    import spark.implicits._
    val rows = pngPayloads(spark, dir).mapPartitions { it =>
        imageIoNoDiskCache()
      it.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.content))
        val w = img.getWidth
        val h = img.getHeight
        val px = Array.ofDim[Int](w, h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(x)(y) = img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        var energy = 0L
        var nEdge = 0L
        y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val gx = (px(x + 1)(y - 1) + 2 * px(x + 1)(y) + px(x + 1)(y + 1)) -
              (px(x - 1)(y - 1) + 2 * px(x - 1)(y) + px(x - 1)(y + 1))
            val gy = (px(x - 1)(y + 1) + 2 * px(x)(y + 1) + px(x + 1)(y + 1)) -
              (px(x - 1)(y - 1) + 2 * px(x)(y - 1) + px(x + 1)(y - 1))
            val e = gx.toLong * gx + gy.toLong * gy
            energy += e
            if (e > threshold) nEdge += 1
            x += 1
          }
          y += 1
        }
        EdgeRow(p.doc_id, w.toLong, h.toLong,
          (w - 2).toLong * (h - 2), energy, nEdge)
      }
    }
    rows.toDF().orderBy("doc_id")
  }
}
