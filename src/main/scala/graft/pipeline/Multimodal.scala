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
  * headers via `javax.sound.sampled` (also JDK-shipped). VIDEO
  * container metadata decode is REAL as well: [[decodeVideo]] walks
  * ISO-BMFF (MP4) boxes by hand, and VIDEO FRAME decode is REAL for
  * intra-frame codecs: [[decodeVideoFrames]] walks RIFF/AVI `movi`
  * chunks and decodes MJPEG / raw-DIB frames through `javax.imageio`.
  * Only inter-frame codecs (H.264 etc.) remain stubbed
  * ([[decodeStub]] derives a deterministic fake feature vector from
  * the bytes; no such codec library ships with the JDK or this
  * container). Everything around the codecs — schema, batch
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

  /** STUB decode for INTER-FRAME video codecs (image / audio /
    * video-container metadata / AVI intra-frame decode are real — see
    * [[decodeImages]] / [[decodeAudio]] / [[decodeVideo]] /
    * [[decodeVideoFrames]]; no H.264-class codec ships with the JDK or
    * this container): a real implementation hands `bytes` to a codec; this
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
    * failures. Video container metadata and intra-frame decode are
    * real too ([[decodeVideo]] / [[decodeVideoFrames]]); only
    * inter-frame video codecs stay stubbed ([[decodeStub]]). */
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

  case class DecodedVideo(media_id: Long, format: String, width: Int,
      height: Int, duration_ms: Long, n_tracks: Int, n_bytes: Long,
      ok: Boolean)

  /** Sniff the video container from magic bytes (same never-trust-
    * metadata rule as [[sniffFormat]]): ISO-BMFF files open with a
    * size-prefixed `ftyp` box (ISO/IEC 14496-12 §4.3). */
  private[graft] def sniffVideo(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 12) "unknown"
    else if (new String(bytes, 4, 4, "US-ASCII") == "ftyp") "mp4"
    else "unknown"

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** One parsed ISO-BMFF box: (type, payload start, payload end). */
  private def walkBoxes(b: Array[Byte], lo: Int, hi: Int)
      : Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
    private var pos = lo
    def hasNext: Boolean = pos + 8 <= hi
    def next(): (String, Int, Int) = {
      val size0 = be32(b, pos)
      val tpe = new String(b, pos + 4, 4, "US-ASCII")
      // size==1 → 64-bit largesize follows the type; size==0 → to EOF
      val (start, size) =
        if (size0 == 1 && pos + 16 <= hi) (pos + 16, be64(b, pos + 8))
        else if (size0 == 0) (pos + 8, (hi - pos).toLong)
        else (pos + 8, size0)
      val end = pos + size
      if (size < 8 || end > hi || end <= pos)
        throw new IllegalArgumentException(s"bad box $tpe size=$size")
      pos = end.toInt
      (tpe, start, end.toInt)
    }
  }

  private def findBox(b: Array[Byte], lo: Int, hi: Int, tpe: String)
      : Option[(Int, Int)] =
    walkBoxes(b, lo, hi).collectFirst { case (`tpe`, s, e) => (s, e) }

  /** REAL video metadata decode: a hand-rolled ISO-BMFF (MP4) box
    * parser — no video library ships with the JDK or this container,
    * but the *container* format (ISO/IEC 14496-12) is plain
    * length-prefixed boxes, so movie metadata needs no codec. Walks
    * `moov`/`mvhd` for timescale+duration (v0 and v1 box layouts, and
    * 64-bit largesize headers) and each `trak`/`tkhd` for the 16.16
    * fixed-point visual dimensions, taking the max across tracks
    * (audio tracks carry 0×0). Header-only: cost is O(moov) per row
    * regardless of mdat size. Corrupt bytes → `ok = false` rows, never
    * task failures. Frame decode is real too for intra-frame codecs
    * ([[decodeVideoFrames]], RIFF/AVI MJPEG + DIB); only inter-frame
    * codecs remain stubbed ([[decodeStub]]) — those genuinely need a
    * codec library. */
  def decodeVideo(media: DataFrame): Dataset[DecodedVideo] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          val fmt = sniffVideo(bytes)
          if (fmt == "unknown") DecodedVideo(id, fmt, 0, 0, 0L, 0, n, ok = false)
          else try {
            val (ms, me) = findBox(bytes, 0, bytes.length, "moov")
              .getOrElse(throw new IllegalArgumentException("no moov"))
            val (hs, _) = findBox(bytes, ms, me, "mvhd")
              .getOrElse(throw new IllegalArgumentException("no mvhd"))
            val mv = bytes(hs) & 0xff // version; then 3 flag bytes
            // v0: creation(4) modification(4) timescale(4) duration(4)
            // v1: creation(8) modification(8) timescale(4) duration(8)
            val timescale =
              if (mv == 1) be32(bytes, hs + 4 + 16) else be32(bytes, hs + 4 + 8)
            val duration =
              if (mv == 1) be64(bytes, hs + 4 + 20) else be32(bytes, hs + 4 + 12)
            var w = 0L; var h = 0L; var tracks = 0
            walkBoxes(bytes, ms, me).foreach {
              case ("trak", ts, te) =>
                tracks += 1
                findBox(bytes, ts, te, "tkhd").foreach { case (ks, _) =>
                  val tv = bytes(ks) & 0xff
                  // after version+flags: v0 creation(4) mod(4) id(4)
                  // rsvd(4) duration(4); v1 widens the three times to 8.
                  // Then rsvd(8) layer(2) altgrp(2) vol(2) rsvd(2)
                  // matrix(36), width(4, 16.16), height(4, 16.16).
                  val dims = ks + 4 + (if (tv == 1) 32 else 20) + 52
                  w = math.max(w, be32(bytes, dims) >> 16)
                  h = math.max(h, be32(bytes, dims + 4) >> 16)
                }
              case _ => ()
            }
            DecodedVideo(id, fmt, w.toInt, h.toInt,
              if (timescale > 0) duration * 1000L / timescale else 0L,
              tracks, n, ok = true)
          } catch { case scala.util.control.NonFatal(_) =>
            DecodedVideo(id, fmt, 0, 0, 0L, 0, n, ok = false)
          }
        }
      }
  }

  /** ISO-BMFF box builder for [[syntheticVideos]]: size-prefixed
    * type + concatenated payload. */
  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + payload.map(_.length).sum)
    buf.putInt(buf.capacity).put(tpe.getBytes("US-ASCII"))
    payload.foreach(buf.put)
    buf.array()
  }

  private def fullBoxHeader(version: Int, flags: Int = 0): Array[Byte] =
    Array[Byte]((version & 0xff).toByte, 0, 0, (flags & 0xff).toByte)

  private val unityMatrix: Array[Byte] = {
    val m = java.nio.ByteBuffer.allocate(36)
    m.putInt(0x00010000).putInt(0).putInt(0)
    m.putInt(0).putInt(0x00010000).putInt(0)
    m.putInt(0).putInt(0).putInt(0x40000000)
    m.array()
  }

  /** Deterministic video relation derived from the `documents` table
    * (the driver ships no binary media): each doc becomes a REAL
    * minimal MP4 — `ftyp` + `moov`(`mvhd` + one or two `trak`/`tkhd`)
    * — with timescale/duration/dims derived from doc columns, so the
    * DuckDB oracle predicts [[decodeVideo]]'s output straight from the
    * doc columns and the gate proves the metadata came through actual
    * ISO-BMFF bytes. Odd doc_ids write v1 (64-bit-time) mvhd/tkhd
    * layouts so both parser paths stay exercised; a golden hand-hexed
    * header in MultimodalSpec keeps writer and parser honest about the
    * spec independently of each other. */
  def syntheticVideos(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        // timescale multiplies the target ms so duration ticks stay
        // integral: duration_ms round-trips exactly
        (lit(1000) * (lit(1) + pmod(col("n_chars"), lit(3)))).cast("int")
          .as("timescale"),
        (pmod(col("n_chars"), lit(900)) + 100).cast("long").as("dur_ms"),
        (pmod(col("n_chars"), lit(1280)) + 16).cast("int").as("w"),
        (pmod(col("n_chars"), lit(720)) + 16).cast("int").as("h"),
        (lit(1) + pmod(col("doc_id"), lit(2))).cast("int").as("n_tracks"),
        pmod(col("doc_id"), lit(2)).cast("int").as("ver"))
      .as[(Long, Int, Long, Int, Int, Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, timescale, durMs, w, h, nTracks, ver) =>
          val ticks = durMs * timescale / 1000L
          def times(n: Int) = // creation + modification, v-sized
            new Array[Byte](if (ver == 1) 8 * n else 4 * n)
          def u(v: Long, wide: Boolean): Array[Byte] =
            if (wide) java.nio.ByteBuffer.allocate(8).putLong(v).array()
            else java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
          val i32 = (v: Int) =>
            java.nio.ByteBuffer.allocate(4).putInt(v).array()
          val i16 = (v: Int) => Array[Byte]((v >> 8).toByte, v.toByte)
          val mvhd = box("mvhd", fullBoxHeader(ver), times(2),
            i32(timescale), u(ticks, ver == 1),
            i32(0x00010000), i16(0x0100), new Array[Byte](10),
            unityMatrix, new Array[Byte](24), i32(nTracks + 1))
          def tkhd(trackId: Int, tw: Int, th: Int, vol: Int) =
            // flags 7 = track_enabled | track_in_movie | track_in_preview
            box("tkhd", fullBoxHeader(ver, 7), times(2), i32(trackId),
              new Array[Byte](4), u(ticks, ver == 1),
              new Array[Byte](8), i16(0), i16(0), i16(vol), i16(0),
              unityMatrix, i32(tw << 16), i32(th << 16))
          val traks = (1 to nTracks).map { t =>
            if (t == 1) box("trak", tkhd(1, w, h, 0))      // visual
            else box("trak", tkhd(t, 0, 0, 0x0100))        // audio: 0×0
          }
          val moov = box("moov", (mvhd +: traks): _*)
          val ftyp = box("ftyp", "isom".getBytes("US-ASCII"),
            i32(512), "isommp42".getBytes("US-ASCII"))
          (id, "video/mp4", ftyp ++ moov)
        }
      }
      .toDF("media_id", "mime", "bytes")
  }

  // ---------------------------------------------------------------------
  // REAL video FRAME decode: RIFF/AVI containers with MJPEG or DIB frames
  // ---------------------------------------------------------------------

  /** `stream` is the AVI stream number the frame chunk belongs to
    * (`##dc`/`##db` → ##) with its own frame counter — interleaved
    * multi-stream files index correctly per stream. `px_sum` =
    * Σ (rgb & 0xffffff) over decoded pixels: lossless (DIB) frames
    * reproduce it exactly from [[framePixel]], which the parity spec
    * asserts; JPEG frames carry whatever the lossy codec returns
    * (oracle queries simply don't project it). */
  case class DecodedFrame(media_id: Long, stream: Int, frame_idx: Long,
      codec: String, width: Int, height: Int, px_sum: Long, ok: Boolean)

  /** Sniff the AVI container from magic bytes (never trust `mime`):
    * RIFF files open `"RIFF" size4 formType`; AVI's form type is
    * `"AVI "` (msdn AVI RIFF File Reference). */
  private[graft] def sniffAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI "

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** RIFF chunk walk: fourcc + LE32 size + payload, padded to even
    * offsets (the WORD-alignment rule that trips naive parsers on
    * odd-sized JPEG frames). Yields (fourcc, payload start, payload
    * end); malformed sizes terminate the walk by throwing — callers
    * convert to `ok = false` rows. */
  private def leChunks(b: Array[Byte], lo: Int, hi: Int)
      : Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
    private var pos = lo
    def hasNext: Boolean = pos + 8 <= hi
    def next(): (String, Int, Int) = {
      val tpe = new String(b, pos, 4, "US-ASCII")
      val size = le32(b, pos + 4)
      val start = pos + 8
      val end = start + size
      if (size < 0 || end > hi)
        throw new IllegalArgumentException(s"bad RIFF chunk $tpe size=$size")
      pos = (end + (size & 1)).toInt // odd sizes carry a pad byte
      (tpe, start, end.toInt)
    }
  }

  /** First LIST chunk of the given list type within [lo, hi). */
  private def findList(b: Array[Byte], lo: Int, hi: Int, listType: String)
      : Option[(Int, Int)] =
    leChunks(b, lo, hi).collectFirst {
      case ("LIST", s, e)
          if e - s >= 4 && new String(b, s, 4, "US-ASCII") == listType =>
        (s + 4, e)
    }

  /** REAL video frame decode — the codec gap is closed for intra-frame
    * codecs: a hand-rolled RIFF/AVI chunk walker finds the `movi` LIST
    * and decodes every video frame chunk for real, with zero added
    * dependencies. `00dc` frames sniffing as JPEG (MJPEG — each frame
    * is a standalone JPEG) go through the same `javax.imageio` readers
    * as [[decodeImages]]; `00db` frames are uncompressed DIBs
    * (BITMAPINFOHEADER + pixels), turned into in-memory BMPs by
    * prepending the 14-byte BITMAPFILEHEADER and read the same way.
    * Only inter-frame codecs (H.264 etc.) still need a library that
    * does not ship with the JDK. Codec is reported from the actual
    * frame bytes (magic sniff / chunk id), never from container
    * metadata. Corrupt containers yield a single `frame_idx = -1,
    * ok = false` row; a corrupt individual frame yields its own
    * `ok = false` row without killing the rest of the file — at
    * 100 TB one truncated frame must cost one row, not a task.
    *
    * `everyNth` is the decode-cost throttle for scale: the chunk walk
    * is O(frame count) pointer arithmetic, but the JPEG/DIB decode is
    * the real CPU spend, so sampling every Nth frame (the common
    * training-data pattern) skips the expensive step entirely for the
    * frames between — same plan shape, 1/N the codec work. */
  def decodeVideoFrames(media: DataFrame, everyNth: Int = 1)
      : Dataset[DecodedFrame] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          if (!sniffAvi(bytes))
            Seq(DecodedFrame(id, -1, -1L, "unknown", 0, 0, 0L, ok = false))
          else try {
            val (ms, me) = findList(bytes, 12, bytes.length, "movi")
              .getOrElse(throw new IllegalArgumentException("no movi"))
            // per-stream frame counters: interleaved multi-stream files
            // ("00dc 01dc 00dc ...") index correctly within each stream
            val counters = scala.collection.mutable.Map.empty[Int, Long]
            def streamNo(tpe: String): Int = {
              val d0 = tpe.charAt(0); val d1 = tpe.charAt(1)
              if (d0.isDigit && d1.isDigit) (d0 - '0') * 10 + (d1 - '0')
              else -1
            }
            leChunks(bytes, ms, me).collect {
              case (tpe, s, e)
                  if (tpe.endsWith("dc") || tpe.endsWith("db")) &&
                    streamNo(tpe) >= 0 =>
                val sn = streamNo(tpe)
                val idx = counters.getOrElse(sn, -1L) + 1
                counters(sn) = idx
                if (idx % everyNth == 0L)
                  Some(decodeFrameChunk(id, sn, idx, bytes, s, e))
                else None
            }.flatten.toVector
          } catch { case scala.util.control.NonFatal(_) =>
            Seq(DecodedFrame(id, -1, -1L, "avi", 0, 0, 0L, ok = false))
          }
        }
      }
  }

  /** Decode one movi frame chunk: JPEG magic → MJPEG via imageio; a
    * leading LE32 == biSize 40 → raw DIB wrapped as BMP. */
  private def decodeFrameChunk(id: Long, sn: Int, idx: Long, b: Array[Byte],
      s: Int, e: Int): DecodedFrame = {
    val n = e - s
    val isJpeg = n >= 3 && (b(s) & 0xff) == 0xff && (b(s + 1) & 0xff) == 0xd8
    val isDib = !isJpeg && n >= 40 && le32(b, s) == 40L
    val codec = if (isJpeg) "mjpeg" else if (isDib) "dib" else "unknown"
    val img =
      if (codec == "unknown") null
      else try {
        val in =
          if (isJpeg) new java.io.ByteArrayInputStream(b, s, n)
          else {
            // BITMAPFILEHEADER: "BM" + file size + 2×0 + pixel offset
            // (14 + header + palette; palette only at ≤ 8 bpp)
            val bitCount = (le32(b, s + 14) & 0xffff).toInt
            val clrUsed = le32(b, s + 32).toInt
            val palette =
              if (bitCount <= 8)
                (if (clrUsed > 0) clrUsed else 1 << bitCount) * 4
              else clrUsed * 4
            val head = java.nio.ByteBuffer.allocate(14)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            head.put('B'.toByte).put('M'.toByte).putInt(14 + n)
              .putInt(0).putInt(14 + 40 + palette)
            val bmp = new Array[Byte](14 + n)
            System.arraycopy(head.array(), 0, bmp, 0, 14)
            System.arraycopy(b, s, bmp, 14, n)
            new java.io.ByteArrayInputStream(bmp)
          }
        javax.imageio.ImageIO.read(in)
      } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) DecodedFrame(id, sn, idx, codec, 0, 0, 0L, ok = false)
    else {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          sum += (img.getRGB(x, y) & 0xffffff); x += 1
        }
        y += 1
      }
      DecodedFrame(id, sn, idx, codec, img.getWidth, img.getHeight, sum,
        ok = true)
    }
  }

  /** REAL animated-GIF frame decode: the JDK's GIF reader is fully
    * multi-frame (`getNumImages(true)` + `read(i)`), so animated GIFs
    * — the other moving-image container a stock JRE can decode end to
    * end — need no AVI wrapper. Emits one [[DecodedFrame]] per frame
    * (stream 0; GIF has a single image stream), with the same
    * `everyNth` codec throttle and corrupt-bytes contract as
    * [[decodeVideoFrames]]. Frames whose own decode fails yield their
    * `ok = false` row; a container-level failure yields the single
    * `frame_idx = -1` marker row. */
  def decodeGifFrames(media: DataFrame, everyNth: Int = 1)
      : Dataset[DecodedFrame] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          if (bytes == null || sniffFormat(bytes) != "gif")
            Seq(DecodedFrame(id, -1, -1L, "unknown", 0, 0, 0L, ok = false))
          else {
            val reader = javax.imageio.ImageIO
              .getImageReadersByFormatName("gif").next()
            try {
              reader.setInput(new javax.imageio.stream
                .MemoryCacheImageInputStream(
                  new java.io.ByteArrayInputStream(bytes)))
              val n = reader.getNumImages(true)
              // a "GIF" with zero decodable frames must surface, not
              // vanish — no silent drops at 100 TB
              if (n <= 0)
                throw new IllegalArgumentException("no frames")
              (0 until n).collect {
                case i if i % everyNth == 0 =>
                  try {
                    val img = reader.read(i)
                    var sum = 0L
                    var y = 0
                    while (y < img.getHeight) {
                      var x = 0
                      while (x < img.getWidth) {
                        sum += (img.getRGB(x, y) & 0xffffff); x += 1
                      }
                      y += 1
                    }
                    DecodedFrame(id, 0, i.toLong, "gif", img.getWidth,
                      img.getHeight, sum, ok = true)
                  } catch { case scala.util.control.NonFatal(_) =>
                    DecodedFrame(id, 0, i.toLong, "gif", 0, 0, 0L,
                      ok = false)
                  }
              }
            } catch { case scala.util.control.NonFatal(_) =>
              Seq(DecodedFrame(id, -1, -1L, "gif", 0, 0, 0L, ok = false))
            } finally reader.dispose()
          }
        }
      }
  }

  /** Deterministic animated-GIF relation derived from the `documents`
    * table: each doc becomes a REAL multi-frame GIF written with the
    * JDK's own sequence writer (`prepareWriteSequence` /
    * `writeToSequence`), frame count and dims from doc columns, so the
    * DuckDB oracle predicts [[decodeGifFrames]]' output straight from
    * the doc columns. Pixels quantize through the GIF palette (the
    * format is indexed-color), so the gate pins count/dims/ok; pixel
    * determinism is spec-pinned as same-bytes → same-sums. */
  def syntheticAnimatedGifs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        (pmod(col("n_chars"), lit(3)) + 2).cast("int").as("n_frames"),
        (pmod(col("n_chars"), lit(24)) + 4).cast("int").as("w"),
        (pmod(col("n_chars"), lit(16)) + 4).cast("int").as("h"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, nFrames, w, h) =>
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          val out = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream
            .MemoryCacheImageOutputStream(out)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            (0 until nFrames).foreach { f =>
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  img.setRGB(x, y, framePixel(id, f, x, y)); x += 1
                }
                y += 1
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
            }
            writer.endWriteSequence()
            ios.flush()
          } finally { writer.dispose(); ios.close() }
          (id, "image/gif", out.toByteArray)
        }
      }
      .toDF("media_id", "mime", "bytes")
  }

  private def leChunkBytes(fourcc: String, payload: Array[Byte]*)
      : Array[Byte] = {
    val size = payload.map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(8 + size + (size & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(fourcc.getBytes("US-ASCII")).putInt(size)
    payload.foreach(buf.put)
    buf.array() // odd payloads leave one zeroed pad byte
  }

  private def leListBytes(listType: String, sub: Array[Byte]*): Array[Byte] =
    leChunkBytes("LIST", listType.getBytes("US-ASCII") +: sub: _*)

  /** Deterministic frame pixel function shared by the writer and the
    * parity spec: DIB frames survive the container losslessly, so the
    * spec re-derives exact pixels from (id, frame, x, y). */
  private[graft] def framePixel(id: Long, frame: Long, x: Int, y: Int): Int =
    ((id * 2654435761L + frame * 97L + x * 31L + y) & 0xffffff).toInt

  /** Deterministic AVI relation derived from the `documents` table:
    * each doc becomes a REAL RIFF/AVI file — spec-layout `hdrl`
    * (`avih` + `strl`/`strh`/`strf`) then a `movi` LIST whose frame
    * chunks are actual JPEGs (`00dc`, even doc_ids) or raw DIBs
    * (`00db`, odd doc_ids — written by the JDK's own BMP writer with
    * the file header stripped), frame count and dims derived from doc
    * columns. The DuckDB oracle predicts [[decodeVideoFrames]]' output
    * straight from the doc columns, so the gate proves every frame
    * came back out of real container bytes through a real image
    * decoder. JPEG frame sizes vary per frame, so odd-sized chunks
    * exercise the RIFF pad rule continuously. */
  def syntheticAviVideos(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        (pmod(col("n_chars"), lit(4)) + 2).cast("int").as("n_frames"),
        (pmod(col("n_chars"), lit(32)) + 8).cast("int").as("w"),
        (pmod(col("n_chars"), lit(24)) + 8).cast("int").as("h"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, nFrames, w, h) =>
          val mjpeg = id % 2 == 0
          val frames = (0 until nFrames).map { f =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y, framePixel(id, f, x, y)); x += 1
              }
              y += 1
            }
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, if (mjpeg) "jpeg" else "bmp", out)
            val enc = out.toByteArray
            if (mjpeg) leChunkBytes("00dc", enc)
            else leChunkBytes("00db", enc.drop(14)) // BMP minus file header
          }
          val le32b = (v: Int) => java.nio.ByteBuffer.allocate(4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
          val le16b = (v: Int) => Array[Byte](v.toByte, (v >> 8).toByte)
          // avih: 56 bytes (AVIMAINHEADER minus fcc/size)
          val avih = leChunkBytes("avih", le32b(40000), le32b(0), le32b(0),
            le32b(0), le32b(nFrames), le32b(0), le32b(1), le32b(0),
            le32b(w), le32b(h), new Array[Byte](16))
          // strh: AVISTREAMHEADER for the single video stream
          val strh = leChunkBytes("strh",
            "vids".getBytes("US-ASCII"),
            (if (mjpeg) "MJPG" else "DIB ").getBytes("US-ASCII"),
            le32b(0), le16b(0), le16b(0), le32b(0), le32b(1), le32b(25),
            le32b(0), le32b(nFrames), le32b(0), le32b(-1), le32b(0),
            le16b(0), le16b(0), le16b(w), le16b(h))
          // strf: BITMAPINFOHEADER; biCompression = 'MJPG' fourcc or 0
          val strf = leChunkBytes("strf", le32b(40), le32b(w), le32b(h),
            le16b(1), le16b(24),
            if (mjpeg) "MJPG".getBytes("US-ASCII") else le32b(0),
            le32b(w * h * 3), le32b(0), le32b(0), le32b(0), le32b(0))
          val hdrl = leListBytes("hdrl", avih, leListBytes("strl", strh, strf))
          val movi = leListBytes("movi", frames: _*)
          val riff = leChunkBytes("RIFF",
            "AVI ".getBytes("US-ASCII"), hdrl, movi)
          (id, "video/x-msvideo", riff)
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
