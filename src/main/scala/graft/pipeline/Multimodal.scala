package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns plus typed metadata, with decode / feature-extract /
  * frame-sample as partition-local transforms.
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives a deterministic fake feature
  * vector from the bytes. Everything around the stub — schema, batch
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

  /** STUB decode: a real implementation hands `bytes` to a codec; this
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
