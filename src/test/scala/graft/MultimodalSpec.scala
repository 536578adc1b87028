package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal
import graft.sources.{LineProtocols, Sources}

/** Multimodal plumbing + source assembly tests: the decode stub's
  * iterator contract, frame-sampling fan-out, size-tier partitioning,
  * and default-time decoding. */
class MultimodalSpec extends SparkSpec {

  private def media() = {
    val spark0 = spark
    import spark0.implicits._
    Multimodal.deriveMedia(Seq(
      (0L, "a b c", "en", "s0", 5L),
      (1L, "hello world this is audio", "en", "s1", 25L),
      (2L, "v" * 100, "en", "s2", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("deriveMedia assigns modalities and metadata deterministically") {
    val rows = media().orderBy("media_id").collect()
    assert(rows.map(_.getAs[String]("modality")).toSeq ==
      Seq("image", "audio", "video"))
    assert(rows(2).getAs[Long]("duration_ms") == 1000L)
  }

  test("decode stub: deterministic checksum/feature via mapPartitions") {
    val spark0 = spark
    import spark0.implicits._
    val fs = Multimodal.decodeStub(media(), 4).collect().sortBy(_.media_id)
    assert(fs.length == 3)
    assert(fs(0).n_bytes == 5) // "a b c"
    // positional byte checksum of "a b c": deterministic and reproducible
    val expect = "a b c".getBytes("UTF-8").zipWithIndex
      .map { case (b, i) => (b & 0xff).toLong * (i + 1) }.sum
    assert(fs(0).checksum == expect)
    assert(fs(0).feature.length == 4)
  }

  test("sampleFrames fans out video rows only") {
    val frames = Multimodal.sampleFrames(media(), 400)
    val got = frames.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // video doc (id=2) has duration 1000ms -> frames at 0,400,800
    assert(got == Seq((2L, 0L), (2L, 400L), (2L, 800L)))
  }

  test("repartitionBySize spreads tiers across partitions") {
    val df = media()
    val parts = Multimodal.repartitionBySize(df, 2)
    assert(parts.rdd.getNumPartitions == 2)
    assert(parts.count() == 3)
    assert(parts.columns.toSeq == df.columns.toSeq) // helper column dropped
  }

  test("default-time decode assigns now only when time is null (common.clj:86-89)") {
    val df = events(E(id = 1, time = 100L), E(id = 2, time = null))
    val out = df.withColumn("time_s", Sources.defaultTimeS(col("time_s")))
    val ts = out.orderBy("event_id").collect().map(_.getAs[Long]("time_s"))
    assert(ts(0) == 100L)
    assert(ts(1) > 1700000000L) // now
  }

  test("graphite decoder composes with a streaming source") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = LineProtocols.decodeGraphite(input.toDF().withColumnRenamed("value", "line"))
      .writeStream.format("memory").queryName("glines").outputMode("append").start()
    try {
      input.addData("api.lat;dc=west 9.5 1706000000", "bad line with extra fields 1 2 3")
      q.processAllAvailable()
      val rows = spark.table("glines").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("service") == "api.lat")
      assert(rows.head.getAs[Map[String, String]]("attributes") == Map("dc" -> "west"))
    } finally q.stop()
  }
}
