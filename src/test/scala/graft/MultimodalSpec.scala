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

  test("real image decode: png/jpeg/bmp/gif round-trip through " +
    "javax.imageio with sniffed formats and exact dims") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (0L, "x" * 70, "en", "s0", 70L),   // png, 7x23
      (1L, "y" * 130, "en", "s1", 130L), // jpeg, 3x35
      (2L, "z" * 50, "en", "s2", 50L))   // bmp, 51x3
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val imgs = Multimodal.syntheticImages(docs)
    val out = Multimodal.decodeImages(imgs).collect().sortBy(_.media_id)
    assert(out.map(_.format).toSeq == Seq("png", "jpeg", "bmp"))
    assert(out.forall(_.ok))
    assert(out.map(d => (d.width, d.height)).toSeq ==
      Seq((7, 23), (3, 35), (51, 3)))
    assert(out.forall(_.channels == 3))
    // bytes are genuinely containerized: re-decode one with ImageIO
    val png = imgs.filter(col("media_id") === 0L)
      .select("bytes").head().getAs[Array[Byte]](0)
    assert(Multimodal.sniffFormat(png) == "png")
    // gif too (not in the oracle gate: palette quantization makes
    // channel count writer-dependent, but dims must survive)
    val gifImg = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gifImg, "gif", buf)
    val gif = Seq((9L, buf.toByteArray)).toDF("media_id", "bytes")
    val g = Multimodal.decodeImages(gif).head()
    assert(g.format == "gif" && g.ok && g.width == 5 && g.height == 4)
  }

  test("corrupt or unsupported bytes become ok=false rows, not task " +
    "failures") {
    val spark0 = spark
    import spark0.implicits._
    val junk = Seq(
      (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)), // truncated png
      (2L, "not an image at all".getBytes("UTF-8")),          // unknown
      (3L, null.asInstanceOf[Array[Byte]]))                   // null bytes
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeImages(junk).collect().sortBy(_.media_id)
    assert(out.forall(!_.ok))
    assert(out.map(_.format).toSeq == Seq("png", "unknown", "unknown"))
    assert(out.forall(d => d.width == 0 && d.channels == 0))
  }

  test("real audio decode: wav/aiff round-trip through " +
    "javax.sound.sampled with sniffed containers and exact metadata") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (0L, "x" * 7, "en", "s0", 7L),     // wave: rate 8000+3*4000, 2ch, 107f
      (1L, "y" * 504, "en", "s1", 504L), // aiff: rate 8000, 1ch, 104f
      (2L, "z" * 10, "en", "s2", 10L))   // wave: rate 16000, 1ch, 110f
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val clips = Multimodal.syntheticAudio(docs)
    val out = Multimodal.decodeAudio(clips).collect().sortBy(_.media_id)
    assert(out.map(_.format).toSeq == Seq("wave", "aiff", "wave"))
    assert(out.forall(_.ok))
    assert(out.map(_.sample_rate).toSeq == Seq(20000, 8000, 16000))
    assert(out.map(_.channels).toSeq == Seq(2, 1, 1))
    assert(out.map(_.frames).toSeq == Seq(107L, 104L, 110L))
    assert(out.map(_.duration_ms).toSeq == Seq(5L, 13L, 6L))
    // bytes are genuinely containerized: sniff one directly
    val wav = clips.filter(col("media_id") === 0L)
      .select("bytes").head().getAs[Array[Byte]](0)
    assert(Multimodal.sniffAudio(wav) == "wave")
  }

  test("corrupt audio bytes become ok=false rows, not task failures") {
    val spark0 = spark
    import spark0.implicits._
    val junk = Seq(
      (1L, ("RIFF" + "\u0001\u0002\u0003\u0004" + "WAVEgarbage").getBytes("US-ASCII")),
      (2L, "definitely not audio".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeAudio(junk).collect().sortBy(_.media_id)
    assert(out.forall(!_.ok))
    assert(out.map(_.format).toSeq == Seq("wave", "unknown", "unknown"))
    assert(out.forall(d => d.sample_rate == 0 && d.frames == 0L))
  }

  test("real video metadata decode: mp4 round-trip through the " +
    "ISO-BMFF parser with sniffed container and exact metadata") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      // even doc_id: v0 boxes, 1 track; odd: v1 boxes, 2 tracks
      (0L, "x" * 20, "en", "s0", 20L),   // ts 3000, 120ms, 36x36
      (1L, "y" * 703, "en", "s1", 703L), // ts 2000, 803ms, 719x719
      (2L, "z" * 901, "en", "s2", 901L)) // ts 2000, 101ms, 917x197
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val vids = Multimodal.syntheticVideos(docs)
    val out = Multimodal.decodeVideo(vids).collect().sortBy(_.media_id)
    assert(out.forall(_.ok))
    assert(out.forall(_.format == "mp4"))
    assert(out.map(_.duration_ms).toSeq == Seq(120L, 803L, 101L))
    assert(out.map(d => (d.width, d.height)).toSeq ==
      Seq((36, 36), (719, 719), (917, 197)))
    // the audio track (0x0) must not override the visual dims
    assert(out.map(_.n_tracks).toSeq == Seq(1, 2, 1))
    // bytes are genuinely containerized: sniff one directly
    val mp4 = vids.filter(col("media_id") === 0L)
      .select("bytes").head().getAs[Array[Byte]](0)
    assert(Multimodal.sniffVideo(mp4) == "mp4")
  }

  test("golden ISO-BMFF header hand-built per 14496-12 parses " +
    "correctly (keeps writer and parser independently honest)") {
    val spark0 = spark
    import spark0.implicits._
    // Build the file field-by-field from the published box layouts —
    // deliberately NOT via syntheticVideos' builder, so a shared
    // misreading of the spec cannot round-trip invisibly.
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 8 + 92)
    bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
    bb.putInt(8 + 108 + 8 + 92).put("moov".getBytes("US-ASCII"))
    // mvhd v0: 8 hdr + 4 ver/flags + 4+4 times + 4 timescale +
    // 4 duration + 4 rate + 2 vol + 10 rsvd + 36 matrix + 24 pre + 4 next
    bb.putInt(108).put("mvhd".getBytes("US-ASCII")).putInt(0)
      .putInt(0).putInt(0).putInt(1000).putInt(2500)
      .putInt(0x00010000).putShort(0x0100).put(new Array[Byte](10))
      .putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .put(new Array[Byte](24)).putInt(2)
    // trak > tkhd v0: 8 + 4 + 4+4 times + 4 id + 4 rsvd + 4 duration +
    // 8 rsvd + 2+2+2+2 + 36 matrix + 4 width(16.16) + 4 height(16.16)
    bb.putInt(8 + 92).put("trak".getBytes("US-ASCII"))
    bb.putInt(92).put("tkhd".getBytes("US-ASCII")).putInt(7)
      .putInt(0).putInt(0).putInt(1).putInt(0).putInt(2500)
      .put(new Array[Byte](8)).putShort(0).putShort(0).putShort(0).putShort(0)
      .putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(320 << 16).putInt(240 << 16)
    val golden = Seq((7L, bb.array())).toDF("media_id", "bytes")
    val d = Multimodal.decodeVideo(golden).head()
    assert(d.ok && d.format == "mp4")
    assert(d.duration_ms == 2500L) // 2500 ticks at timescale 1000
    assert(d.width == 320 && d.height == 240 && d.n_tracks == 1)
  }

  test("corrupt video bytes become ok=false rows, not task failures") {
    val spark0 = spark
    import spark0.implicits._
    val good = Multimodal.syntheticVideos(
      Seq((0L, "x" * 20, "en", "s0", 20L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("bytes").head().getAs[Array[Byte]](0)
    val junk = Seq(
      (1L, good.take(40)),                       // truncated mid-moov
      (2L, "definitely not a video".getBytes("UTF-8")), // unknown
      (3L, null.asInstanceOf[Array[Byte]]),      // null bytes
      (4L, good.take(16)))                       // ftyp only, no moov
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeVideo(junk).collect().sortBy(_.media_id)
    assert(out.forall(!_.ok))
    assert(out.map(_.format).toSeq == Seq("mp4", "unknown", "unknown", "mp4"))
    assert(out.forall(d => d.width == 0 && d.duration_ms == 0L))
  }

  test("ISO-BMFF parser survives fuzzed bytes: random corruption of " +
    "valid files yields ok=false or a parse, never a task failure") {
    val spark0 = spark
    import spark0.implicits._
    val good = Multimodal.syntheticVideos(
      Seq((0L, "x" * 200, "en", "s0", 200L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("bytes").head().getAs[Array[Byte]](0)
    val rnd = new scala.util.Random(42) // deterministic corpus
    val fuzzed = (1 to 200).map { i =>
      val b = good.clone()
      // flip 1-8 random bytes (sizes, types, payloads all get hit)
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      (i.toLong, b)
    } ++ (201 to 240).map { i => // random truncations
      (i.toLong, good.take(rnd.nextInt(good.length)))
    } ++ (241 to 260).map { i => // pure noise
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      (i.toLong, b)
    }
    val out = Multimodal.decodeVideo(fuzzed.toDF("media_id", "bytes"))
      .collect() // must not throw
    assert(out.length == 260)
    // corrupt rows degrade to ok=false; rows whose moov survived the
    // flips may still parse - both are acceptable, crashing is not
    assert(out.forall(d => d.ok || (d.width == 0 && d.duration_ms == 0L)))
  }

  test("real video FRAME decode: AVI MJPEG/DIB round-trip through " +
    "the RIFF walker and javax.imageio with exact frame counts/dims") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (0L, "x" * 21, "en", "s0", 21L),   // even id → MJPEG; 3 frames, 29x29
      (1L, "y" * 30, "en", "s1", 30L),   // odd id → DIB; 4 frames, 38x14
      (2L, "z" * 100, "en", "s2", 100L)) // MJPEG; 2 frames, 12x12
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val avis = Multimodal.syntheticAviVideos(docs)
    val out = Multimodal.decodeVideoFrames(avis).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(out.forall(_.ok))
    val byDoc = out.groupBy(_.media_id)
    assert(byDoc(0L).length == 3 && byDoc(1L).length == 4 &&
      byDoc(2L).length == 2)
    assert(byDoc(0L).forall(f => f.codec == "mjpeg" &&
      f.width == 29 && f.height == 29))
    assert(byDoc(1L).forall(f => f.codec == "dib" &&
      f.width == 38 && f.height == 14))
    assert(byDoc(2L).forall(f => f.codec == "mjpeg" &&
      f.width == 12 && f.height == 12))
    assert(byDoc.values.forall(fs =>
      fs.map(_.frame_idx).sorted.toSeq == (0L until fs.length).toSeq))
    // bytes are genuinely containerized RIFF/AVI
    val raw = avis.filter(col("media_id") === 1L)
      .select("bytes").head().getAs[Array[Byte]](0)
    assert(Multimodal.sniffAvi(raw))
  }

  test("DIB frames round-trip PIXEL-exact through the AVI container " +
    "(lossless path pins the decode to the generating pixel function)") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((5L, "w" * 17, "en", "s5", 17L)) // odd → DIB; 3 fr, 25x17
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.decodeVideoFrames(
      Multimodal.syntheticAviVideos(docs)).collect().sortBy(_.frame_idx)
    assert(out.length == 3 && out.forall(f => f.ok && f.codec == "dib"))
    out.foreach { f =>
      var expect = 0L
      (0 until f.height).foreach { y =>
        (0 until f.width).foreach { x =>
          expect += Multimodal.framePixel(5L, f.frame_idx, x, y) & 0xffffff
        }
      }
      assert(f.px_sum == expect,
        s"frame ${f.frame_idx} pixel sum drifted through the container")
    }
    // MJPEG frames are lossy: dims survive, pixels need not — assert
    // the decode reports a plausible nonzero sum without pinning it
    val mj = Multimodal.decodeVideoFrames(Multimodal.syntheticAviVideos(
      Seq((6L, "v" * 17, "en", "s6", 17L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")))
      .collect()
    assert(mj.forall(f => f.ok && f.codec == "mjpeg" && f.px_sum > 0L))
  }

  test("everyNth frame sampling skips the codec, keeps true indices") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "y" * 30, "en", "s1", 30L)) // 4 frames
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val avis = Multimodal.syntheticAviVideos(docs)
    val sampled = Multimodal.decodeVideoFrames(avis, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(sampled.forall(f => f.ok && f.width == 38 && f.height == 14))
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideoFrames(avis, everyNth = 0)
    }
  }

  test("golden RIFF/AVI file hand-built per the AVI RIFF reference " +
    "parses correctly (keeps writer and walker independently honest)") {
    val spark0 = spark
    import spark0.implicits._
    // one 2x2 24-bit DIB frame, built field-by-field — deliberately
    // NOT via syntheticAviVideos' builder. Pixel rows are bottom-up,
    // BGR, padded to 4-byte boundaries (2*3 = 6 → pad 2).
    val dib = java.nio.ByteBuffer.allocate(40 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    dib.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    // bottom row: (0,1)=rgb(1,2,3) (1,1)=rgb(4,5,6); top row:
    // (0,0)=rgb(7,8,9) (1,0)=rgb(10,11,12); DIB stores B,G,R
    dib.put(Array[Byte](3, 2, 1, 6, 5, 4, 0, 0))
    dib.put(Array[Byte](9, 8, 7, 12, 11, 10, 0, 0))
    val frame = dib.array()
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(cc.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("00db", frame))
    val avi = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ movi)
    val d = Multimodal.decodeVideoFrames(
      Seq((9L, avi)).toDF("media_id", "bytes")).collect()
    assert(d.length == 1)
    val f = d.head
    assert(f.ok && f.codec == "dib" && f.width == 2 && f.height == 2)
    val expect = Seq((7, 8, 9), (10, 11, 12), (1, 2, 3), (4, 5, 6))
      .map { case (r, g, b) => (r << 16 | g << 8 | b).toLong }.sum
    assert(f.px_sum == expect)
  }

  test("interleaved multi-stream AVI: per-stream frame counters keep " +
    "each stream's indices dense (00dc 01db 00dc ... never misindex)") {
    val spark0 = spark
    import spark0.implicits._
    def jpeg(px: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(3, 3,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 3).foreach(y => (0 until 3).foreach(x => img.setRGB(x, y, px)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", out)
      out.toByteArray
    }
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(cc.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    // two video streams interleaved: 00dc 01dc 00dc 01dc 00dc
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("00dc", jpeg(0x111111)) ++ chunk("01dc", jpeg(0x222222)) ++
      chunk("00dc", jpeg(0x333333)) ++ chunk("01dc", jpeg(0x444444)) ++
      chunk("00dc", jpeg(0x555555)))
    val avi = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ movi)
    val out = Multimodal.decodeVideoFrames(
      Seq((11L, avi)).toDF("media_id", "bytes")).collect()
    assert(out.forall(_.ok))
    assert(out.filter(_.stream == 0).map(_.frame_idx).sorted.toSeq ==
      Seq(0L, 1L, 2L))
    assert(out.filter(_.stream == 1).map(_.frame_idx).sorted.toSeq ==
      Seq(0L, 1L))
    // everyNth samples per stream, not across the interleave
    val sampled = Multimodal.decodeVideoFrames(
      Seq((11L, avi)).toDF("media_id", "bytes"), everyNth = 2).collect()
    assert(sampled.filter(_.stream == 0).map(_.frame_idx).sorted.toSeq ==
      Seq(0L, 2L))
    assert(sampled.filter(_.stream == 1).map(_.frame_idx).toSeq == Seq(0L))
  }

  test("frame decode runs unchanged on a stream: stateless " +
    "mapPartitions plumbing decodes AVI rows per micro-batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val avis = Multimodal.syntheticAviVideos(
      Seq((0L, "x" * 21, "en", "s0", 21L), (1L, "y" * 30, "en", "s1", 30L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect()
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.decodeVideoFrames(
        in.toDF().toDF("media_id", "bytes"))
      .writeStream.format("memory").queryName("avi_frames_stream")
      .outputMode("append").start()
    try {
      in.addData(avis.toIndexedSeq)
      q.processAllAvailable()
      val rows = spark0.table("avi_frames_stream").collect()
      assert(rows.length == 7) // 3 + 4 frames
      assert(rows.forall(_.getAs[Boolean]("ok")))
    } finally q.stop()
  }

  test("real animated-GIF frame decode: multi-frame round-trip " +
    "through the JDK's sequence writer and reader, deterministic sums") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (0L, "x" * 25, "en", "s0", 25L),  // 3 frames, 5x13
      (1L, "y" * 30, "en", "s1", 30L))  // 2 frames, 10x18
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val gifs = Multimodal.syntheticAnimatedGifs(docs)
    val out = Multimodal.decodeGifFrames(gifs).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(out.forall(f => f.ok && f.codec == "gif" && f.stream == 0))
    val byDoc = out.groupBy(_.media_id)
    assert(byDoc(0L).map(_.frame_idx).toSeq == Seq(0L, 1L, 2L))
    assert(byDoc(1L).map(_.frame_idx).toSeq == Seq(0L, 1L))
    assert(byDoc(0L).forall(f => f.width == 5 && f.height == 13))
    assert(byDoc(1L).forall(f => f.width == 10 && f.height == 18))
    // pixels quantize through the GIF palette, so sums aren't the raw
    // framePixel sums — but decode is deterministic: same bytes, same
    // sums on a second pass, and distinct frames carry distinct pixels
    val again = Multimodal.decodeGifFrames(gifs).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(out.map(_.px_sum).toSeq == again.map(_.px_sum).toSeq)
    assert(byDoc(0L).map(_.px_sum).distinct.length == 3)
    // everyNth skips the codec per stream
    val sampled = Multimodal.decodeGifFrames(gifs, everyNth = 2)
      .collect().filter(_.media_id == 0L).map(_.frame_idx).sorted.toSeq
    assert(sampled == Seq(0L, 2L))
    intercept[IllegalArgumentException] {
      Multimodal.decodeGifFrames(gifs, everyNth = 0)
    }
  }

  test("corrupt GIF bytes become ok=false rows, not task failures") {
    val spark0 = spark
    import spark0.implicits._
    val good = Multimodal.syntheticAnimatedGifs(
      Seq((0L, "x" * 25, "en", "s0", 25L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("bytes").head().getAs[Array[Byte]](0)
    val junk = Seq(
      (1L, good.take(20)),                  // truncated mid-header
      (2L, "GIF8 but not really".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, "png?".getBytes("UTF-8")))       // wrong magic entirely
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeGifFrames(junk).collect()
    // every row surfaces; nothing decodes ok (truncation may surface
    // as a container marker or zero frames followed by the marker)
    assert(out.forall(!_.ok))
    assert(out.map(_.media_id).distinct.length == 4)
  }

  test("corrupt AVI bytes become ok=false rows, not task failures") {
    val spark0 = spark
    import spark0.implicits._
    val good = Multimodal.syntheticAviVideos(
      Seq((0L, "x" * 20, "en", "s0", 20L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("bytes").head().getAs[Array[Byte]](0)
    val junk = Seq(
      (1L, good.take(40)),                        // truncated mid-hdrl
      (2L, "not remotely an avi".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, good.take(12)))                        // RIFF header only
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeVideoFrames(junk).collect()
      .sortBy(_.media_id)
    assert(out.forall(f => !f.ok && f.frame_idx == -1L))
  }

  test("RIFF walker survives fuzzed AVI bytes: corruption yields " +
    "ok=false rows or fewer frames, never a task failure or hang") {
    val spark0 = spark
    import spark0.implicits._
    val good = Multimodal.syntheticAviVideos(
      Seq((0L, "x" * 50, "en", "s0", 50L), (1L, "y" * 51, "en", "s1", 51L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("media_id", "bytes").as[(Long, Array[Byte])].collect()
    val rnd = new scala.util.Random(43) // deterministic corpus
    val fuzzed = (1 to 200).map { i =>
      val src = good(i % 2)._2
      val b = src.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      (i.toLong, b)
    } ++ (201 to 240).map { i =>
      (i.toLong, good(i % 2)._2.take(rnd.nextInt(good(i % 2)._2.length)))
    } ++ (241 to 260).map { i =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      (i.toLong, b)
    }
    val out = Multimodal.decodeVideoFrames(
      fuzzed.toDF("media_id", "bytes")).collect() // must not throw
    // every input row surfaces at least one output row (frames or a
    // container-level failure marker)
    assert(out.map(_.media_id).distinct.length == 260)
    assert(out.forall(f => f.ok || f.px_sum == 0L))
  }

  test("sampleFrames fans out video rows only") {
    val frames = Multimodal.sampleFrames(media(), 400)
    val got = frames.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // video doc (id=2) has duration 1000ms -> frames at 0,400,800
    assert(got == Seq((2L, 0L), (2L, 400L), (2L, 800L)))
  }

  test("decode runs unchanged on a stream: the mapPartitions plumbing " +
    "is stateless, so a media ingest stream decodes per micro-batch") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mp4 = Multimodal.syntheticVideos(
      Seq((5L, "x" * 20, "en", "s0", 20L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("bytes").head().getAs[Array[Byte]](0)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.decodeVideo(
        input.toDF().toDF("media_id", "bytes"))
      .writeStream.format("memory").queryName("stream_decode")
      .outputMode("append").start()
    try {
      input.addData((5L, mp4), (6L, "junk".getBytes("UTF-8")))
      q.processAllAvailable()
      val rows = spark.table("stream_decode")
        .select("media_id", "ok", "duration_ms").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      assert(rows(5L) == ((true, 120L)) && !rows(6L)._1)
    } finally q.stop()
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
