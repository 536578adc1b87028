package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingNearDup

/** Streaming MinHash-LSH near-dup detection: cross-batch pairing,
  * batch parity, horizon eviction, and bucket saturation
  * (the streaming rendition of the Caps drop-whole-buckets rule). */
class StreamingNearDupSpec extends SparkSpec {

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  private val a1 = "the quick brown fox jumps over the lazy dog every single day"
  private val a2 = "the quick brown fox jumps over the lazy dog every single night"
  private val other = "completely unrelated content about distributed stream processing engines"

  private def run(maxBucket: Int = 1000, threshold: Double = 0.5)(
      feed: (MemoryStream[(Long, String, java.sql.Timestamp)],
             org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[(Long, Long, Double)] = {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val name = s"neardup_${System.nanoTime()}"
    val q = StreamingNearDup(input.toDF().toDF("doc_id", "text", "arrived"),
        "arrived", horizonSeconds = 10L, threshold = threshold,
        maxBucket = maxBucket)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      feed(input, q)
      spark.table(name)
        .select("doc_a", "doc_b", "est_jaccard").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("near-dups pair across micro-batches; unrelated docs don't") {
    val got = run() { (in, q) =>
      in.addData((1L, a1, t(100)), (3L, other, t(100)))
      q.processAllAvailable()
      in.addData((2L, a2, t(105))) // arrives a batch later: state pairing
      q.processAllAvailable()
    }
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(got.head._3 >= 0.5)
  }

  test("emitted pairs match the batch minhashPairs on the same corpus") {
    val spark0 = spark
    import spark0.implicits._
    val corpus = Seq((1L, a1), (2L, a2), (3L, other))
    val batch = graft.pipeline.Dedup.minhashPairs(
        corpus.toDF("doc_id", "text"), maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    val streamed = run() { (in, q) =>
      corpus.zipWithIndex.foreach { case ((id, text), i) =>
        in.addData((id, text, t(100 + i)))
        q.processAllAvailable()
      }
    }
    assert(streamed == batch)
  }

  test("members older than the horizon are evicted: a late near-dup " +
    "does not pair") {
    val got = run() { (in, q) =>
      in.addData((1L, a1, t(100)))
      q.processAllAvailable()
      // push the watermark far past 1's horizon with unrelated traffic
      in.addData((3L, other, t(200)))
      q.processAllAvailable()
      in.addData((2L, a2, t(195))) // within watermark, but 1 is evicted
      q.processAllAvailable()
    }
    assert(got.isEmpty)
  }

  test("an over-full bucket saturates: whole-bucket drop, no pair flood " +
    "(streaming Caps semantics)") {
    val got = run(maxBucket = 2) { (in, q) =>
      (1 to 5).foreach { i =>
        in.addData((i.toLong, a1, t(100 + i)))
        q.processAllAvailable()
      }
    }
    // only the pre-saturation pair (1,2) survives; docs 3-5 hit the
    // saturated bucket and emit nothing
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
  }

  test("randomized parity: for any corpus and batch split inside the " +
    "horizon, streamed pairs equal batch minhashPairs") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7) // deterministic
    val vocab = Vector("alpha", "beta", "gamma", "delta", "omega",
      "stream", "spark", "dedup", "window", "state")
    (1 to 3).foreach { trial =>
      // clustered corpus: a few base texts, each with light mutations
      val bases = Vector.fill(3)(
        Vector.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val corpus = (1 to 8).map { id =>
        val b = bases(rnd.nextInt(bases.size)).split(" ").toVector
        val mutated = if (rnd.nextBoolean()) b
          else b.updated(rnd.nextInt(b.size), vocab(rnd.nextInt(vocab.size)))
        (id.toLong, mutated.mkString(" "))
      }
      val batch = graft.pipeline.Dedup.minhashPairs(
          corpus.toDF("doc_id", "text"), maxBucket = Int.MaxValue)
        .select("doc_a", "doc_b", "est_jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
      val streamed = run() { (in, q) =>
        // random batch split; event times all inside one horizon
        var rest = corpus.zipWithIndex
          .map { case ((id, tx), i) => (id, tx, t(100 + i)) }
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(rest.size)
          in.addData(rest.take(n))
          q.processAllAvailable()
          rest = rest.drop(n)
        }
      }
      assert(streamed == batch, s"trial $trial")
    }
  }

  test("bucket state survives a kill-and-restart on RocksDB: a near-dup " +
    "arriving after recovery pairs with a pre-restart member") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    NearDupChaosProbe.reset()
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ckpt = java.nio.file.Files.createTempDirectory("neardup_ckpt").toString
    def start() = StreamingNearDup(
        input.toDF().toDF("doc_id", "text", "arrived"), "arrived",
        horizonSeconds = 10L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(NearDupChaosProbe.probe _)
      .queryName("neardup_chaos").start()
    try {
      var q = start()
      input.addData((1L, a1, t(100)))
      q.processAllAvailable()
      q.stop() // kill between the member arriving and its near-dup
      q = start()
      try {
        input.addData((2L, a2, t(105)))
        q.processAllAvailable()
        // a reset bucket would have no member for doc 2 to pair with
        assert(NearDupChaosProbe.pairs.contains((1L, 2L)))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("a saturated bucket is forgiven after a quiet horizon") {
    val got = run(maxBucket = 2) { (in, q) =>
      (1 to 3).foreach { i => // 3rd member saturates the bucket
        in.addData((i.toLong, a1, t(100 + i)))
        q.processAllAvailable()
      }
      // unrelated traffic pushes the watermark a full horizon past the
      // saturation, firing the forgiveness timer
      in.addData((9L, other, t(300)))
      q.processAllAvailable()
      in.addData((10L, a1, t(301)), (11L, a1, t(302)))
      q.processAllAvailable()
    }
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (10L, 11L)))
  }
}

/** Restart-test probe: batches append under a batchId guard so a
  * replayed batch after recovery (foreachBatch is at-least-once) never
  * double-counts. */
object NearDupChaosProbe {
  private val buf = scala.collection.mutable.LinkedHashSet[(Long, Long)]()
  private var last = -1L
  def reset(): Unit = synchronized { buf.clear(); last = -1L }
  def probe(batch: org.apache.spark.sql.Dataset[graft.streaming.NearDupPair],
      id: Long): Unit = {
    val rows = batch.collect().map(p => (p.doc_a, p.doc_b))
    synchronized { if (id > last) { buf ++= rows; last = id } }
  }
  def pairs: Set[(Long, Long)] = synchronized(buf.toSet)
}
