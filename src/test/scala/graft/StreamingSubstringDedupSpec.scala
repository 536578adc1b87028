package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.StreamingSubstringDedup

/** Streaming exact substring dedup — the fifth member of the streaming
  * dedup family: batch parity against `Dedup.substringDedup`, cross-
  * batch canonical state, horizon forgetting, and RocksDB restart
  * recovery. */
class StreamingSubstringDedupSpec extends SparkSpec {

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  private val span = "one two three four five six seven eight"
  private val d1 = s"intro words here $span tail a"
  private val d2 = s"different opening text $span other ending b"
  private val other = "no duplicated content in this document at all"

  private def run(horizonSeconds: Long = 1000L)(
      feed: (MemoryStream[(Long, String, java.sql.Timestamp)],
             org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Map[Long, (Long, Long, String)] = {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val name = s"substr_stream_${System.nanoTime()}"
    val q = StreamingSubstringDedup(
        input.toDF().toDF("doc_id", "text", "arrived"), "arrived",
        minLen = 8, horizonSeconds = horizonSeconds)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      feed(input, q)
      // close every window: a far-future doc pushes the watermark past
      // the horizon boundaries
      input.addData((999999L, "closer", t(10_000_000L)))
      q.processAllAvailable()
      spark.table(name)
        .filter(col("doc_id") =!= 999999L)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def batch(corpus: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    val spark0 = spark
    import spark0.implicits._
    graft.pipeline.Dedup.substringDedup(corpus.toDF("doc_id", "text"), 8)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
  }

  test("one trigger matches the batch operator exactly (canonical = " +
    "min (doc, pos) within a trigger)") {
    val corpus = Seq((1L, d1), (2L, d2), (3L, other))
    val got = run() { (in, q) =>
      in.addData(corpus.map { case (id, tx) => (id, tx, t(100)) }: _*)
      q.processAllAvailable()
    }
    assert(got == batch(corpus))
    assert(got(2L)._3 == "different opening text other ending b")
  }

  test("cross-batch dedup: a span seen in an earlier trigger strips " +
    "later copies; the earlier doc keeps its text") {
    val got = run() { (in, q) =>
      in.addData((1L, d1, t(100)))
      q.processAllAvailable()
      in.addData((2L, d2, t(150)))
      q.processAllAvailable()
      in.addData((3L, other, t(200)))
      q.processAllAvailable()
    }
    assert(got(1L)._2 == 0L) // canonical: nothing removed
    assert(got(2L) == ((14L, 8L, "different opening text other ending b")))
    assert(got(3L)._2 == 0L)
  }

  test("a quiet horizon forgets the canonical: the same span after the " +
    "horizon is a fresh canonical and keeps its text") {
    val got = run(horizonSeconds = 10L) { (in, q) =>
      in.addData((1L, d1, t(100)))
      q.processAllAvailable()
      // 3's arrival moves the watermark far past 1's horizon, firing
      // the gram timers
      in.addData((3L, other, t(500)))
      q.processAllAvailable()
      in.addData((2L, d2, t(510)))
      q.processAllAvailable()
    }
    assert(got(2L)._2 == 0L, s"span should be a fresh canonical: $got")
  }

  test("canonical state survives a kill-and-restart on RocksDB") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ckpt = java.nio.file.Files.createTempDirectory("substr_ckpt").toString
    SubstrChaosProbe.reset()
    def start() = StreamingSubstringDedup(
        input.toDF().toDF("doc_id", "text", "arrived"), "arrived",
        minLen = 8, horizonSeconds = 1000L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(SubstrChaosProbe.probe _)
      .queryName("substr_chaos").start()
    try {
      var q = start()
      input.addData((1L, d1, t(100)))
      q.processAllAvailable()
      q.stop() // kill mid-stream; canonical grams live only in RocksDB
      q = start()
      input.addData((2L, d2, t(150)))
      q.processAllAvailable()
      input.addData((999999L, "closer", t(10_000_000L)))
      q.processAllAvailable()
      val got = SubstrChaosProbe.rows.filter(_._1 == 2L)
      assert(got == Seq((2L, 8L, "different opening text other ending b")),
        s"post-restart dedup lost state: $got")
      q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}

object SubstrChaosProbe {
  private val buf =
    scala.collection.mutable.LinkedHashSet[(Long, Long, String)]()
  def reset(): Unit = synchronized { buf.clear() }
  def probe(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
    val rows = batch.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    synchronized { buf ++= rows; () }
  }
  def rows: Seq[(Long, Long, String)] = synchronized(buf.toSeq)
}
