package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingCrossCorpus

/** Stateless stream-static cross-corpus near-dup filtering: arriving
  * docs flagged against a fixed reference corpus, batch parity, and
  * restart-freedom (no state store involved). */
class StreamingCrossCorpusSpec extends SparkSpec {

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  private val refA = "the quick brown fox jumps over the lazy dog every single day"
  private val refB = "a completely separate reference document about stream engines"
  private val newNearA = "the quick brown fox jumps over the lazy dog every single night"
  private val novel = "entirely fresh incoming content sharing no shingles with anything"

  private def refDf = {
    val spark0 = spark
    import spark0.implicits._
    Seq((10L, refA), (11L, refB)).toDF("doc_id", "text")
  }

  private def run(threshold: Double = 0.3)(
      feed: (MemoryStream[(Long, String, java.sql.Timestamp)],
             org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[(Long, Long, Double)] = {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val name = s"crosscorpus_${System.nanoTime()}"
    val q = StreamingCrossCorpus.matches(
        input.toDF().toDF("doc_id", "text", "arrived"),
        StreamingCrossCorpus.referenceBanded(refDf),
        "arrived", threshold = threshold)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      feed(input, q)
      spark.table(name)
        .select("new_id", "ref_id", "est_jaccard").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
    } finally { q.stop() }
  }

  test("arriving near-copy of a reference doc is flagged; novel " +
    "content passes silently") {
    val got = run() { (in, q) =>
      in.addData((20L, newNearA, t(100)), (21L, novel, t(100)))
      q.processAllAvailable()
      in.addData((22L, novel, t(105))) // later batch, still silent
      q.processAllAvailable()
    }
    assert(got.map(p => (p._1, p._2)) == Seq((20L, 10L)))
    assert(got.head._3 >= 0.3)
  }

  test("streamed matches == batch crossCorpusNearDups on the same data") {
    val spark0 = spark
    import spark0.implicits._
    val incoming = Seq((20L, newNearA), (21L, novel), (22L, refB))
    val batch = graft.pipeline.Dedup.crossCorpusNearDups(
        incoming.toDF("doc_id", "text"), refDf, threshold = 0.3)
      .select("new_id", "ref_id", "est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    val streamed = run() { (in, q) =>
      incoming.zipWithIndex.foreach { case ((id, text), i) =>
        in.addData((id, text, t(100 + i)))
        q.processAllAvailable()
      }
    }
    assert(streamed == batch && batch.nonEmpty)
  }
}
