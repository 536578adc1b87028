package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** One LSH bucket's member in streaming state: (doc, signature,
  * event-time ms). */
case class BucketMember(doc_id: Long, sig: Seq[Long], tMs: Long)

/** An emitted near-dup candidate pair. `time` is the arriving doc's
  * event time so downstream event-time operators (cross-band pair
  * dedup, windowed aggregation) can watermark on it. The same pair may
  * surface from several colliding bands with the identical
  * `est_jaccard` — band is carried so callers can either
  * `dropDuplicatesWithinWatermark(doc_a, doc_b)` or keep the
  * per-band evidence. */
case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double,
    band: Int, bucket: String, time: java.sql.Timestamp)

private[streaming] case class BandedDoc(band: Int, bucket: String,
    doc_id: Long, sig: Seq[Long], time: java.sql.Timestamp)

/** Streaming MinHash-LSH near-duplicate detection — the incremental
  * form of [[graft.pipeline.Dedup.minhashPairs]] for a continuously
  * ingested corpus (complementing `Dedup.streamingExact`, which only
  * catches byte-identical docs). Keyed by (band, bucket): each arriving
  * doc is compared against the bucket's LIVE members only (signature
  * agreement = the batch path's est_jaccard), then joins the state.
  *
  * Scale posture mirrors the batch family:
  *  - state per key is bounded twice over: members older than
  *    `horizon` behind the watermark are evicted (event-time bound,
  *    same contract as streamingExact), and a bucket that exceeds
  *    `maxBucket` live members SATURATES — state clears, nothing more
  *    is emitted for that key until the bucket has been quiet for a
  *    full horizon (the streaming rendition of [[graft.pipeline.Caps]]'
  *    drop-whole-buckets rule: a boilerplate bucket must not cost
  *    O(bucket²) pair emissions, and a *partial* bucket would
  *    silently under-report, so the whole bucket goes).
  *  - comparisons are within-bucket only — never an all-pairs scan.
  *
  * Timers: one live timer per key at (newest member + horizon); on
  * expiry every member is eviction-due (watermark ≥ newest + horizon),
  * so the key's state clears entirely — a quiet bucket costs nothing
  * forever after. */
class NearDupProcessor(horizonMs: Long, maxBucket: Int)
    extends StatefulProcessor[(Int, String), BandedDoc, NearDupPair]
    with ArmedTimer[(Int, String), BandedDoc, NearDupPair] {

  @transient private var members: ListState[BucketMember] = _
  @transient private var saturatedAt: ValueState[Long] = _
  @transient private var _armed: ValueState[Long] = _
  override protected def armed: ValueState[Long] = _armed

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    members = getHandle.getListState[BucketMember]("members",
      Encoders.product[BucketMember], TTLConfig.NONE)
    saturatedAt = getHandle.getValueState[Long]("saturatedAt",
      Encoders.scalaLong, TTLConfig.NONE)
    _armed = getHandle.getValueState[Long]("armed",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
    if (a.isEmpty) 0.0
    else a.iterator.zip(b.iterator).count { case (x, y) => x == y }
      .toDouble / a.size

  override def handleInputRows(key: (Int, String),
      rows: Iterator[BandedDoc], timerValues: TimerValues)
      : Iterator[NearDupPair] = {
    val wm = timerValues.getCurrentWatermarkInMs()
    val out = Seq.newBuilder[NearDupPair]
    for (d <- rows.toSeq.sortBy(_.time.getTime)) {
      val t = d.time.getTime
      if (saturatedAt.exists()) {
        // saturated bucket: swallow, and extend the quiet-period clock
        saturatedAt.update(math.max(saturatedAt.get(), t))
        rearm(math.max(t + horizonMs + 1, wm + 1))
      } else {
        // evict members the watermark has aged out of the horizon
        val all = members.get().toSeq
        val live = all.filter(m => m.tMs + horizonMs >= wm)
        if (live.size >= maxBucket) {
          // over-full: drop the WHOLE bucket (partial pairing would
          // silently under-report; mirrors Caps.cap's semantics)
          members.clear()
          saturatedAt.update(t)
          rearm(math.max(t + horizonMs + 1, wm + 1))
        } else {
          for (m <- live if m.doc_id != d.doc_id)
            out += NearDupPair(math.min(m.doc_id, d.doc_id),
              math.max(m.doc_id, d.doc_id), estJaccard(m.sig, d.sig),
              key._1, key._2, d.time)
          if (live.size != all.size) {
            members.clear()
            live.foreach(members.appendValue)
          }
          members.appendValue(BucketMember(d.doc_id, d.sig, t))
          rearm(math.max(math.max(t, live.map(_.tMs).maxOption
            .getOrElse(0L)) + horizonMs + 1, wm + 1))
        }
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: (Int, String),
      timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[NearDupPair] = {
    val wm = timerValues.getCurrentWatermarkInMs()
    if (saturatedAt.exists()) {
      if (saturatedAt.get() + horizonMs < wm) { // quiet: forgive
        saturatedAt.clear(); armed.clear()
      } else armed.clear()
    } else {
      val live = members.get().toSeq.filter(m => m.tMs + horizonMs >= wm)
      members.clear()
      if (live.isEmpty) armed.clear()
      else {
        live.foreach(members.appendValue)
        armed.clear()
        rearm(live.map(_.tMs).max + horizonMs + 1)
      }
    }
    Iterator.empty
  }
}

object StreamingNearDup {

  /** Wire a doc stream (doc_id, text, `eventTimeCol` timestamp) through
    * signature → banding → the per-bucket processor. The signature and
    * band/bucket derivation reuse the BATCH kernels and expressions
    * ([[graft.pipeline.MinhashSigExpr]]/[[graft.pipeline.ShinglesExpr]]
    * and `Dedup.lshBands`' banding SQL), so a pair this stream emits is
    * exactly a pair the batch `minhashPairs` would find on the same
    * horizon's corpus (PipelineSpec pins the parity). `threshold`
    * filters on signature agreement like the batch path. */
  def apply(docs: DataFrame, eventTimeCol: String,
      horizonSeconds: Long = 3600L, k: Int = 16, bands: Int = 4,
      w: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = graft.pipeline.Caps.DefaultMaxBucket)
      : Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    require(bands >= 1 && k % bands == 0, "bands must divide k")
    val r = k / bands
    val sig = ColumnBridge.column(graft.pipeline.MinhashSigExpr(
      ColumnBridge.expression(ColumnBridge.column(
        graft.pipeline.ShinglesExpr(
          ColumnBridge.expression(col("text")), w))), k))
    val sigd = docs.withWatermark(eventTimeCol, s"$horizonSeconds seconds")
      .select(col("doc_id"), sig.as("sig"), col(eventTimeCol).as("time"))
      .select(col("doc_id"), col("sig"), col("time"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> named_struct('band', b, 'bucket', " +
          s"md5(concat_ws(',', transform(slice(sig, b*$r+1, $r), " +
          "x -> cast(x as string))))))")).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("doc_id"), col("sig"), col("time"))
      .as[BandedDoc]
    sigd.groupByKey(b => (b.band, b.bucket))
      .transformWithState(new NearDupProcessor(horizonSeconds * 1000L,
        maxBucket), TimeMode.EventTime(), OutputMode.Append())
      .filter(_.est_jaccard >= threshold)
  }
}
