package graft

import graft.operators.{Temporal, Windows}
import graft.pipeline.{Curation, Dedup}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew / hot-key stress evidence for the dedup/LSH/curation chain —
  * the 100 TB story rests on hot-bucket caps, map-side partial
  * aggregation, and the segmentDedup groupBy-not-window choice; this
  * suite feeds each of them pathological data and asserts the guard
  * actually engages (row counts) and the hot key actually spreads
  * across tasks (task metrics), not just that the design intends it.
  *
  * The reference's analog of per-key hot state is `by`'s substreams
  * (streams.clj:1556-1612) — one atom per key value, which a hot key
  * serializes exactly the way a window over a hot hash would here. */
class SkewSpec extends SparkSpec {

  /** 50%-boilerplate corpus: every even doc is the SAME text — the
    * one-dominant-segment / one-dominant-bucket shape that line dedup
    * and LSH caps exist for. */
  private val boiler = "common header line repeated across half of " +
    "the corpus with exactly twenty five words of boilerplate filler " +
    "so it spans multiple ten word segments"

  private def skewedCorpus(n: Int): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    (0 until n).map { i =>
      val text = if (i % 2 == 0) boiler
      else s"unique document $i with its own words " +
        (1 to 12).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  /** Run `body` with a task-metrics listener attached; returns the
    * body's result and the max shuffle-read record count any single
    * task saw — the "did the hot key land in one task" probe. */
  private def maxTaskShuffleRead[T](body: => T): (T, Long) = {
    val max = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) max.getAndAccumulate(
          m.shuffleReadMetrics.recordsRead, math.max(_, _))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val res = body
      // the listener bus is async: poll until the max stabilizes
      var last = -1L
      var spins = 0
      while (max.get() != last && spins < 40) {
        last = max.get(); Thread.sleep(50); spins += 1
      }
      (res, max.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Run `body` with AQE coalescing off and `n` shuffle partitions —
    * at test scale AQE folds every tiny shuffle into one task, which
    * would hide exactly the concentration this suite measures. */
  private def withFixedShuffle[T](n: Int)(body: => T): T = {
    val conf = spark.conf
    val oldP = conf.get("spark.sql.shuffle.partitions")
    val oldA = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.shuffle.partitions", n.toString)
    conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      conf.set("spark.sql.shuffle.partitions", oldP)
      conf.set("spark.sql.adaptive.enabled", oldA)
    }
  }

  test("LSH hot-bucket cap engages: boilerplate buckets are dropped, not joined") {
    val docs = skewedCorpus(240).cache()
    try {
      // uncapped: the 120 identical docs collide in every band —
      // quadratic candidates (120*119/2 = 7140 pairs from boilerplate)
      val uncapped = Dedup.lshCandidates(docs, 16, 4, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(uncapped.count { case (a, b) => a % 2 == 0 && b % 2 == 0 } >= 7140)
      // capped at 64: every boilerplate bucket has 120 > 64 members and
      // is dropped whole; unique docs (distinct signatures) survive
      val capped = Dedup.lshCandidates(docs, 16, 4, 3, maxBucket = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped.subsetOf(uncapped))
      assert(!capped.exists { case (a, b) => a % 2 == 0 && b % 2 == 0 },
        s"boilerplate pairs survived the cap: ${capped.take(5)}")
      // and the cap is a bucket-size rule, not a blanket filter: the
      // candidate count collapses from quadratic to (near) zero
      assert(capped.size < uncapped.size / 10,
        s"cap barely engaged: ${capped.size} vs ${uncapped.size}")
    } finally docs.unpersist()
  }

  test("segmentDedup: the hot segment is first-wins-deduped correctly under 50% heat") {
    val n = 1000
    val out = Curation.segmentDedup(skewedCorpus(n), 10)
      .select("doc_id", "n_kept", "n_segments").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0 is the global first owner of every boilerplate segment
    assert(out(0L)._1 == out(0L)._2)
    // every other boilerplate doc keeps zero segments
    (2 until n by 2).foreach(i => assert(out(i.toLong)._1 == 0L,
      s"doc $i kept ${out(i.toLong)._1} boilerplate segments"))
    // unique docs keep everything
    (1 until n by 2).foreach(i => assert(out(i.toLong)._1 == out(i.toLong)._2))
  }

  test("segmentDedup: hot segment spreads across tasks (map-side combine), " +
    "while the window form concentrates it in one") {
    withFixedShuffle(16) {
      val n = 1000 // 500 copies of each boilerplate segment
      val docs = skewedCorpus(n)
      val (_, goodMax) = maxTaskShuffleRead {
        Curation.segmentDedup(docs, 10).agg(sum("n_kept")).collect()
      }
      // the anti-pattern segmentDedup deliberately avoids: first-wins
      // via a window over seg_hash — every copy of a hot segment hashes
      // to ONE task, and AQE cannot split window partitions
      val segs = docs
        .withColumn("words", split(col("text"), " "))
        .withColumn("segs", expr(
          "transform(sequence(0, cast(ceil(size(words) / 10.0) as int) - 1)," +
            " i -> array_join(slice(words, i * 10 + 1, 10), ' '))"))
        .select(col("doc_id"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
        .withColumn("seg_hash", md5(col("seg")))
      val (_, badMax) = maxTaskShuffleRead {
        segs.withColumn("first_at", min(struct(col("doc_id"), col("seg_idx")))
            .over(Window.partitionBy("seg_hash")))
          .filter(col("first_at.doc_id") === col("doc_id"))
          .agg(count(lit(1))).collect()
      }
      val hotCopies = n / 2 // one boilerplate segment's occurrence count
      assert(badMax >= hotCopies,
        s"calibration: window form should funnel ≥$hotCopies hot rows " +
          s"into one task, saw $badMax")
      assert(goodMax < hotCopies / 2,
        s"segmentDedup concentrated $goodMax records in one task " +
          s"(hot segment has $hotCopies copies) — partial agg regressed")
    }
  }

  test("sourceCap: a 90%-dominant source is cut to the cap, deterministically") {
    val spark0 = spark
    import spark0.implicits._
    val docs = (0 until 5000).map { i =>
      (i.toLong, if (i % 10 == 0) s"rare${i % 100}" else "hotsource")
    }.toDF("doc_id", "source")
    val capped = Curation.sourceCap(docs, 100)
    val bySource = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("hotsource") == 100L)
    assert(bySource.values.forall(_ <= 100L))
    // deterministic: the kept hot docs are the 100 lowest doc_ids
    val keptHot = capped.filter(col("source") === "hotsource")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val expect = (0 until 5000).filter(_ % 10 != 0).take(100).map(_.toLong)
    assert(keptHot == expect)
  }

  test("saltedSumCount: one 80%-hot key aggregates exactly like plain groupBy") {
    val hot = (1 to 8000).map(i =>
      E(id = i, service = "hot", metric = (i % 97).toDouble / 7.0, time = i))
    val cold = (8001 to 10000).map(i =>
      E(id = i, service = s"svc${i % 50}", metric = i.toDouble / 3.0, time = i))
    val df = events(hot ++ cold: _*)
    val salted = Windows.saltedSumCount(df, Seq("service"), "metric")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = df.groupBy("service")
      .agg(sum(col("metric").cast("decimal(18,6)")).cast("double"),
        count(col("metric")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == plain) // decimal partials: exactly equal, not ≈
  }

  test("the DEFAULT maxBucket engages on a >1000-member hot bucket " +
    "and the drop is observed, not silent") {
    import scala.jdk.CollectionConverters._
    val spark0 = spark
    import spark0.implicits._
    // 1100 identical docs (one bucket per band, each over the default
    // cap of 1000 — the boilerplate corpus a 100 TB user hits first)
    // plus 15 genuine near-dup pairs that must survive the cap: the
    // realistic mixed shape, and non-degenerate on purpose — a query
    // whose ENTIRE result collapses to empty can have its observation
    // node pruned by AQE's empty-relation propagation (see Caps.cap).
    val docs = ((0 until 1100).map(i => (i.toLong, boiler)) ++
      (0 until 30).map { i =>
        val pair = i / 2
        (2000L + i, s"pair $pair document with its own words " +
          (1 to 12).map(j => s"p${pair}_$j").mkString(" "))
      }).toDF("doc_id", "text")
    graft.pipeline.Caps.recentDrops.clear()
    val cand = Dedup.lshCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the boilerplate bucket is dropped whole: no candidate touches it
    assert(cand.nonEmpty, "true near-dup pairs were lost with the cap on")
    assert(!cand.exists { case (a, b) => a < 2000 || b < 2000 },
      s"default cap did not engage on an 1100-member bucket: ${cand.take(5).toList}")
    // every true pair is still found
    (0 until 15).foreach { p =>
      assert(cand.contains((2000L + 2 * p, 2001L + 2 * p)),
        s"pair $p lost")
    }
    // explicit opt-out still keeps everything (quadratic, by request)
    assert(Dedup.lshCandidates(docs, maxBucket = Int.MaxValue)
      .filter(col("doc_a") < 2000).head(1).nonEmpty)
    // "no silent caps": the engaged cap surfaced through the observed
    // metrics (listener bus is async — poll until delivered)
    var spins = 0
    while (graft.pipeline.Caps.recentDrops.isEmpty && spins < 200) {
      Thread.sleep(50); spins += 1
    }
    val drops = graft.pipeline.Caps.recentDrops.asScala.toList
    assert(drops.exists { case (name, nBuckets, nRows, maxB) =>
      name.contains("minhash_lsh") && nBuckets == 4 &&
        nRows == 4400 && maxB == 1100
    }, s"expected a minhash_lsh drop of 4 buckets / 4400 rows, saw $drops")
  }

  test("asOfJoin: a 50%-hot key funnels into one task in the single-window " +
    "form, spreads in the bucketed form — with exact result parity") {
    withFixedShuffle(16) {
      val spark0 = spark
      import spark0.implicits._
      // one hot host carries half of both sides (the one-dominant-
      // service monitoring corpus); times spread over ~200k seconds
      val n = 8000
      def host(i: Int) = if (i % 2 == 0) "hot" else s"h${i % 40}"
      val ldf = (0 until n).map(i =>
        (i.toLong, host(i), (i.toLong * 29) % 200000)).toDF(
        "event_id", "host", "time_s")
      val rdf = (0 until n).map(i =>
        (host(i), (i.toLong * 31) % 200000, 10000L + i, i / 100.0)).toDF(
        "host", "time_s", "rid", "rmetric")
      def run(bucket: Long) = Temporal.asOfJoin(ldf, rdf, Seq("host"),
        "time_s", Seq("rid", "rmetric"), toleranceSeconds = 50000,
        bucketSeconds = bucket)
      val (plainRows, badMax) = maxTaskShuffleRead(
        run(0).collect().map(_.toSeq).toSet)
      val (buckRows, goodMax) = maxTaskShuffleRead(
        run(4000).collect().map(_.toSeq).toSet)
      // the rewrite changes NOTHING: row-for-row identical output
      assert(buckRows == plainRows && plainRows.size == n)
      // calibration: the single-window form reads every hot row (both
      // sides union ≈ n rows on the hot key) in one task
      assert(badMax >= (n * 3) / 4,
        s"calibration: expected ≥${n * 3 / 4} hot rows in one task, saw $badMax")
      // the bucketed form bounds any task at ~one bucket of one key
      assert(goodMax < (n * 3) / 8,
        s"bucketed as-of still concentrated $goodMax records in one task")
    }
  }

  test("sessionize: a 50%-hot key funnels into one task in the native " +
    "session_window form, spreads in the chunked form — parity exact") {
    withFixedShuffle(16) {
      val spark0 = spark
      import spark0.implicits._
      val n = 16000
      // hot host: 23s spacing with a 500s jump every 37 events →
      // ~37-event sessions (gap 30) that regularly straddle the 1000s
      // chunk boundary; cold hosts: 900s spacing → singleton sessions
      val rows = (0 until n / 2).map { j =>
        ("hot", 23L * j + 500L * (j / 37))
      } ++ (0 until n / 2).map { i =>
        (s"h${i % 40}", 900L * (i / 40) + (i % 40))
      }
      val df = rows.toDF("host", "t")
        .withColumn("time", timestamp_seconds(col("t"))).drop("t")
      val (plainS, badMax) = maxTaskShuffleRead(
        Temporal.sessionize(df, Seq("host"), "time", "30 seconds")
          .collect().map(_.toSeq).toSet)
      val (chunkS, goodMax) = maxTaskShuffleRead(
        Temporal.sessionizeBucketed(df, Seq("host"), "time",
          gapSeconds = 30, chunkSeconds = 1000)
          .collect().map(_.toSeq).toSet)
      assert(chunkS == plainS && plainS.nonEmpty)
      // native session_window sorts the hot host's full 8000 events in
      // one task; the chunked form never exceeds ~one chunk of one key
      assert(badMax >= (n * 3) / 8,
        s"calibration: expected ≥${n * 3 / 8} hot rows in one task, saw $badMax")
      assert(goodMax < (n * 3) / 16,
        s"chunked sessionize still concentrated $goodMax records in one task")
    }
  }

  test("skewed plans stay AQE-eligible: no Window over the hot hash, " +
    "partial aggregation present") {
    val p = Curation.segmentDedup(skewedCorpus(50), 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window over seg_hash:\n$p")
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
    val q = Dedup.lshCandidates(skewedCorpus(50), 16, 4, 3, maxBucket = 64)
      .queryExecution.executedPlan.toString
    assert(!q.contains("CartesianProduct"), s"cartesian:\n$q")
  }
}
