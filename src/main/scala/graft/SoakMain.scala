package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.json4s.JObject
import org.json4s.jackson.JsonMethods

import graft.streaming.{IndexProcessor, SEvent}

/** Long-haul soak main (the r7/r8 verdicts' carried item): sustained
  * throughput for `SOAK_MINUTES` (default 30) against the two state
  * shapes a riemann core keeps forever — the index (per-key latest +
  * TTL timers, transformWithState on RocksDB) and a watermarked
  * window aggregation — with a kill-and-restart every
  * `SOAK_RESTART_EVERY_S` (default 300 s) through the [[Core]]
  * lifecycle on shared checkpoints.
  *
  * What it measures (the question behind riemann's documented
  * `by`-substream leak, reference src/riemann/streams.clj:1556-1583:
  * substream state there grows with key cardinality and is never
  * dropped): per-batch RocksDB state rows + on-disk bytes over wall
  * time, appended to `SOAK_OUT` (default soak_state.jsonl). With a
  * bounded key universe and TTL-driven expiry the series must
  * PLATEAU; monotonic growth would reproduce the leak. The final
  * line is a summary JSON with first/mid/last-third maxima so a
  * reader (or the README table) can see boundedness at a glance.
  *
  * Input is the built-in `rate` source — deterministic sustained
  * load with no external dependency: `value` maps onto a rotating
  * key universe of `SOAK_KEYS` hosts (default 20,000) × 3 services,
  * event-time = source timestamp, ttl 60 s, watermark 30 s.
  */
object SoakMain {
  def main(args: Array[String]): Unit = {
    val minutes = sys.env.getOrElse("SOAK_MINUTES", "30").toLong
    val restartEveryS = sys.env.getOrElse("SOAK_RESTART_EVERY_S", "300").toLong
    val rowsPerSec = sys.env.getOrElse("SOAK_ROWS_PER_SEC", "50000").toInt
    // r17 VERDICT #6 (mixed-workload soak): per-family rate overrides
    // so the legs can run concurrently at fractions of their
    // INDIVIDUAL SoakCeiling ceilings instead of one uniform rate
    def familyRate(name: String, dflt: Int): Int =
      sys.env.getOrElse(s"SOAK_RATE_${name.toUpperCase}", dflt.toString).toInt
    val rateIndex = familyRate("index", rowsPerSec)
    val rateWindow = familyRate("window", rowsPerSec)
    val rateSession = familyRate("session", rowsPerSec)
    val rateQuantiles = familyRate("quantiles", rowsPerSec)
    val rateEnrich = familyRate("enrich", rowsPerSec)
    val rateNeardup = familyRate("neardup", math.max(1, rowsPerSec / 10))
    val rateUnion = familyRate("union", rowsPerSec)
    val nKeys = sys.env.getOrElse("SOAK_KEYS", "20000").toInt
    val out = Paths.get(sys.env.getOrElse("SOAK_OUT", "soak_state.jsonl"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ckptRoot = Files.createTempDirectory("graft-soak-ckpt")
    Files.deleteIfExists(out)

    // r16: static maintenance-window table for the config-wired enrich
    // leg — per service, a 30 s-on / 30 s-off deploy window every
    // minute spanning the whole soak (plus slack), so the stream-static
    // interval join exercises BOTH the matched and the unmatched path
    // at a ~50% duty cycle the observed metrics can sanity-check
    val enrichPath = s"$ckptRoot/enrich_windows"
    locally {
      val t0s = System.currentTimeMillis() / 1000
      val lo = t0s / 60 * 60 - 120
      val hi = t0s + minutes * 60 + 300
      spark.range(lo / 60, hi / 60 + 1)
        .select((col("id") * 60).as("win_start"))
        .crossJoin(spark.range(3).select(
          concat(lit("svc-"), col("id").cast("string")).as("service")))
        .select(col("service"), col("win_start"),
          (col("win_start") + 30).as("win_end"),
          concat(lit("dep-"), col("service"), lit("-"),
            col("win_start").cast("string")).as("deploy_id"))
        .coalesce(1).write.parquet(enrichPath)
    }

    def events(rate: Int = rowsPerSec) = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", cpus.toInt)
      .load()
      .select(
        concat(lit("host-"), (col("value") % nKeys).cast("string")).as("host"),
        concat(lit("svc-"), (col("value") % 3).cast("string")).as("service"),
        when(col("value") % 100 === 0, "critical").otherwise("ok").as("state"),
        (col("value") % 1000).cast("double").as("metric"),
        col("timestamp").as("time"),
        lit(60.0).as("ttl"))
      .as[SEvent]

    def writerFor(name: String)(df: org.apache.spark.sql.DataFrame) =
      df.writeStream.format("noop")
        .option("checkpointLocation", s"$ckptRoot/$name")

    val core = new Core(spark)
    def register(): Unit = {
      // index: per-key latest + TTL expiry — state rows bounded by the
      // live key universe (nKeys * 3), NOT by events processed
      core.stream("soak-index", signature = "v1") {
        writerFor("index")(IndexProcessor(events(rateIndex), "30 seconds").toDF())
      }
      // windowed agg: 10 s windows, watermark-bounded retention
      core.stream("soak-window", signature = "v1") {
        writerFor("window")(
          events(rateWindow).withWatermark("time", "30 seconds")
            .groupBy(window(col("time"), "10 seconds"), col("service"))
            .agg(sum(col("metric")).as("sum_metric"),
              count(lit(1)).as("n"))
            .select(col("service"), col("window.start").as("time"),
              col("sum_metric"), col("n")))
      }
      // r11: the saturating-bucket dedup kernel under sustained load —
      // rotating near-dup doc variants drive every (band, bucket) into
      // horizon eviction AND saturation; state must plateau exactly
      // like the index (a tenth of the event rate: the minhash kernel
      // is per-doc CPU, and the plateau question is about STATE, not
      // about racing the codec)
      // r15: gap sessionization under sustained load. The session key
      // rotates every 30 s of event time, so each key is hot for ~30 s
      // and then goes quiet forever — every session must CLOSE (the
      // block's silence exceeds the 10 s gap), emit, and have its
      // state evicted once the watermark passes; the key universe is
      // unbounded over the soak but open-session state is bounded by
      // the handful of live blocks. Monotonic state growth here would
      // mean session_window rows outlive their watermark.
      core.stream("soak-session", signature = "v1") {
        writerFor("session")(
          operators.Temporal.sessionize(
            events(rateSession).toDF()
              .withColumn("sess_key", concat(lit("blk-"),
                floor(unix_seconds(col("time")) / 30).cast("string"),
                lit("-"), col("service")))
              .withWatermark("time", "30 seconds"),
            Seq("sess_key"), "time", "10 seconds"))
      }
      // r15: windowed HDR quantiles — the chained two-level stateful
      // shape (bucket histogram -> re-window on window_time -> bounded
      // cell collect). State per (window, key) is <= ~2k histogram
      // cells; retention is watermark-bounded, so the series must
      // plateau exactly like the plain windowed agg.
      core.stream("soak-quantiles", signature = "v1") {
        writerFor("quantiles")(
          pipeline.Sketches.streamingQuantiles(
            events(rateQuantiles).toDF(), "time", "10 seconds", Seq("service"),
            col("metric").cast("long"), Seq(500, 950, 990),
            watermark = "30 seconds"))
      }
      // r16: the config-wired STATELESS enrich op under chaos — the
      // firehose joins the static maintenance-window table through
      // ConfigFile.applyOp (the exact "op":"enrich" path: intervalsOf
      // + collision guards + StreamingAsOf.enrich). No state store, so
      // it contributes ZERO state rows; the thing the soak must prove
      // is liveness THROUGH restarts and that the join keeps MATCHING
      // (an all-null left join would be a silent interval-table or
      // bin-formula fork) — the observed matched fraction (~50% duty
      // cycle by construction) lands in every soak sample line.
      core.stream("soak-enrich", signature = "v1") {
        val op = JsonMethods.parse(
          s"""{"op":"enrich","table":"$enrichPath","by":["service"],
              "startCol":"win_start","endCol":"win_end",
              "fields":["deploy_id"],"bin":60}""").asInstanceOf[JObject]
        writerFor("enrich")(
          graft.config.ConfigFile.applyOp(events(rateEnrich).toDF(), op)
            .observe("enrich_obs", count(lit(1)).as("n"),
              count(col("asof_deploy_id")).as("matched")))
      }
      // r19 VERDICT #3: the multi-source union shape under chaos — ONE
      // stateful stream (changed-state, flatMapGroupsWithState) fed by
      // TWO independent rate sources unioned by name, sharing ONE
      // state store across legs (the r19 config semantics: the same
      // event key arriving on either transport hits the same state).
      // Both legs draw from the same (host, service) universe, so
      // state rows stay bounded by nKeys x 3 exactly like the index
      // leg; a per-leg split would double the store and fork the
      // changed-state answer.
      core.stream("soak-union", signature = "v1") {
        writerFor("union")(graft.streaming.StatefulOps.changedState(
          events(math.max(1, rateUnion / 2))
            .unionByName(events(math.max(1, rateUnion - rateUnion / 2))))
          .toDF())
      }
      core.stream("soak-neardup", signature = "v1") {
        val docs = spark.readStream.format("rate")
          .option("rowsPerSecond", rateNeardup)
          .option("numPartitions", cpus.toInt)
          .load()
          .select(col("value").as("doc_id"),
            concat(lit("rotating base document "),
              (col("value") % 500).cast("string"),
              lit(" with a shared verbatim span of boilerplate words "),
              lit("variant "), (col("value") % 7).cast("string")).as("text"),
            col("timestamp").as("arrived"))
        writerFor("neardup")(
          graft.streaming.StreamingNearDup(docs, "arrived",
            horizonSeconds = 60L).toDF())
      }
    }

    // state-size sampler: StreamingQueryProgress stateOperators carry
    // numRowsTotal + RocksDB custom metrics (sst files bytes)
    def sample(): Seq[String] =
      core.activeQueries.toSeq.flatMap { case (name, q) =>
        Option(q.lastProgress).map { p =>
          val ops = p.stateOperators
          val rows = ops.map(_.numRowsTotal).sum
          val sst = ops.map(o =>
            Option(o.customMetrics.get("rocksdbSstFileSize"))
              .map(_.longValue).getOrElse(0L)).sum
          val mem = ops.map(_.memoryUsedBytes).sum
          // stateless legs (the enrich op) prove themselves via
          // observed per-batch metrics instead of state rows
          val obs = Option(p.observedMetrics.get("enrich_obs")).map { r =>
            s""","obs_n":${r.getAs[Long]("n")},""" +
              s""""obs_matched":${r.getAs[Long]("matched")}"""
          }.getOrElse("")
          // rate-source backlog in SECONDS behind the generation clock
          // (offsets are seconds of data). NOTE: within one COMPLETED
          // batch's progress, end==latest for the rate source (both
          // captured at planning), so this reads ~0 even when behind —
          // the real sustainability signal is span_s vs duration: a
          // batch that covers span_s seconds of generated data but
          // takes longer than span_s to process means the stream is
          // falling behind the clock (spans then grow batch over
          // batch). Both are recorded; readers should trust span/dur.
          val lagS = p.sources.headOption.map { s =>
            try s.latestOffset.toDouble - s.endOffset.toDouble
            catch { case scala.util.control.NonFatal(_) => -1.0 }
          }.getOrElse(-1.0)
          val spanS = p.sources.headOption.map { s =>
            try s.endOffset.toDouble - s.startOffset.toDouble
            catch { case scala.util.control.NonFatal(_) => -1.0 }
          }.getOrElse(-1.0)
          s"""{"t":${System.currentTimeMillis / 1000},"query":"$name",""" +
            s""""batch":${p.batchId},"state_rows":$rows,""" +
            s""""sst_bytes":$sst,"mem_bytes":$mem,""" +
            f""""end_lag_s":$lagS%.1f,"span_s":$spanS%.1f,""" +
            s""""batch_ms":${p.batchDuration},""" +
            s""""input_rows":${p.numInputRows},""" +
            s""""rows_per_sec":${p.processedRowsPerSecond}$obs}"""
        }
      }

    register()
    core.applyConfig()
    System.err.println(s"[soak] running $minutes min, restart every " +
      s"$restartEveryS s, $rowsPerSec rows/s, $nKeys hosts; -> $out")

    val t0 = System.currentTimeMillis()
    val deadline = t0 + minutes * 60000
    var lastRestart = t0
    var nRestarts = 0
    val series = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(10000)
      val lines = sample()
      Files.writeString(out,
        lines.map(_ + "\n").mkString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      // total state across queries for the plateau check
      val rows = core.activeQueries.values.flatMap(q =>
        Option(q.lastProgress).toSeq.flatMap(_.stateOperators.map(_.numRowsTotal)))
        .sum
      val sst = core.activeQueries.values.flatMap(q =>
        Option(q.lastProgress).toSeq.flatMap(_.stateOperators.map(o =>
          Option(o.customMetrics.get("rocksdbSstFileSize"))
            .map(_.longValue).getOrElse(0L))))
        .sum
      series += (((System.currentTimeMillis() - t0) / 1000, rows, sst))
      System.err.println(s"[soak] +${(System.currentTimeMillis() - t0) / 1000}s" +
        s" state_rows=$rows sst_bytes=$sst restarts=$nRestarts")

      if (System.currentTimeMillis() - lastRestart >= restartEveryS * 1000 &&
        System.currentTimeMillis() < deadline - 30000) {
        // the chaos leg: full stop (as in SoakSpec), re-register, same
        // checkpoints -> RocksDB recovery, state must carry over
        core.stop()
        register()
        core.applyConfig()
        nRestarts += 1
        lastRestart = System.currentTimeMillis()
        System.err.println(s"[soak] restart #$nRestarts done")
      }
    }
    core.stop()

    def thirdMax(sel: ((Long, Long, Long)) => Long, third: Int): Long = {
      val n = series.length
      val slice = series.slice(n * third / 3, n * (third + 1) / 3)
      if (slice.isEmpty) 0L else slice.map(sel).max
    }
    val summary =
      s"""{"minutes":$minutes,"rows_per_sec":$rowsPerSec,""" +
        s""""rates":{"index":$rateIndex,"window":$rateWindow,""" +
        s""""session":$rateSession,"quantiles":$rateQuantiles,""" +
        s""""enrich":$rateEnrich,"neardup":$rateNeardup,""" +
        s""""union":$rateUnion},""" +
        s""""keys":${nKeys * 3},""" +
        s""""restarts":$nRestarts,"samples":${series.length},""" +
        s""""state_rows_max_third1":${thirdMax(_._2, 0)},""" +
        s""""state_rows_max_third2":${thirdMax(_._2, 1)},""" +
        s""""state_rows_max_third3":${thirdMax(_._2, 2)},""" +
        s""""sst_bytes_max_third1":${thirdMax(_._3, 0)},""" +
        s""""sst_bytes_max_third2":${thirdMax(_._3, 1)},""" +
        s""""sst_bytes_max_third3":${thirdMax(_._3, 2)}}"""
    Files.writeString(out, summary + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(summary)
    spark.stop()
  }
}
