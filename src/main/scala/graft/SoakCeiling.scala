package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s.JObject
import org.json4s.jackson.JsonMethods

import graft.streaming.{IndexProcessor, SEvent}

/** Single-box throughput ceiling per soak stream family (r16 verdict
  * item 6): the 30-min soak runs all six legs at a fixed 50 K rows/s,
  * which proves boundedness but not headroom. This main finds, for
  * each family ALONE, the highest `rate` source rows/s the box
  * sustains: each family runs a ×2 ramp (warm up, then measure mean
  * `processedRowsPerSecond` over a window); a rate is sustained when
  * measured capacity ≥ 90% of the offered rate — below that the
  * micro-batch backlog is growing by definition (the rate source
  * offers rows on the clock; capacity < offered ⇒ every batch reads
  * more than the last).
  *
  * Families = the five stateful/join shapes a riemann-style core runs
  * forever: index (TWS + TTL timers), sessionize (session_window),
  * quantiles (chained two-level HDR windows), enrich (stateless
  * stream-static interval join), neardup (saturating-bucket LSH).
  *
  * Appends one JSON line per attempt and a `max_sustained_eps`
  * summary row per family to `SOAK_OUT` (default soak_state.jsonl).
  * Env: SOAK_CEIL_START (50000), SOAK_CEIL_START_NEARDUP (5000),
  * SOAK_CEIL_MAX (3200000), SOAK_CEIL_WARMUP_S (15),
  * SOAK_CEIL_MEASURE_S (30), SPARK_GRAFT_CPUS (8).
  */
object SoakCeiling {
  def main(args: Array[String]): Unit = {
    val startRate = sys.env.getOrElse("SOAK_CEIL_START", "50000").toInt
    val startNeardup =
      sys.env.getOrElse("SOAK_CEIL_START_NEARDUP", "5000").toInt
    val maxRate = sys.env.getOrElse("SOAK_CEIL_MAX", "3200000").toInt
    val warmupS = sys.env.getOrElse("SOAK_CEIL_WARMUP_S", "15").toLong
    val measureS = sys.env.getOrElse("SOAK_CEIL_MEASURE_S", "30").toLong
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

    val ckptRoot = Files.createTempDirectory("graft-ceil-ckpt")

    // same static maintenance-window table as the soak's enrich leg
    val enrichPath = s"$ckptRoot/enrich_windows"
    locally {
      val t0s = System.currentTimeMillis() / 1000
      val lo = t0s / 60 * 60 - 120
      val hi = t0s + 4 * 3600
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

    def events(rate: Int) = spark.readStream.format("rate")
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

    // the soak's leg shapes, parameterized by offered rate
    val families: Seq[(String, Int, Int => DataFrame)] = Seq(
      ("index", startRate, (r: Int) =>
        IndexProcessor(events(r), "30 seconds").toDF()),
      ("sessionize", startRate, (r: Int) =>
        operators.Temporal.sessionize(
          events(r).toDF()
            .withColumn("sess_key", concat(lit("blk-"),
              floor(unix_seconds(col("time")) / 30).cast("string"),
              lit("-"), col("service")))
            .withWatermark("time", "30 seconds"),
          Seq("sess_key"), "time", "10 seconds")),
      ("quantiles", startRate, (r: Int) =>
        pipeline.Sketches.streamingQuantiles(
          events(r).toDF(), "time", "10 seconds", Seq("service"),
          col("metric").cast("long"), Seq(500, 950, 990),
          watermark = "30 seconds")),
      ("enrich", startRate, (r: Int) => {
        val op = JsonMethods.parse(
          s"""{"op":"enrich","table":"$enrichPath","by":["service"],
              "startCol":"win_start","endCol":"win_end",
              "fields":["deploy_id"],"bin":60}""").asInstanceOf[JObject]
        graft.config.ConfigFile.applyOp(events(r).toDF(), op)
      }),
      // r19 VERDICT #3: the multi-source union path — two rate legs at
      // r/2 each, unioned by name into ONE changed-state store. NOTE:
      // the end_lag_s column reads the FIRST leg's source only; both
      // rate legs advance on the same clock, so it remains the
      // backlog signal
      ("union", startRate, (r: Int) =>
        graft.streaming.StatefulOps.changedState(
          events(math.max(1, r / 2))
            .unionByName(events(math.max(1, r - r / 2)))).toDF()),
      ("neardup", startNeardup, (r: Int) => {
        val docs = spark.readStream.format("rate")
          .option("rowsPerSecond", r)
          .option("numPartitions", cpus.toInt)
          .load()
          .select(col("value").as("doc_id"),
            concat(lit("rotating base document "),
              (col("value") % 500).cast("string"),
              lit(" with a shared verbatim span of boilerplate words "),
              lit("variant "), (col("value") % 7).cast("string")).as("text"),
            col("timestamp").as("arrived"))
        graft.streaming.StreamingNearDup(docs, "arrived",
          horizonSeconds = 60L).toDF()
      }))

    def append(line: String): Unit =
      Files.writeString(out, line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)

    /** Offer `rate` for warmup+measure; return (mean ingested rows/s
      * over the measurement window, source backlog in seconds at its
      * end). Fresh checkpoint per attempt — each attempt answers "can
      * a cold stream hold this rate", not "can it drain the previous
      * attempt's backlog".
      *
      * Walks `recentProgress` (NOT `lastProgress`: stateful legs run
      * ~10 empty state-cleanup batches per data batch, so a point
      * sample almost always lands on an empty one) and reads the rate
      * source's offset lag — offsets are SECONDS of generated data,
      * so `latest − end` is directly "how many seconds behind the
      * clock the stream is": the micro-batch queue. */
    def capacityAt(name: String, mk: Int => DataFrame, rate: Int,
        attempt: Int): (Double, Double) = {
      val q = mk(rate).writeStream.format("noop")
        .option("checkpointLocation", s"$ckptRoot/$name-$attempt")
        .start()
      try {
        Thread.sleep(warmupS * 1000)
        val seen = scala.collection.mutable.Set[Long]()
        // batches committed before the window don't count
        q.recentProgress.foreach(p => seen += p.batchId)
        var rows = 0L
        var lagS = 0.0
        val t0 = System.currentTimeMillis()
        val deadline = t0 + measureS * 1000
        while (System.currentTimeMillis() < deadline) {
          Thread.sleep(2000)
          q.recentProgress.foreach { p =>
            if (!seen.contains(p.batchId)) {
              seen += p.batchId
              rows += p.numInputRows
            }
          }
          Option(q.lastProgress).flatMap(_.sources.headOption)
            .foreach { s =>
              try lagS = s.latestOffset.toDouble - s.endOffset.toDouble
              catch { case scala.util.control.NonFatal(_) => () }
            }
        }
        val elapsedS = (System.currentTimeMillis() - t0) / 1000.0
        (rows / elapsedS, lagS)
      } finally {
        try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      }
    }

    // SOAK_CEIL_FAMILIES: comma-separated subset (re-probe one family
    // with different warmup/measure windows — slow-starting stateful
    // legs need more than the default 15 s before their first batch)
    val familyFilter = sys.env.get("SOAK_CEIL_FAMILIES")
      .map(_.split(",").map(_.trim).toSet)
    families.filter(f => familyFilter.forall(_.contains(f._1)))
      .foreach { case (name, start, mk) =>
      var rate = start
      var attempt = 0
      var lastOk = 0.0
      var lastOkRate = 0
      var done = false
      while (!done && rate <= maxRate) {
        val (cap, lagS) = capacityAt(name, mk, rate, attempt)
        // sustained = the stream ingests ≥90% of the offered rate AND
        // ends the window ≤8 s behind the generation clock (a growing
        // backlog fails both; 8 s absorbs one slow stateful batch)
        val ok = cap >= 0.9 * rate && lagS <= 8.0
        System.err.println(f"[ceiling] $name rate=$rate cap=$cap%.0f " +
          f"lag=${lagS}%.0fs sustained=$ok")
        append(s"""{"ceiling_family":"$name","rate":$rate,""" +
          f""""processed_eps":$cap%.0f,"end_lag_s":$lagS%.1f,""" +
          s""""sustained":$ok}""")
        if (ok) { lastOk = cap; lastOkRate = rate; rate *= 2; attempt += 1 }
        else done = true
      }
      append(s"""{"ceiling_family":"$name",""" +
        s""""max_sustained_rate":$lastOkRate,""" +
        f""""max_sustained_eps":$lastOk%.0f,""" +
        s""""first_unsustained_rate":${if (done) rate else -1}}""")
    }
    spark.stop()
  }
}
