package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Landing-zone firehose ceiling (r19 VERDICT #4): docs/config.md
  * claims the `files` protocol is "the curation firehose's production
  * ingest shape" — this main MEASURES that shape instead of asserting
  * it. It runs the curation example topology end-to-end through the
  * packaged process ([[Main.start]]): three streams (quality + langid
  * + dedup + tokens; crosscorpus decontamination; minhash-LSH neardup
  * pairs) all reading ONE parquet landing zone, while a writer thread
  * drops doc files at a controlled rate honoring the documented
  * atomic-arrival contract (stage outside, fsync-free atomic rename
  * in). Ramp: offered docs/s doubles while the zone stays SUSTAINED —
  * every stream's cumulative input catches the writer within
  * `ZONE_DRAIN_BOUND_S` of the writer stopping (a growing backlog
  * fails by definition: time-to-drain measures exactly the queued
  * seconds of data).
  *
  * Appends per-attempt rows and a summary to `SOAK_OUT` (default
  * soak_state.jsonl):
  *   {"zone_ceiling": ..., "rate": R, "written": N,
  *    "e2e_docs_per_sec": ..., "drain_s": ..., "sustained": ...}
  *
  * Env: ZONE_START (2000 docs/s), ZONE_MAX (64000), ZONE_MEASURE_S
  * (30), ZONE_TICK_MS (250), ZONE_DRAIN_BOUND_S (10),
  * SPARK_GRAFT_CPUS (8), SOAK_OUT.
  */
object ZoneBench {
  def main(args: Array[String]): Unit = {
    val startRate = sys.env.getOrElse("ZONE_START", "2000").toInt
    val maxRate = sys.env.getOrElse("ZONE_MAX", "64000").toInt
    val measureS = sys.env.getOrElse("ZONE_MEASURE_S", "30").toLong
    val tickMs = sys.env.getOrElse("ZONE_TICK_MS", "250").toLong
    val drainBoundS = sys.env.getOrElse("ZONE_DRAIN_BOUND_S", "10").toLong
    val out = Paths.get(sys.env.getOrElse("SOAK_OUT", "soak_state.jsonl"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-zone-bench")
    val artifacts = root.resolve("models")

    // one-time corpora: the langid training set, the BPE training set,
    // and the decontamination benchmark — same shapes the curation
    // example names under /data
    val labeled = s"$root/labeled.parquet"
    ((0 until 60).map(i => (i.toLong,
      s"alpha bravo charlie delta echo foxtrot golf hotel item $i", "aa")) ++
      (0 until 60).map(i => (100L + i,
        s"zulu yankee xray whiskey victor uniform tango sierra $i", "zz")))
      .toDF("doc_id", "text", "lang").write.parquet(labeled)
    val bpeTrain = s"$root/bpe.parquet"
    (0 until 200).map(i => (i.toLong,
      s"the quick brown fox jumps over the lazy dog number $i and " +
        "packs boxes with liquor jugs"))
      .toDF("doc_id", "text").write.parquet(bpeTrain)
    val benchmark = s"$root/benchmark.parquet"
    (0 until 50).map(i => (i.toLong,
      s"benchmark eval question $i with canonical answer text that " +
        "must never leak into training"))
      .toDF("doc_id", "text").write.parquet(benchmark)

    def docText(id: Long): String =
      s"rotating base document ${id % 4000} body with a shared " +
        "verbatim span of boilerplate words that the near duplicate " +
        "detector banding keys on while the tail varies " +
        s"variant ${id % 7} tail token alpha beta gamma delta epsilon " +
        s"zeta eta theta iota kappa lambda mu nu xi omicron pi rho " +
        s"sigma tau upsilon phi chi psi omega ${id % 13} ${id % 17}"

    /** Stage a parquet file of `rows` docs and atomically publish it
      * into `zone` — the docs/config.md producer contract. */
    def publish(zone: Path, staging: Path,
        rows: Seq[(Long, String, String, java.sql.Timestamp)]): Unit = {
      val tmp = staging.resolve(s"w${System.nanoTime()}")
      rows.toDF("doc_id", "text", "source", "time")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, zone.resolve(part.getFileName),
        StandardCopyOption.ATOMIC_MOVE)
      ()
    }

    // cumulative input rows per query, listener-fed (recentProgress is
    // a bounded ring — a 30 s window at file-tick cadence overflows it)
    val inputRows = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val n = Option(e.progress.name).getOrElse(return)
        inputRows.merge(n, e.progress.numInputRows, Long.box(_) + _)
        ()
      }
    }
    spark.streams.addListener(listener)
    val queries = Seq("curation-firehose", "decontamination-feed",
      "neardup-pairs")

    def append(line: String): Unit =
      Files.writeString(out, line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)

    var rate = startRate
    var attempt = 0
    var lastOkRate = 0
    var lastOkEps = 0.0
    var done = false
    var nextId = 0L
    while (!done && rate <= maxRate) {
      val adir = root.resolve(s"a$attempt")
      val zone = adir.resolve("zone")
      val staging = adir.resolve("staging")
      Files.createDirectories(zone)
      Files.createDirectories(staging)
      val cfg = adir.resolve("graft.json")
      Files.writeString(cfg,
        s"""{"servers": {
           |   "docs": {"protocol": "files", "path": "$zone",
           |     "format": "parquet",
           |     "schema": "doc_id BIGINT, text STRING, source STRING, time TIMESTAMP"}},
           | "streams": [
           |  {"name": "curation-firehose", "source": "docs",
           |   "pipeline": [
           |     {"op": "quality", "minWords": 20, "maxWords": 100000},
           |     {"op": "langid", "train": "$labeled",
           |      "artifact": "$artifacts/langid"},
           |     {"op": "dedup", "horizon": "6 hours"},
           |     {"op": "tokens", "train": "$bpeTrain",
           |      "artifact": "$artifacts/bpe"}],
           |   "sink": {"kind": "memory", "checkpoint": "$adir/ckpt/cur"}},
           |  {"name": "decontamination-feed", "source": "docs",
           |   "pipeline": [
           |     {"op": "crosscorpus", "table": "$benchmark",
           |      "threshold": 0.5, "mode": "match"}],
           |   "sink": {"kind": "memory", "checkpoint": "$adir/ckpt/dec"}},
           |  {"name": "neardup-pairs", "source": "docs",
           |   "pipeline": [
           |     {"op": "neardup", "horizon": 3600, "k": 16, "bands": 4,
           |      "threshold": 0.5}],
           |   "sink": {"kind": "memory", "checkpoint": "$adir/ckpt/nd"}}
           |]}""".stripMargin)

      def ts(id: Long) = new java.sql.Timestamp(1706000000000L + id)
      def mkRows(n: Int): Seq[(Long, String, String, java.sql.Timestamp)] =
        (0 until n).map { _ =>
          val id = nextId; nextId += 1
          (id, docText(id), s"src-${id % 5}", ts(id))
        }

      inputRows.clear()
      val running = Main.start(cfg, Some(spark))
      try {
        // warm-up: one seed file; every stream must consume it (the
        // first attempt also trains + persists the langid/BPE models)
        publish(zone, staging, mkRows(50))
        val warmDeadline = System.currentTimeMillis() + 300000
        while (queries.exists(q => inputRows.getOrDefault(q, 0L) < 50L) &&
            System.currentTimeMillis() < warmDeadline)
          Thread.sleep(200)
        require(queries.forall(q => inputRows.getOrDefault(q, 0L) >= 50L),
          s"warm-up never landed: $inputRows")

        val base = queries.map(q => q -> inputRows.get(q)).toMap
        val perTick = math.max(1, (rate * tickMs / 1000).toInt)
        val t0 = System.nanoTime()
        var written = 0L
        val stopAt = System.currentTimeMillis() + measureS * 1000
        var tick = 0L
        while (System.currentTimeMillis() < stopAt) {
          publish(zone, staging, mkRows(perTick))
          written += perTick
          tick += 1
          // pace against the offer clock, absorbing slow publishes
          val next = System.currentTimeMillis() / tickMs * tickMs + tickMs
          val sleep = next - System.currentTimeMillis()
          if (sleep > 0) Thread.sleep(sleep)
        }
        val tStop = System.nanoTime()
        def caughtUp(): Boolean = queries.forall(q =>
          inputRows.getOrDefault(q, 0L) - base(q) >= written)
        val drainDeadline = System.currentTimeMillis() + 180000
        while (!caughtUp() &&
            System.currentTimeMillis() < drainDeadline)
          Thread.sleep(200)
        val drainS = (System.nanoTime() - tStop) / 1e9
        val e2eEps = written / ((System.nanoTime() - t0) / 1e9)
        val ok = caughtUp() && drainS <= drainBoundS
        System.err.println(f"[zone] rate=$rate written=$written " +
          f"e2e=$e2eEps%.0f docs/s drain=$drainS%.1fs sustained=$ok")
        append(s"""{"zone_ceiling":"files-curation","rate":$rate,""" +
          s""""written":$written,""" +
          f""""e2e_docs_per_sec":$e2eEps%.0f,"drain_s":$drainS%.1f,""" +
          s""""sustained":$ok}""")
        if (ok) { lastOkRate = rate; lastOkEps = e2eEps; rate *= 2
          attempt += 1 }
        else done = true
      } finally {
        try running.stop()
        catch { case scala.util.control.NonFatal(_) => () }
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    append(s"""{"zone_ceiling":"files-curation",""" +
      s""""max_sustained_rate":$lastOkRate,""" +
      f""""max_sustained_docs_per_sec":$lastOkEps%.0f,""" +
      s""""first_unsustained_rate":${if (done) rate else -1}}""")
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
