package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.ConfigFile
import graft.streaming.SEvent

/** The config-surface fan-out contract (reference src/riemann/core.clj:
  * 15-20: `stream!` hands EVERY event to EVERY registered stream):
  * several config streams naming one source must each see every event
  * exactly once, with full per-stream streaming-stateful semantics —
  * the Loader tees the single-consumer source into per-subscriber
  * spools (ConfigFile.Loader scaladoc). These tests pin:
  *   - N sinks × M events, exactly-once per sink, across rounds
  *   - cross-batch STATEFUL state survives the tee hop (the property a
  *     foreachBatch-routing fan-out would silently break)
  *   - an edited stream rotates to a fresh spool: restart-loses-state
  *     reload semantics (pure.clj:1-30), no history replay, and the
  *     untouched sibling keeps its query
  *   - the 1→2 subscriber transition re-plans the previously-direct
  *     stream onto the tee
  *   - a `replayable` source skips the tee (native fan-out)
  */
class FanoutSpec extends SparkSpec {

  private def write(p: Path, s: String): Unit = { Files.writeString(p, s); () }

  test("sweepStaged removes crashed-attempt leftovers (.stage-* dirs, " +
    ".copy-*.tmp files) and nothing else — the pruneSpool blind spot " +
    "that leaked full batch copies forever (r19 ADVICE)") {
    val dir = Files.createTempDirectory("graft-sweep-staged")
    // a crashed attempt's stage dir, with the staged part file inside
    val stage = dir.resolve(".stage-b00000000000000000007-abc123")
    Files.createDirectories(stage)
    Files.writeString(stage.resolve("part-00000.parquet"), "x")
    // a link-fallback temp that never reached its atomic rename
    Files.writeString(dir.resolve(".copy-42.tmp"), "x")
    // the driver-side JSON fast path stages a FILE, not a dir
    Files.writeString(dir.resolve(".stage-b00000000000000000008-x.json"), "x")
    // survivors: delivered data, spool metadata, an unrelated dotfile
    Files.writeString(dir.resolve("b00000000000000000006.parquet"), "x")
    Files.writeString(dir.resolve("_spark_metadata"), "x")
    Files.writeString(dir.resolve(".hidden-other"), "x")
    assert(ConfigFile.sweepStaged(dir) == 3)
    val left = Option(dir.toFile.listFiles()).get.map(_.getName).toSet
    assert(left == Set("b00000000000000000006.parquet",
      "_spark_metadata", ".hidden-other"), s"left: $left")
    // idempotent
    assert(ConfigFile.sweepStaged(dir) == 0)
  }

  test("fan-out: three sinks x two rounds, every subscriber sees every " +
    "event exactly once (core.clj:15-20)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-fanout-spec")
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"all","source":"in","pipeline":[],
        |  "sink":{"kind":"memory"}},
        | {"name":"crit","source":"in",
        |  "pipeline":[{"op":"where","expr":"state = 'critical'"}],
        |  "sink":{"kind":"memory"}},
        | {"name":"x2","source":"in",
        |  "pipeline":[{"op":"scale","factor":2.0}],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)

    val in = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("in" -> (() => in.toDF())))
    try {
      assert(loader.reload().toSet == Set("all", "crit", "x2"))
      // ONE tee consumes the source; three subscriber queries
      assert(core.activeQueries.keySet ==
        Set("all", "crit", "x2", "__fanout__in"))

      def ev(i: Int, st: String) =
        SEvent(s"h$i", "s", st, Some(i.toDouble), new Timestamp(i * 1000L), None)
      in.addData(ev(1, "ok"), ev(2, "critical"))
      core.processAllAvailable()
      // extra drains must not re-deliver (exactly-once per sink)
      core.processAllAvailable()

      import scala.jdk.CollectionConverters._
      def hosts(name: String): Seq[String] = loader.memorySinks(name)
        .rows.asScala.toSeq.map(_.getAs[String]("host")).sorted
      assert(hosts("all") == Seq("h1", "h2"))
      assert(hosts("crit") == Seq("h2"))
      assert(hosts("x2") == Seq("h1", "h2"))
      assert(loader.memorySinks("x2").rows.asScala
        .map(_.getAs[Double]("metric")).toSet == Set(2.0, 4.0))

      // round two accumulates, still exactly once each
      in.addData(ev(3, "critical"))
      core.processAllAvailable()
      assert(hosts("all") == Seq("h1", "h2", "h3"))
      assert(hosts("crit") == Seq("h2", "h3"))
      assert(hosts("x2") == Seq("h1", "h2", "h3"))
    } finally core.stop()
  }

  test("fan-out preserves cross-batch STATEFUL semantics per subscriber " +
    "(streaming exact dedup drops a duplicate arriving in a LATER " +
    "micro-batch — what per-batch routing could never do)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-fanout-state")
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"uniq","source":"docs",
        |  "pipeline":[{"op":"dedup","horizon":"1 hour"}],
        |  "sink":{"kind":"memory"}},
        | {"name":"raw","source":"docs","pipeline":[],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)

    val in = MemoryStream[(Long, String, Timestamp)]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("docs" -> (() => in.toDF()
        .toDF("doc_id", "text", "time"))))
    try {
      loader.reload()
      def ts(s: Long) = new Timestamp(s * 1000)
      in.addData((1L, "the same document text", ts(100)))
      core.processAllAvailable()
      // the duplicate arrives in a SEPARATE micro-batch: only state
      // carried across batches inside the subscriber's own streaming
      // query can drop it
      in.addData((2L, "the same document text", ts(200)),
        (3L, "a different document", ts(300)))
      core.processAllAvailable()

      import scala.jdk.CollectionConverters._
      assert(loader.memorySinks("uniq").rows.asScala
        .map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L))
      assert(loader.memorySinks("raw").rows.asScala
        .map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
    } finally core.stop()
  }

  test("reload: an edited subscriber rotates to a fresh spool (sees only " +
    "post-restart events — riemann restart-loses-state, no history " +
    "replay); the untouched sibling keeps its query and its stream") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-fanout-reload")
    val cfg = dir.resolve("c.json")
    def conf(factor: Double) =
      s"""{"streams":[
         | {"name":"a","source":"in","pipeline":[],
         |  "sink":{"kind":"memory"}},
         | {"name":"b","source":"in",
         |  "pipeline":[{"op":"scale","factor":$factor}],
         |  "sink":{"kind":"memory"}}]}""".stripMargin
    write(cfg, conf(2.0))

    val in = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("in" -> (() => in.toDF())))
    try {
      loader.reload()
      val aId = core.activeQueries("a").id
      def ev(i: Int) =
        SEvent(s"h$i", "s", "ok", Some(i.toDouble), new Timestamp(i * 1000L), None)
      in.addData(ev(1))
      core.processAllAvailable()

      write(cfg, conf(10.0))
      assert(loader.reload() == Seq("b")) // a and the tee stay equiv
      assert(core.activeQueries("a").id == aId)

      in.addData(ev(5))
      core.processAllAvailable()
      import scala.jdk.CollectionConverters._
      // b's sink: 2.0 from before the edit, then ONLY the new event at
      // the new factor — h1 is NOT replayed through the edited pipeline
      assert(loader.memorySinks("b").rows.asScala
        .map(_.getAs[Double]("metric")).toSeq.sorted == Seq(2.0, 50.0))
      // a never restarted and saw both
      assert(loader.memorySinks("a").rows.asScala
        .map(_.getAs[String]("host")).toSeq.sorted == Seq("h1", "h5"))
    } finally core.stop()
  }

  test("1 -> 2 subscriber transition: the previously-direct stream is " +
    "re-planned onto the tee and both see subsequent events") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-fanout-grow")
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"a","source":"in","pipeline":[],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)

    val in = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("in" -> (() => in.toDF())))
    try {
      loader.reload()
      assert(core.activeQueries.keySet == Set("a")) // direct, no tee
      def ev(i: Int) =
        SEvent(s"h$i", "s", "ok", Some(i.toDouble), new Timestamp(i * 1000L), None)
      in.addData(ev(1))
      core.processAllAvailable()

      write(cfg,
        """{"streams":[
          | {"name":"a","source":"in","pipeline":[],
          |  "sink":{"kind":"memory"}},
          | {"name":"b","source":"in","pipeline":[],
          |  "sink":{"kind":"memory"}}]}""".stripMargin)
      // a restarts (its input plan flips from direct to the spool)
      assert(loader.reload().toSet == Set("a", "b"))
      assert(core.activeQueries.keySet == Set("a", "b", "__fanout__in"))

      in.addData(ev(2))
      core.processAllAvailable()
      import scala.jdk.CollectionConverters._
      def hosts(n: String) = loader.memorySinks(n).rows.asScala
        .map(_.getAs[String]("host")).toSeq.sorted
      // post-transition events are exactly-once everywhere; data the
      // source still RETAINED at the transition (h1's batch — a
      // MemoryStream trims only on the next batch's lazy commit) may
      // be re-delivered by the fresh tee: the documented at-least-once
      // topology-transition contract, matching the server sources'
      // restart handoff
      assert(hosts("a").count(_ == "h2") == 1 && hosts("a").contains("h1"))
      assert(hosts("b").count(_ == "h2") == 1)
    } finally core.stop()
  }

  test("spool retention: pruneSpool deletes data files past the cutoff, " +
    "keeps metadata and fresh files; the tee wires it on a 64-batch " +
    "cadence so a long-running firehose's spool stays bounded") {
    val dir = Files.createTempDirectory("graft-spool-ret")
    def plant(name: String, ageMs: Long): Path = {
      val p = dir.resolve(name)
      Files.writeString(p, "x")
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ageMs))
      p
    }
    val old1 = plant("part-00000-old.parquet", 3600 * 1000L)
    val meta = plant("_SUCCESS", 3600 * 1000L)
    val hidden = plant(".crc-thing", 3600 * 1000L)
    val fresh = plant("part-00001-fresh.parquet", 0L)
    val n = graft.config.ConfigFile.pruneSpool(dir,
      System.currentTimeMillis() - 60 * 1000L)
    assert(n == 1, s"pruned $n")
    assert(!Files.exists(old1))
    assert(Files.exists(meta) && Files.exists(hidden) && Files.exists(fresh))

    // wiring: a Loader with a tiny retention deletes an 8-day-old
    // planted spool file on the tee's first batch (batchId 0 hits the
    // 64-batch cadence); the live stream is unaffected
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cdir = Files.createTempDirectory("graft-spool-ret-e2e")
    val cfg = cdir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"a","source":"in","pipeline":[],"sink":{"kind":"memory"}},
        | {"name":"b","source":"in","pipeline":[],"sink":{"kind":"memory"}}]}"""
        .stripMargin)
    val in = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new graft.config.ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("in" -> (() => in.toDF())),
      fanoutRetentionMs = 24L * 3600 * 1000)
    import scala.jdk.CollectionConverters._
    try {
      loader.reload()
      // plant a VALID parquet file (the subscriber's file source may
      // read it — a retention test must not poison the stream) with
      // an ancient mtime, in each subscriber's spool
      val seed = cdir.resolve("seed")
      Seq(SEvent("planted", "s", "ok", Some(0.0),
        new java.sql.Timestamp(500), None))
        .toDF().coalesce(1).write.parquet(seed.toString)
      val seedPart = Files.list(seed).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val spools = Files.list(loader.fanoutDir.resolve("in")).iterator()
      var planted: Seq[Path] = Nil
      spools.forEachRemaining { d =>
        if (d.getFileName.toString.startsWith("sub-")) {
          val p = d.resolve("part-ancient.parquet")
          Files.copy(seedPart, p)
          Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(
              System.currentTimeMillis() - 8L * 24 * 3600 * 1000))
          planted = planted :+ p
        }
      }
      assert(planted.size == 2)
      in.addData(SEvent("h1", "s", "ok", Some(1.0),
        new java.sql.Timestamp(1000), None))
      core.processAllAvailable()
      planted.foreach(p => assert(!Files.exists(p),
        s"retention did not delete $p"))
      assert(loader.memorySinks("a").rows.asScala
        .exists(_.getAs[String]("host") == "h1"))
    } finally core.stop()
  }

  test("plan discipline: a subscriber's where-filter pushes down into " +
    "its spool parquet scan (the fan-out hop costs a spool write, " +
    "never scan-level pushdown)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-fanout-plan")
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"crit","source":"in",
        |  "pipeline":[{"op":"where","expr":"state = 'critical'"}],
        |  "sink":{"kind":"memory"}},
        | {"name":"all","source":"in","pipeline":[],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)
    val in = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new graft.config.ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("in" -> (() => in.toDF())))
    try {
      loader.reload()
      in.addData(SEvent("h1", "s", "critical", Some(1.0),
        new java.sql.Timestamp(1000), None))
      core.processAllAvailable()
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        core.activeQueries("crit").explain()
      }
      val plan = out.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("EqualTo(state,critical)"),
        s"filter not pushed to the spool scan:\n$plan")
    } finally core.stop()
  }

  test("multi-source stream: `\"source\": [\"a\",\"b\"]` feeds ONE " +
    "topology with ONE state store — a duplicate arriving on the OTHER " +
    "source in a LATER micro-batch is dropped by the shared streaming " +
    "dedup state (riemann.config:6-28: tcp+udp+graphite into one " +
    "(streams ...); core.clj:15-20 stream!)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-multisrc")
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"uniq","source":["a","b"],
        |  "pipeline":[{"op":"dedup","horizon":"1 hour"}],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)
    val inA = MemoryStream[(Long, String, Timestamp)]
    val inB = MemoryStream[(Long, String, Timestamp)]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map(
        "a" -> (() => inA.toDF().toDF("doc_id", "text", "time")),
        "b" -> (() => inB.toDF().toDF("doc_id", "text", "time"))))
    try {
      assert(loader.reload() == Seq("uniq"))
      // each source has exactly ONE subscriber: the union consumes both
      // directly in one query — no tee, no spool hop
      assert(core.activeQueries.keySet == Set("uniq"))
      def ts(s: Long) = new Timestamp(s * 1000)
      inA.addData((1L, "the same document text", ts(100)))
      core.processAllAvailable()
      // duplicate text arrives on source B in a LATER batch: only ONE
      // state store spanning both sources can drop it (a per-transport
      // stream split would keep two dedup stores and let it through)
      inB.addData((2L, "the same document text", ts(200)),
        (3L, "a different document", ts(300)))
      core.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(loader.memorySinks("uniq").rows.asScala
        .map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L))
    } finally core.stop()
  }

  test("union watermark liveness: a QUIET leg does not stall the " +
    "unioned stream — the watermark node sits ABOVE the unionByName, " +
    "so append-mode windows close from whichever leg feeds; the " +
    "per-leg min-watermark stall shape cannot occur in this topology " +
    "(r19 VERDICT #3)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-union-quiet")
    val cfg = dir.resolve("c.json")
    // append-mode windowed count: rows surface ONLY when the watermark
    // passes the window end — the strictest liveness probe available
    write(cfg,
      """{"streams":[
        | {"name":"win","source":["a","b"],
        |  "pipeline":[{"op":"window","seconds":10,
        |               "watermark":"0 seconds","agg":"count"}],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)
    val inA = MemoryStream[SEvent]
    val inB = MemoryStream[SEvent]   // never fed: the quiet leg
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("a" -> (() => inA.toDF()), "b" -> (() => inB.toDF())))
    import scala.jdk.CollectionConverters._
    try {
      loader.reload()
      def ev(s: Long) = SEvent("h1", "svc", "ok", Some(1.0),
        new Timestamp(s * 1000), None)
      inA.addData(ev(105))
      core.processAllAvailable()
      // event time 125 on the ACTIVE leg advances the single post-union
      // watermark past 110 and must close window [100, 110) even
      // though leg b has never produced a row
      inA.addData(ev(125))
      val deadline = System.currentTimeMillis() + 30000
      def rows() = loader.memorySinks("win").rows.asScala.toSeq
      while (rows().isEmpty && System.currentTimeMillis() < deadline) {
        core.processAllAvailable(); Thread.sleep(50)
      }
      val closed = rows()
      assert(closed.nonEmpty,
        "the quiet leg stalled the union watermark: no window ever closed")
      assert(closed.exists(r =>
        r.getAs[java.sql.Timestamp]("time").getTime == 100000L &&
          r.getAs[Double]("metric") == 1.0), s"got $closed")
    } finally core.stop()
  }

  test("multi-source x fan-out mix: a source shared with another stream " +
    "is teed; the multi-source stream unions its spool leg with its " +
    "still-direct leg; duplicate source names in one stream are rejected") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-multisrc-mix")
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"both","source":["a","b"],"pipeline":[],
        |  "sink":{"kind":"memory"}},
        | {"name":"onlyA","source":"a","pipeline":[],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)
    val inA = MemoryStream[SEvent]
    val inB = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("a" -> (() => inA.toDF()), "b" -> (() => inB.toDF())))
    try {
      assert(loader.reload().toSet == Set("both", "onlyA"))
      // a: 2 subscribers -> teed; b: 1 subscriber -> direct into both's union
      assert(core.activeQueries.keySet ==
        Set("both", "onlyA", "__fanout__a"))
      def ev(i: Int) = SEvent(s"h$i", "s", "ok", Some(i.toDouble),
        new Timestamp(i * 1000L), None)
      inA.addData(ev(1))
      inB.addData(ev(2))
      core.processAllAvailable()
      import scala.jdk.CollectionConverters._
      def hosts(n: String) = loader.memorySinks(n).rows.asScala
        .map(_.getAs[String]("host")).toSeq.sorted
      assert(hosts("both") == Seq("h1", "h2"))
      assert(hosts("onlyA") == Seq("h1"))
    } finally core.stop()

    val badCfg = dir.resolve("bad.json")
    write(badCfg,
      """{"streams":[
        | {"name":"dup","source":["a","a"],"pipeline":[],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)
    val core2 = new Core(spark)
    val loader2 = new ConfigFile.Loader(core2, spark, badCfg,
      sources0 = Map("a" -> (() => inA.toDF())))
    try {
      val e = intercept[IllegalArgumentException](loader2.reload())
      assert(e.getMessage.contains("twice"))
    } finally core2.stop()
  }

  test("multi-source stream with HETEROGENEOUS source schemas unions by " +
    "name (missing columns null-filled) — a tcp SEvent leg and a " +
    "graphite-shaped leg feed one pipeline") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-multisrc-hetero")
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"merged","source":["ev","lines"],"pipeline":[],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)
    val inEv = MemoryStream[SEvent]
    val inLn = MemoryStream[(String, Double, Timestamp)]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map(
        "ev" -> (() => inEv.toDF()),
        "lines" -> (() => inLn.toDF().toDF("service", "metric", "time"))))
    try {
      loader.reload()
      inEv.addData(SEvent("h1", "cpu", "ok", Some(0.5),
        new Timestamp(1000), None))
      inLn.addData(("mem", 0.7, new Timestamp(2000)))
      core.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val rows = loader.memorySinks("merged").rows.asScala.toSeq
      assert(rows.size == 2)
      val byService = rows.map(r =>
        r.getAs[String]("service") -> r).toMap
      // the SEvent leg carries host/state; the line leg has them null
      assert(byService("cpu").getAs[String]("host") == "h1")
      assert(byService("mem").getAs[String]("host") == null)
      assert(byService("mem").getAs[Double]("metric") == 0.7)
    } finally core.stop()
  }

  test("exactly-once across a tee crash: a replayed micro-batch (commit " +
    "marker deleted, process restarted) is a spool NO-OP — the batch " +
    "lands as ONE deterministically-named file and the replay finds it " +
    "(r18 VERDICT #6 upgrade from at-least-once)") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-fanout-eo")
    val srcDir = dir.resolve("src")
    Files.createDirectories(srcDir)
    Seq((1L, "m1"), (2L, "m2")).toDF("event_id", "msg")
      .write.mode("append").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"p","source":"log","pipeline":[],
        |  "sink":{"kind":"memory"}},
        | {"name":"q","source":"log","pipeline":[],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)
    val fdir = dir.resolve("fanout")
    Files.createDirectories(fdir)
    val mkSources = Map("log" -> (() =>
      spark.readStream.schema(schema).parquet(srcDir.toString)))

    import scala.jdk.CollectionConverters._
    // run 1: tee consumes the file source, spools land b*.json
    val core1 = new Core(spark)
    val loader1 = new ConfigFile.Loader(core1, spark, cfg,
      sources0 = mkSources, fanoutDir = fdir)
    try {
      loader1.reload()
      core1.processAllAvailable()
      assert(loader1.memorySinks("p").rows.asScala.size == 2)
    } finally core1.stop()

    // crash simulation: the spool write happened but the tee died
    // before committing — delete the newest commit marker, restart
    val commits = fdir.resolve("log").resolve("_tee_ckpt").resolve("commits")
    val newest = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(newest)
    // the local checksum FS keeps a .N.crc sidecar; a real crash leaves
    // neither file
    Files.deleteIfExists(
      commits.resolve(s".${newest.getFileName.toString}.crc"))

    val core2 = new Core(spark)
    val loader2 = new ConfigFile.Loader(core2, spark, cfg,
      sources0 = mkSources, fanoutDir = fdir)
    try {
      loader2.reload() // same config -> same spool dirs; tee replays
      core2.processAllAvailable()
      // fresh subscribers re-read the WHOLE spool: a duplicated spool
      // file would read 4 rows; exactly-once reads 2
      for (n <- Seq("p", "q"))
        assert(loader2.memorySinks(n).rows.asScala
          .map(_.getAs[Long]("event_id")).toSeq.sorted == Seq(1L, 2L),
          s"subscriber $n saw a replayed duplicate")
      // and the spool holds exactly the deterministic per-batch files
      val spoolDirs = Files.list(fdir.resolve("log")).iterator().asScala
        .filter(_.getFileName.toString.startsWith("sub-")).toSeq
      assert(spoolDirs.nonEmpty)
      spoolDirs.foreach { d =>
        val data = Files.list(d).iterator().asScala
          .filter(p => !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith(".")).toSeq
        assert(data.size == 1 &&
          data.head.getFileName.toString.matches("b\\d+\\.json"),
          s"unexpected spool contents: ${data.map(_.getFileName)}")
      }
    } finally core2.stop()
  }

  test("JSON spool fidelity: micros timestamps, NaN metrics, nulls, " +
    "tags and attributes round-trip the tee hop exactly; a binary-" +
    "carrying schema keeps the parquet spool; oversized batches warn " +
    "(r19 VERDICT #2 + #8)") {
    // format selection is a pure function of the schema
    import org.apache.spark.sql.types._
    assert(ConfigFile.jsonSafeSchema(StructType(Seq(
      StructField("s", StringType), StructField("m", DoubleType),
      StructField("t", TimestampType),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(StringType, StringType))))))
    assert(!ConfigFile.jsonSafeSchema(StructType(Seq(
      StructField("payload", BinaryType)))))
    assert(!ConfigFile.jsonSafeSchema(StructType(Seq(
      StructField("m", MapType(IntegerType, StringType))))),
      "non-string map keys do not round-trip JSON")
    // the oversized-batch warning (r19 VERDICT #8)
    assert(ConfigFile.spoolSizeWarning(512L * 1024 * 1024).isEmpty)
    assert(ConfigFile.spoolSizeWarning(513L * 1024 * 1024)
      .exists(_.contains("durable bus")))

    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    // e2e: a WireEvent source (tags + attributes) through a
    // 2-subscriber tee — values must survive the JSON hop bit-exactly
    val dir = Files.createTempDirectory("graft-fanout-json")
    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"a","source":"in","pipeline":[],"sink":{"kind":"memory"}},
        | {"name":"b","source":"in","pipeline":[],"sink":{"kind":"memory"}}]}"""
        .stripMargin)
    val in = MemoryStream[graft.streaming.WireEvent]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("in" -> (() => in.toDF())))
    import scala.jdk.CollectionConverters._
    try {
      loader.reload()
      val tMicros = java.sql.Timestamp.valueOf("2024-01-29 08:38:55.123456")
      in.addData(
        graft.streaming.WireEvent("h1", "cpu", "ok", Some(0.25), tMicros,
          Some(60.0), Seq("prod", "edge"), Map("dc" -> "ams", "rack" -> "7")),
        graft.streaming.WireEvent("h2", "cpu", "ok", Some(Double.NaN),
          tMicros, None, Seq.empty, Map.empty),
        graft.streaming.WireEvent(null, "cpu", null, None, tMicros,
          None, null, null))
      core.processAllAvailable()
      for (n <- Seq("a", "b")) {
        val rows = loader.memorySinks(n).rows.asScala.toSeq
        assert(rows.size == 3, s"$n: ${rows.size} rows")
        val h1 = rows.find(_.getAs[String]("host") == "h1").get
        assert(h1.getAs[java.sql.Timestamp]("time") == tMicros,
          "micros timestamp must round-trip exactly")
        assert(h1.getAs[Double]("metric") == 0.25)
        assert(h1.getSeq[String](h1.fieldIndex("tags")).toList ==
          List("prod", "edge"))
        assert(h1.getAs[Map[String, String]]("attributes") ==
          Map("dc" -> "ams", "rack" -> "7"))
        val h2 = rows.find(_.getAs[String]("host") == "h2").get
        assert(h2.getAs[Double]("metric").isNaN)
        val hn = rows.find(_.getAs[String]("host") == null).get
        assert(hn.isNullAt(hn.fieldIndex("metric")) &&
          hn.getAs[String]("state") == null)
      }
      // and the spool files are JSON lines
      val subDirs = Files.list(loader.fanoutDir.resolve("in")).iterator()
        .asScala.filter(_.getFileName.toString.startsWith("sub-")).toSeq
      assert(subDirs.nonEmpty)
      subDirs.foreach { d =>
        val data = Files.list(d).iterator().asScala
          .filter(p => !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith(".")).toSeq
        assert(data.nonEmpty && data.forall(
          _.getFileName.toString.matches("b\\d+\\.json")),
          s"expected JSON spool files, got ${data.map(_.getFileName)}")
      }
    } finally core.stop()

    // e2e: binary payloads force the parquet spool and round-trip
    val dir2 = Files.createTempDirectory("graft-fanout-bin")
    val cfg2 = dir2.resolve("c.json")
    write(cfg2,
      """{"streams":[
        | {"name":"p","source":"blobs","pipeline":[],"sink":{"kind":"memory"}},
        | {"name":"q","source":"blobs","pipeline":[],"sink":{"kind":"memory"}}]}"""
        .stripMargin)
    val inB = MemoryStream[(Long, Array[Byte])]
    val core2 = new Core(spark)
    val loader2 = new ConfigFile.Loader(core2, spark, cfg2,
      sources0 = Map("blobs" ->
        (() => inB.toDF().toDF("media_id", "payload"))))
    try {
      loader2.reload()
      inB.addData((7L, Array[Byte](0, 1, 2, -1)))
      core2.processAllAvailable()
      for (n <- Seq("p", "q")) {
        val rows = loader2.memorySinks(n).rows.asScala.toSeq
        assert(rows.size == 1)
        assert(rows.head.getAs[Array[Byte]]("payload").toSeq ==
          Seq[Byte](0, 1, 2, -1))
      }
      val subDirs2 = Files.list(loader2.fanoutDir.resolve("blobs"))
        .iterator().asScala
        .filter(_.getFileName.toString.startsWith("sub-")).toSeq
      subDirs2.foreach { d =>
        val data = Files.list(d).iterator().asScala
          .filter(p => !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith(".")).toSeq
        assert(data.nonEmpty && data.forall(
          _.getFileName.toString.matches("b\\d+\\.parquet")),
          s"expected parquet spool files, got ${data.map(_.getFileName)}")
      }
    } finally core2.stop()
  }

  test("orphan spool hygiene: an edited subscriber's rotated-out spool " +
    "dir is deleted on reload; a source dropping to ZERO subscribers " +
    "loses its whole fanoutDir subtree, tee checkpoint included " +
    "(r18 ADVICE: SIGHUP churn must not grow fanoutDir unboundedly)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-fanout-orphan")
    val cfg = dir.resolve("c.json")
    def conf(factor: Double) =
      s"""{"streams":[
         | {"name":"a","source":"in","pipeline":[],
         |  "sink":{"kind":"memory"}},
         | {"name":"b","source":"in",
         |  "pipeline":[{"op":"scale","factor":$factor}],
         |  "sink":{"kind":"memory"}}]}""".stripMargin
    write(cfg, conf(2.0))
    val in = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("in" -> (() => in.toDF())))
    import scala.jdk.CollectionConverters._
    def subDirs(): Set[String] =
      Files.list(loader.fanoutDir.resolve("in")).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("sub-")).toSet
    try {
      loader.reload()
      val before = subDirs()
      assert(before.size == 2)
      in.addData(SEvent("h1", "s", "ok", Some(1.0),
        new Timestamp(1000), None))
      core.processAllAvailable()

      write(cfg, conf(10.0)) // b rotates to a fresh spool
      loader.reload()
      val after = subDirs()
      assert(after.size == 2, s"rotated-out spool not pruned: $after")
      assert((before -- after).size == 1 && (after -- before).size == 1)

      // drop BOTH subscribers: the source leaves the fanned set and its
      // whole subtree (spools + _tee_ckpt) goes away
      write(cfg, """{"streams":[]}""")
      loader.reload()
      assert(!Files.exists(loader.fanoutDir.resolve("in")),
        "unfanned source's fanout subtree must be deleted")
    } finally core.stop()
  }

  test("plan discipline x multi-source: a where-filter pushes down " +
    "through the unionByName into BOTH spool parquet scans (the union " +
    "never blocks scan-level pushdown)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-multisrc-plan")
    val cfg = dir.resolve("c.json")
    // xa/xb force both sources onto tees, so crit's two legs are both
    // file-source spool scans
    write(cfg,
      """{"streams":[
        | {"name":"crit","source":["a","b"],
        |  "pipeline":[{"op":"where","expr":"state = 'critical'"}],
        |  "sink":{"kind":"memory"}},
        | {"name":"xa","source":"a","pipeline":[],"sink":{"kind":"memory"}},
        | {"name":"xb","source":"b","pipeline":[],"sink":{"kind":"memory"}}
        |]}""".stripMargin)
    val inA = MemoryStream[SEvent]
    val inB = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("a" -> (() => inA.toDF()), "b" -> (() => inB.toDF())))
    try {
      loader.reload()
      assert(core.activeQueries.keySet ==
        Set("crit", "xa", "xb", "__fanout__a", "__fanout__b"))
      inA.addData(SEvent("h1", "s", "critical", Some(1.0),
        new Timestamp(1000), None))
      inB.addData(SEvent("h2", "s", "ok", Some(2.0),
        new Timestamp(2000), None))
      core.processAllAvailable()
      // explain() shows the LAST micro-batch's plan; on a loaded box the
      // two tees' spool files can land in different subscriber batches,
      // leaving only one leg's scan in that final plan (the other leg is
      // an empty LocalRelation for the batch). Re-feed both sources and
      // re-drain until some batch carries files from BOTH spools —
      // bounded, and a genuine pushdown regression fails every attempt.
      def pushedCount(): Int = {
        val out = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(out)) {
          core.activeQueries("crit").explain()
        }
        out.toString.sliding("EqualTo(state,critical)".length)
          .count(_ == "EqualTo(state,critical)")
      }
      var pushed = pushedCount()
      var attempt = 0
      var t = 3000L
      while (pushed < 2 && attempt < 10) {
        inA.addData(SEvent("h1", "s", "critical", Some(1.0),
          new Timestamp(t), None))
        inB.addData(SEvent("h2", "s", "ok", Some(2.0),
          new Timestamp(t + 1000), None))
        t += 2000
        core.processAllAvailable()
        pushed = pushedCount()
        attempt += 1
      }
      assert(pushed >= 2,
        s"filter not pushed into both union legs' scans ($pushed)")
      import scala.jdk.CollectionConverters._
      assert(loader.memorySinks("crit").rows.asScala
        .map(_.getAs[String]("host")).toSet == Set("h1"))
    } finally core.stop()
  }

  test("a source declared `replayable` skips the tee: each subscriber " +
    "consumes the source independently (the kafka shape — at scale the " +
    "durable bus IS the fan-out)") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-fanout-replay")
    val srcDir = dir.resolve("src")
    Files.createDirectories(srcDir)
    // a parquet file-stream source IS replayable: every query tracks
    // its own seen-files set
    Seq((1L, "m1"), (2L, "m2")).toDF("event_id", "msg")
      .write.mode("append").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema

    val cfg = dir.resolve("c.json")
    write(cfg,
      """{"streams":[
        | {"name":"p","source":"log","pipeline":[],
        |  "sink":{"kind":"memory"}},
        | {"name":"q","source":"log","pipeline":[],
        |  "sink":{"kind":"memory"}}]}""".stripMargin)
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("log" -> (() =>
        spark.readStream.schema(schema).parquet(srcDir.toString))),
      replayable = Set("log"))
    try {
      assert(loader.reload().toSet == Set("p", "q"))
      assert(core.activeQueries.keySet == Set("p", "q")) // NO tee
      core.processAllAvailable()
      import scala.jdk.CollectionConverters._
      for (n <- Seq("p", "q"))
        assert(loader.memorySinks(n).rows.asScala
          .map(_.getAs[Long]("event_id")).toSet == Set(1L, 2L), n)
    } finally core.stop()
  }
}
