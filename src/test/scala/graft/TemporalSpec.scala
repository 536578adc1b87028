package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Behavioral tests for the temporal join family — the semantics the
  * oracle rows (q_asof_join / q_range_join / q_sessionize) pin by
  * value but not by contract: tie handling at equal timestamps,
  * tolerance nulling, bin-spanning intervals, the touching-gap merge
  * rule, and batch/stream sessionization parity. */
class TemporalSpec extends SparkSpec {

  private def left(rows: (Long, String, Long)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("event_id", "host", "time_s")
  }

  private def right(rows: (String, Long, Long, Double)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("host", "time_s", "event_id", "metric")
  }

  test("asOfJoin: latest at-or-before wins, same-timestamp right row " +
    "matches, no-prior and out-of-tolerance rows keep null payload") {
    val l = left((1L, "a", 100L), (2L, "a", 50L), (3L, "a", 10L),
      (4L, "b", 100L))
    val r = right(("a", 20L, 900L, 1.0), ("a", 50L, 901L, 2.0),
      ("a", 99L, 902L, 3.0), ("b", 5L, 903L, 4.0))
    val got = Temporal.asOfJoin(l, r, Seq("host"), "time_s",
        Seq("event_id", "metric"), toleranceSeconds = 60)
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), x.getAs[Any]("asof_time_s"),
        x.getAs[Any]("asof_event_id"), x.getAs[Any]("asof_metric")))
    assert(got.toSeq == Seq(
      (1L, 99L, 902L, 3.0),   // latest before 100
      (2L, 50L, 901L, 2.0),   // tie at 50: at-or-before includes it
      (3L, null, null, null), // nothing at or before 10
      (4L, null, null, null)  // match at 5 is outside tolerance 60
    ))
  }

  test("asOfJoin: concurrent right rows at one timestamp reduce to the " +
    "lexicographically largest payload — deterministic, not plan-luck") {
    val l = left((1L, "a", 100L))
    val r = right(("a", 80L, 910L, 5.0), ("a", 80L, 912L, 1.0),
      ("a", 80L, 911L, 9.0))
    val got = Temporal.asOfJoin(l, r, Seq("host"), "time_s",
      Seq("event_id", "metric")).collect().head
    assert(got.getAs[Long]("asof_event_id") == 912L &&
      got.getAs[Double]("asof_metric") == 1.0)
  }

  test("asOfJoin: bucketed form ≡ single-window form on randomized " +
    "corpora (boundary times, duplicate stamps, sparse keys, " +
    "varied bucket/tolerance)") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 4) {
      val nKeys = 1 + rnd.nextInt(6)
      val span = 1000L * (1 + rnd.nextInt(20))
      def t() = rnd.nextInt(4) match {
        case 0 => (rnd.nextInt(21).toLong) * span / 20 // bucket edges
        case _ => rnd.nextLong(span + 1)
      }
      val l = (0 until 400).map(i =>
        (i.toLong, s"k${rnd.nextInt(nKeys)}", t()))
        .toDF("event_id", "host", "time_s")
      val r = (0 until 300).map(i =>
        (s"k${rnd.nextInt(nKeys)}", t(), 1000L + i,
          rnd.nextInt(50) / 10.0))
        .toDF("host", "time_s", "rid", "rmetric")
      val tol = Seq(Long.MaxValue, span / 3 + 1, 1L)(rnd.nextInt(3))
      val bucket = Seq(1L, 97L, span / 7 + 1, span * 2)(rnd.nextInt(4))
      def rows(b: Long) = Temporal.asOfJoin(l, r, Seq("host"),
        "time_s", Seq("rid", "rmetric"), toleranceSeconds = tol,
        bucketSeconds = b).collect().map(_.toSeq).toSet
      assert(rows(bucket) == rows(0),
        s"trial $trial: bucket=$bucket tol=$tol span=$span diverged")
    }
  }

  test("sessionizeBucketed ≡ native session_window on randomized " +
    "corpora (chunk-straddling sessions, touching gaps, dup stamps)") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(83)
    for (trial <- 0 until 4) {
      val nKeys = 1 + rnd.nextInt(5)
      val gap = 1L + rnd.nextInt(40)
      val chunk = Seq(gap, gap * 3, 1000L)(rnd.nextInt(3))
      // generate in MILLISECONDS so sub-second spacings exercise the
      // microsecond gap compare: gap*1000+100 ms (10.1s vs gap 10s)
      // MUST split in both forms, gap*1000-100 must merge
      val gapMs = gap * 1000L
      // half the trials start PRE-EPOCH so the stream crosses zero:
      // unix_seconds floors negative timestamps while `div` truncates
      // toward zero, so this pins the bucketed form's floor-division
      // (ADVICE r16 — sub-second negative session bounds diverged)
      var tcur = if (trial % 2 == 0) -600L * 1000L - 500L else 0L
      val rows = (0 until 500).map { _ =>
        // mix touching-gap steps (exactly `gap`: MUST merge), sub-gap
        // steps, dup stamps, sub-second over/under-gap steps, and
        // super-gap jumps (new session)
        tcur += Seq(0L, gapMs, gapMs - 100, gapMs + 100, gapMs - 1000,
          gapMs + 1000, rnd.nextInt(200000).toLong)(rnd.nextInt(7))
        (s"k${rnd.nextInt(nKeys)}", tcur)
      }
      val df = rows.toDF("host", "t")
        .withColumn("time", timestamp_millis(col("t"))).drop("t")
      val plain = Temporal.sessionize(df, Seq("host"), "time",
        s"$gap seconds").collect().map(_.toSeq).toSet
      val chunked = Temporal.sessionizeBucketed(df, Seq("host"), "time",
        gapSeconds = gap, chunkSeconds = chunk).collect()
        .map(_.toSeq).toSet
      assert(chunked == plain,
        s"trial $trial: gap=$gap chunk=$chunk diverged")
    }
  }

  test("rangeJoin: equals the brute-force containment join, intervals " +
    "spanning many bins still match, empty intervals drop") {
    val spark0 = spark
    import spark0.implicits._
    val events = left((1L, "a", 5L), (2L, "a", 100L), (3L, "a", 999L),
      (4L, "b", 100L))
    val ivals = Seq(
      ("i1", "a", 0L, 10L),     // within one bin
      ("i2", "a", 50L, 1000L),  // spans many 100s bins
      ("i3", "a", 7L, 7L),      // empty: dropped
      ("i4", "b", 90L, 101L))
      .toDF("interval_id", "host", "start_s", "end_s")
    val got = Temporal.rangeJoin(events, ivals, Seq("host"), "time_s",
        "start_s", "end_s", binSeconds = 100)
      .select("event_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // brute force: t in [start, end)
    assert(got == Set((1L, "i1"), (2L, "i2"), (3L, "i2"), (4L, "i4")))
  }

  test("sessionize: touching gap (exactly `gap` apart) MERGES — the " +
    "session_window contract the oracle mirrors — and gap+1 splits") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("a", 0L), ("a", 10L), ("a", 20L), ("a", 31L))
      .toDF("host", "t")
      .withColumn("time", timestamp_seconds(col("t")))
    val got = Temporal.sessionize(df, Seq("host"), "time", "10 seconds")
      .orderBy("session_start_s").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 0,10,20 chain through touching windows; 31 is 11 > 10 after 20
    assert(got.toSeq == Seq((0L, 30L, 3L), (31L, 41L, 1L)))
  }

  test("sessionize: streaming sessions on the closed watermark equal " +
    "the batch rollup") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val rows = (1 to 60).map(i => (s"h${i % 5}", ts(i * 7 % 53)))
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val name = s"sess_${System.nanoTime()}"
    val q = Temporal.sessionize(
        input.toDF().toDF("host", "time").withWatermark("time", "0 seconds"),
        Seq("host"), "time", "5 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(("h_late", ts(10000)))
      q.processAllAvailable()
      val got = spark.table(name)
        .filter(col("host") =!= "h_late")
        .orderBy("host", "session_start_s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      val batch = Temporal.sessionize(rows.toDF("host", "time"),
          Seq("host"), "time", "5 seconds")
        .orderBy("host", "session_start_s").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got == batch && batch.nonEmpty)
    } finally q.stop()
  }
}
