package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal
import graft.streaming.StreamingAsOf

/** The stateless stream-static as-of face must agree with the batch
  * asOfJoin wherever the validity horizon covers the lag — including
  * at the exact tolerance boundary — and keep unmatched events
  * flowing with null payload. */
class StreamingAsOfSpec extends SparkSpec {

  private def refRows = Seq(
    ("a", 10L, 900L, 1.0), ("a", 50L, 901L, 2.0), ("a", 300L, 902L, 3.0),
    ("b", 20L, 903L, 4.0))

  private def ref = {
    val spark0 = spark
    import spark0.implicits._
    refRows.toDF("host", "time_s", "event_id", "metric")
  }

  test("batch parity: interval enrichment == asOfJoin with the same " +
    "inclusive tolerance, boundary event included, gaps null") {
    val spark0 = spark
    import spark0.implicits._
    // events probing: before any record, between records, exactly at
    // the tolerance edge (10 + 100 = 110), just past it, in the gap
    // where the next record is farther than the horizon
    val events = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 49L), (4L, "a", 110L),
      (5L, "a", 151L), (6L, "a", 299L), (7L, "b", 500L), (8L, "c", 30L))
      .toDF("event_id", "host", "time_s")
    val iv = StreamingAsOf.validityIntervals(ref, Seq("host"), "time_s",
      Seq("event_id", "metric"), maxValiditySeconds = 100)
    val got = StreamingAsOf.enrich(events, iv, Seq("host"), "time_s",
        binSeconds = 50)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getAs[Any]("asof_time_s"),
        r.getAs[Any]("asof_event_id"), r.getAs[Any]("asof_metric")))
    val want = Temporal.asOfJoin(events, ref, Seq("host"), "time_s",
        Seq("event_id", "metric"), toleranceSeconds = 100)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getAs[Any]("asof_time_s"),
        r.getAs[Any]("asof_event_id"), r.getAs[Any]("asof_metric")))
    assert(got.toSeq == want.toSeq)
    // and the fixture actually exercises the interesting rows:
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == null)       // before any record
    assert(byId(2L)._3 == 900L)       // tie at the record's own time
    assert(byId(4L)._3 == 901L)       // exactly start + tolerance
    assert(byId(5L)._2 == null)       // past tolerance, next far away
    assert(byId(8L)._2 == null)       // unknown key survives
  }

  test("intervalsOf: arbitrary static intervals (maintenance windows) " +
    "enrich the stream — overlaps multiply, boundaries half-open, " +
    "degenerate intervals drop, unknown keys survive") {
    val spark0 = spark
    import spark0.implicits._
    val windows = Seq(
      ("a", 0L, 100L, "deploy"), ("a", 50L, 150L, "freeze"), // overlap
      ("a", 200L, 200L, "empty"),                            // degenerate
      ("b", 10L, 20L, "patch"))
      .toDF("host", "start_s", "end_s", "reason")
    val events = Seq((1L, "a", 60L), (2L, "a", 120L), (3L, "a", 180L),
      (4L, "a", 200L), (5L, "b", 10L), (6L, "b", 20L), (7L, "c", 60L))
      .toDF("event_id", "host", "time_s")
    val iv = StreamingAsOf.intervalsOf(windows, Seq("host"),
      "start_s", "end_s", Seq("reason"))
    val got = StreamingAsOf.enrich(events, iv, Seq("host"), "time_s",
        binSeconds = 60)
      .collect().map(r => (r.getLong(0), r.getAs[Any]("asof_reason")))
      .toSet
    assert(got == Set((1L, "deploy"), (1L, "freeze"), // two covering windows
      (2L, "freeze"), (3L, null), (4L, null),         // gap; empty dropped
      (5L, "patch"), (6L, null),                      // end is exclusive
      (7L, null)))                                    // unknown key flows
  }

  test("streaming: each micro-batch enriches statelessly; unmatched " +
    "events keep flowing with null payload") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val iv = StreamingAsOf.validityIntervals(ref, Seq("host"), "time_s",
      Seq("event_id", "metric"), maxValiditySeconds = 100)
    val input = MemoryStream[(Long, String, Long)]
    val name = s"sasof_${System.nanoTime()}"
    val q = StreamingAsOf.enrich(
        input.toDF().toDF("event_id", "host", "time_s"), iv,
        Seq("host"), "time_s", binSeconds = 50)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      input.addData((1L, "a", 60L), (2L, "c", 60L))
      q.processAllAvailable()
      input.addData((3L, "b", 30L))
      q.processAllAvailable()
      val got = spark.table(name).orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getAs[Any]("asof_event_id")))
      assert(got.toSeq == Seq((1L, 901L), (2L, null), (3L, 903L)))
    } finally q.stop()
  }
}
