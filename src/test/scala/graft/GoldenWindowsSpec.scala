package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.functions.Folds

/** Second batch of golden cases ported from the reference stream tests
  * (test/riemann/streams_test.clj) — ddt value tables, gap filling,
  * carry-forward, per-key isolation, fold-interval-metric. */
class GoldenWindowsSpec extends SparkSpec {

  test("ddt golden table (streams_test.clj ddt-immediate-test)") {
    // [{0@0} {0@1} {2@2} {-4@4}] -> [0@1, 2@2, -3@4]
    val df = events(
      E(id = 1, metric = 0.0, time = 0L), E(id = 2, metric = 0.0, time = 1L),
      E(id = 3, metric = 2.0, time = 2L), E(id = 4, metric = -4.0, time = 4L))
    val out = Windows.ddt(df, Seq("host")).orderBy("event_id")
      .select("event_id", "ddt").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(out == Seq(2L -> 0.0, 3L -> 2.0, 4L -> -3.0))
  }

  test("ddt emits nothing for a single event or missing metrics") {
    val single = events(E(id = 1, metric = 1.0, time = 0L))
    assert(Windows.ddt(single, Seq("host")).count() == 0)
    val noMetrics = events(E(id = 1, time = 0L), E(id = 2, time = 1L))
    assert(Windows.ddt(noMetrics, Seq("host"))
      .filter(col("ddt").isNotNull).count() == 0)
  }

  test("fill-in synthesizes empty intervals with the filler metric (fill-in-test)") {
    // events at t=0 and t=30 with 10s intervals: buckets 10 and 20 are
    // synthesized with metric 0 and n_events 0
    val df = events(
      E(id = 1, metric = 5.0, time = 0L), E(id = 2, metric = 7.0, time = 30L))
    val out = Windows.fillIn(df, 10, Seq("host"), 0.0).orderBy("window_start")
      .select("window_start", "n_events", "sum_metric").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((0L, 1L, 5.0), (10L, 0L, 0.0), (20L, 0L, 0.0),
      (30L, 1L, 7.0)))
  }

  test("fill-in-last carries the previous observed value (fill-in-last-test)") {
    val df = events(
      E(id = 1, metric = 5.0, time = 0L), E(id = 2, metric = 7.0, time = 30L))
    val out = Windows.fillInLast(df, 10, Seq("host")).orderBy("window_start")
      .select("window_start", "sum_metric").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // gaps repeat 5.0 (the last observed interval sum), not 0
    assert(out == Seq((0L, 5.0), (10L, 5.0), (20L, 5.0), (30L, 7.0)))
  }

  test("changed-state isolates keys (streams_test.clj changed-state-test)") {
    // host h1: ok ok crit -> transitions at first event and crit
    // host h2: crit       -> its own first event, independent of h1
    val df = events(
      E(id = 1, host = "h1", state = "ok", time = 0L),
      E(id = 2, host = "h1", state = "ok", time = 1L),
      E(id = 3, host = "h2", state = "critical", time = 1L),
      E(id = 4, host = "h1", state = "critical", time = 2L))
    assert(ids(Windows.changed(df, "state", Seq("host"))) == Seq(1L, 3L, 4L))
    // :init "ok" suppresses the first event when it matches init
    assert(ids(Windows.changed(df, "state", Seq("host"), Some("ok")))
      == Seq(3L, 4L))
  }

  test("by-key isolation: fixed windows never mix keys (by-single/by-multiple)") {
    val df = events(
      E(id = 1, host = "a", metric = 1.0, time = 0L),
      E(id = 2, host = "b", metric = 10.0, time = 0L),
      E(id = 3, host = "a", metric = 2.0, time = 1L),
      E(id = 4, host = "b", metric = 20.0, time = 1L))
    val out = Windows.fixedEventWindow(df, 2, Seq("host"))
      .select("host", "sum_metric").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 3.0, "b" -> 30.0))
  }

  test("fold-interval-metric applies any fold per interval (fold-interval-metric-test)") {
    val df = events(
      E(id = 1, metric = 1.0, time = 0L), E(id = 2, metric = 3.0, time = 5L),
      E(id = 3, metric = 5.0, time = 10L))
    val out = Windows.foldInterval(df, 10, Seq("host"),
      "mean_m" -> Folds.meanExact(col("metric")),
      "max_m" -> max(col("metric")))
      .orderBy("window_start")
      .select("window_start", "mean_m", "max_m").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(out == Seq((0L, 2.0, 3.0), (10L, 5.0, 5.0)))
  }

  test("apdex: satisfied wins over an overlapping tolerated predicate (streams.clj:2126-2129)") {
    // both predicates match the event; the reference cond counts it
    // once as satisfied -> apdex 1.0, never (1 + 0.5)/1 = 1.5
    val df = events(E(id = 1, metric = 50.0, time = 0L, state = "ok"))
    val out = Windows.apdex(df, 3600, col("metric") <= 100,
      col("metric") <= 150, Seq("host"))
    assert(one[Double](out, "apdex") == 1.0)
    // expired events are ignored entirely (no window emitted)
    val exp = events(E(id = 1, metric = 50.0, time = 0L, state = "expired"))
    assert(Windows.apdex(exp, 3600, col("metric") <= 100,
      col("metric") <= 150, Seq("host")).count() == 0)
  }

  test("batch splits a bucket into size-bounded flushes (batch-test)") {
    val df = events(
      E(id = 1, metric = 1.0, time = 0L), E(id = 2, metric = 1.0, time = 1L),
      E(id = 3, metric = 1.0, time = 2L), E(id = 4, metric = 1.0, time = 3L),
      E(id = 5, metric = 1.0, time = 12L))
    val out = Windows.batchNDt(df, 3, 10, Seq("host"))
      .orderBy("window_start", "batch_seq")
      .select("window_start", "batch_seq", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // bucket 0: 4 events -> batches of 3 and 1; bucket 10: 1 event
    assert(out == Seq((0L, 0L, 3L), (0L, 1L, 1L), (10L, 0L, 1L)))
  }

  test("stable golden tables: dt gate, spike and flap elision (stable-test)") {
    def run(dt: Long, es: Seq[(Long, String, Long)]): Seq[Long] =
      ids(Windows.stable(
        events(es.map { case (i, x, t) => E(id = i, state = x, time = t) }: _*),
        dt, "state", Seq("host")).select("event_id"))
    // doesn't emit until dt seconds have passed
    assert(run(3, Seq((1L, "1", 0L), (2L, "1", 1L), (3L, "1", 2L))) == Seq())
    // constant values emit once the span reaches dt
    assert(run(3, Seq((1L, "1", 0L), (2L, "1", 1L), (3L, "1", 3L))) ==
      Seq(1L, 2L, 3L))
    // spikes elided
    assert(run(3, Seq((1L, "0", 0L), (2L, "0", 3L), (3L, "1", 4L),
      (4L, "1", 5L), (5L, "0", 6L), (6L, "0", 9L))) == Seq(1L, 2L, 5L, 6L))
    // flapping elided
    assert(run(3, Seq((1L, "0", 0L), (2L, "0", 10L), (3L, "1", 11L),
      (4L, "0", 11L), (5L, "1", 12L), (6L, "5", 13L), (7L, "2", 14L),
      (8L, "2", 17L))) == Seq(1L, 2L, 7L, 8L))
  }

  test("rollup passes n and buffers overflow metrics in order (rollup-test)") {
    val df = events(
      E(id = 1, metric = 1.0, time = 0L), E(id = 2, metric = 2.0, time = 1L),
      E(id = 3, metric = 3.0, time = 2L), E(id = 4, metric = 4.0, time = 3L))
    val out = Windows.rollup(df, 2, 10, Seq("host")).collect().head
    assert(out.getAs[Long]("passed") == 2L)
    assert(out.getAs[Long]("rolled") == 2L)
    assert(out.getSeq[Double](out.fieldIndex("rolled_metrics")) == Seq(3.0, 4.0))
  }
}
