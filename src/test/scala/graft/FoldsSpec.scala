package graft

import org.apache.spark.sql.functions._
import graft.functions.Folds
import graft.operators.Windows

/** Port of the reference fold edge-case tables
  * (test/riemann/folds_test.clj:12-60 sorted-sample nearest-rank,
  * plus sum/mean/difference/std-dev/mode semantics from
  * src/riemann/folds.clj). */
class FoldsSpec extends SparkSpec {

  private def metrics(ms: Option[Double]*) = events(ms.zipWithIndex.map {
    case (m, i) => E(id = i + 1, metric = m.map(Double.box).orNull, time = i.toLong)
  }: _*)

  test("median is nearest-rank, never interpolated (folds.clj:186-189)") {
    // even count: reference takes sorted index floor(0.5*4) = element 3,
    // while an interpolated percentile would answer 2.5
    val df = metrics(Seq(1.0, 2.0, 3.0, 4.0).map(Some(_)): _*)
    assert(df.agg(Folds.medianFold(col("metric"))).collect().head.getDouble(0)
      == 3.0)
    assert(df.agg(Folds.medianExact(col("metric"))).collect().head.getDouble(0)
      == 2.5)
  }

  test("nearest-rank percentile table (folds_test.clj:12-29)") {
    // (sorted-sample-extract es [0 0.5 1]) cases
    val cases = Seq(
      (Seq(1.0), Seq(1.0, 1.0, 1.0)),
      (Seq(2.0, 1.0), Seq(1.0, 2.0, 2.0)),
      (Seq(3.0, 1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      (Seq(6.0, 1.0, 2.0, 1.0, 1.0), Seq(1.0, 1.0, 6.0)))
    for ((input, expected) <- cases) {
      val df = metrics(input.map(Some(_)): _*)
      val got = Seq(0.0, 0.5, 1.0).map { p =>
        df.agg(Folds.nearestRank(col("metric"), p)).collect().head.getDouble(0)
      }
      assert(got == expected, s"for input $input")
    }
  }

  test("nil metrics skipped (folds.clj:1-14 friendly folds)") {
    val df = metrics(Some(1.0), None, Some(3.0))
    assert(df.agg(Folds.sumExact(col("metric"))).collect().head.getDouble(0) == 4.0)
    assert(df.agg(Folds.meanExact(col("metric"))).collect().head.getDouble(0) == 2.0)
    assert(df.agg(Folds.countNonNil(col("metric"))).collect().head.getLong(0) == 2L)
  }

  test("difference = first - sum(rest) in time order (folds.clj:115-126)") {
    // [10, 1, 2] in time order -> 10 - 1 - 2 = 7 = 2*first - sum
    val df = metrics(Some(10.0), Some(1.0), Some(2.0))
    val got = df.agg(Folds.differenceExact(col("metric"), col("time_s")))
      .collect().head.getDouble(0)
    assert(got == 7.0)
  }

  test("std-dev population (folds.clj:212-221 divides by n)") {
    val df = metrics(Some(2.0), Some(4.0), Some(4.0), Some(4.0), Some(5.0),
      Some(5.0), Some(7.0), Some(9.0))
    val got = df.agg(Folds.stddevPopExact(col("metric"))).collect().head.getDouble(0)
    assert(math.abs(got - 2.0) < 1e-12)  // classic population-sd example
  }

  test("event-carrying extremum (folds.clj:191-210)") {
    val df = events(E(id = 1, host = "a", metric = 5.0),
      E(id = 2, host = "b", metric = 1.0), E(id = 3, host = "c", metric = 9.0))
    val maxHost = df.agg(Folds.maximumEvent(col("host"), col("metric")))
      .collect().head.getString(0)
    val minHost = df.agg(Folds.minimumEvent(col("host"), col("metric")))
      .collect().head.getString(0)
    assert(maxHost == "c" && minHost == "b")
  }

  test("mode: most frequent, ties -> smallest (folds.clj:166-184)") {
    val df = metrics(Seq(1.0, 2.0, 2.0, 3.0, 3.0, 4.0).map(Some(_)): _*)
    val row = Folds.modeDeterministic(df, "metric", Nil).collect().head
    assert(row.getDouble(0) == 2.0 && row.getLong(1) == 2L)
  }

  test("product via log-space for positive metrics (folds.clj:103-113)") {
    val df = metrics(Some(2.0), Some(3.0), Some(4.0))
    val got = df.agg(Folds.productLog(col("metric"))).collect().head.getDouble(0)
    assert(math.abs(got - 24.0) < 1e-9)
  }

  test("ewma-timeless zero-init closed form (streams.clj:961-977)") {
    // r=0.5, metrics [1,1,1] in time order: 0.5 + 0.25 + 0.125 = 0.875
    val df = metrics(Some(1.0), Some(1.0), Some(1.0))
    val got = Windows.ewmaTimeless(df, 0.5, Nil)
    assert(got.collect().head.getDouble(0) == 0.875)
    // single event: r * x, NOT x (the round-1 bug)
    val single = Windows.ewmaTimeless(metrics(Some(8.0)), 0.5, Nil)
    assert(single.collect().head.getDouble(0) == 4.0)
  }

  test("ewma-timeless golden table (streams_test.clj ewma-timeless-test)") {
    // r=0: everything decays to 0
    assert(Windows.ewmaTimeless(metrics(Seq(1.0, 10.0, 20.0, -100.0, 4.0)
      .map(Some(_)): _*), 0.0, Nil).collect().head.getDouble(0) == 0.0)
    // r=1: the latest value passes through
    assert(Windows.ewmaTimeless(metrics(Seq(5.0, 13.0, 1.0, -10.0, 3.0)
      .map(Some(_)): _*), 1.0, Nil).collect().head.getDouble(0) == 3.0)
    // r=1/2 over five 1s: 31/32 (the reference's running sequence tail;
    // the operator rounds to 4 decimals for oracle parity)
    assert(Windows.ewmaTimeless(metrics(Seq.fill(5)(Some(1.0)): _*), 0.5, Nil)
      .collect().head.getDouble(0) == 0.9688)
  }

  test("ewma halflife converges to the steady metric (streams_test.clj ewma-test)") {
    // 50 events of metric 1, 1s apart, halflife 1 -> ewma ~= 1
    val df = events((1 to 50).map(i =>
      E(id = i, metric = 1.0, time = i.toLong)): _*)
    val got = Windows.ewma(df, 1.0, Nil).collect().head.getDouble(0)
    assert(math.abs(got - 1.0) < 0.01, s"ewma=$got")
  }

  test("counter passes metric-less events with running total intact (streams_test.clj counter-test)") {
    val df = events(
      E(id = 1, metric = 2.0, time = 1L), E(id = 2, metric = null, time = 2L),
      E(id = 3, metric = 3.0, time = 3L))
    val sums = Windows.counter(df, Nil).orderBy("event_id")
      .select("running_sum").collect().map(_.getDouble(0)).toSeq
    assert(sums == Seq(2.0, 2.0, 5.0)) // nil contributes nothing
  }

  test("fixed-event-window completeOnly drops the partial tail (streams_test.clj fixed-event-window-test)") {
    val df = metrics(Seq.fill(5)(Some(1.0)): _*)
    val full = Windows.fixedEventWindow(df, 2, Nil, completeOnly = true)
      .orderBy("batch_id").select("n_events").collect().map(_.getLong(0)).toSeq
    assert(full == Seq(2L, 2L)) // [1 2] [3 4]; 5 buffered
  }

  test("ewma halflife: single event weights (1-r)*x (streams.clj:979-1013)") {
    val r = math.pow(2.0, -1.0 / 10.0)
    val got = Windows.ewma(metrics(Some(100.0)), 10.0, Nil)
      .collect().head.getDouble(0)
    assert(math.abs(got - (1 - r) * 100.0) < 1e-4)
    // two events dt apart: m = (1-r)*x2 + (1-r)*x1*r^dt
    val df = events(E(id = 1, metric = 100.0, time = 0L),
      E(id = 2, metric = 50.0, time = 10L))
    val got2 = Windows.ewma(df, 10.0, Nil).collect().head.getDouble(0)
    val want2 = (1 - r) * 50.0 + (1 - r) * 100.0 * math.pow(r, 10)
    assert(math.abs(got2 - want2) < 1e-4)
  }
}
