package graft

import org.apache.spark.sql.functions._
import graft.operators.{Combine, Windows}

/** Third batch of golden cases ported from the reference stream tests
  * (test/riemann/streams_test.clj) — window content tables
  * (moving/fixed event + time windows), runs, predict-linear value
  * tables, project slot semantics, coalesce replacement, and the rate
  * interval math. Each test states the reference deftest it mirrors and
  * the batch reading where the streaming form differs. */
class GoldenStreamsSpec extends SparkSpec {

  test("moving-event-window sums the last n metrics (moving-event-window-test)") {
    // (moving-event-window 2) over metrics [1 2 3] -> windows [1] [1 2] [2 3]
    val df = events(
      E(id = 1, metric = 1.0, time = 0L), E(id = 2, metric = 2.0, time = 1L),
      E(id = 3, metric = 3.0, time = 2L))
    val out = Windows.movingEventWindow(df, 2, Seq("host"))
      .orderBy("event_id").select("moving_sum", "moving_n").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((1.0, 1L), (3.0, 2L), (5.0, 2L)))
  }

  test("sum-over-time / mean-over-time running aggregates (streams.clj:934-963)") {
    // metrics [1 2 nil 3] -> running sums [1 3 6], means [1 1.5 2]
    // (nil metric is skipped by the reference's when-let gate)
    val df = events(
      E(id = 1, metric = 1.0, time = 0L), E(id = 2, metric = 2.0, time = 1L),
      E(id = 3, metric = Double.NaN, time = 2L),
      E(id = 4, metric = 3.0, time = 3L))
      .withColumn("metric", when(isnan(col("metric")), lit(null))
        .otherwise(col("metric")))
    val sums = Windows.sumOverTime(df, Seq("host")).orderBy("event_id")
      .select("running_sum").collect().map(_.getDouble(0)).toSeq
    assert(sums == Seq(1.0, 3.0, 6.0))
    val means = Windows.meanOverTime(df, Seq("host")).orderBy("event_id")
      .select("running_mean").collect().map(_.getDouble(0)).toSeq
    assert(means == Seq(1.0, 1.5, 2.0))
  }

  test("bit-bucket discards everything and folds to an empty plan (streams.clj:123-125)") {
    import graft.operators.Streams.EventOps
    val df = events(E(id = 1, metric = 1.0, time = 0L))
    val bucket = df.bitBucket
    assert(bucket.count() == 0)
    assert(bucket.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("fixed-event-window emits only full windows (fixed-event-window-test)") {
    // (fixed-event-window 2) over [1 2 3 4 5] -> [[1 2] [3 4]]; 5 buffered
    val df = events((1 to 5).map(i =>
      E(id = i, metric = i.toDouble, time = i.toLong)): _*)
    val out = Windows.fixedEventWindow(df, 2, Seq("host"), completeOnly = true)
      .orderBy("batch_id").select("sum_metric").collect()
      .map(_.getDouble(0)).toSeq
    assert(out == Seq(3.0, 7.0))
    // single event: no full window
    val single = events(E(id = 1, metric = 1.0, time = 0L))
    assert(Windows.fixedEventWindow(single, 2, Seq("host"),
      completeOnly = true).count() == 0)
  }

  test("fixed-time-window anchors at the first event (fixed-time-window-test)") {
    // (fixed-time-window 2) over times 1..5 -> [{1 2} {3 4}] + partial {5}
    val df = events((1 to 5).map(i =>
      E(id = i, metric = 1.0, time = i.toLong)): _*)
    val out = Windows.fixedTimeWindow(df, 2, Seq("host"))
      .orderBy("window_id").select("window_id", "n_events").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(out == Seq(0L -> 2L, 1L -> 2L, 2L -> 1L))
  }

  test("fixed-offset-time-window epoch-aligns buckets (fixed-offset-time-window-test)") {
    // (fixed-offset-time-window 2) over times 1..6 -> [1] [2 3] [4 5] (+[6])
    val df = events((1 to 6).map(i =>
      E(id = i, metric = 1.0, time = i.toLong)): _*)
    val out = Windows.fixedOffsetTimeWindow(df, 2, Seq("host"))
      .orderBy("window_start").select("window_start", "n_events").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(out == Seq(0L -> 1L, 2L -> 2L, 4L -> 2L, 6L -> 1L))
  }

  test("runs golden table: only the tail of an n-run passes (runs-test)") {
    // states [1 1 2 2 3 4 4 4], n=3 -> only the third consecutive 4
    val states = Seq("1", "1", "2", "2", "3", "4", "4", "4")
    val df = events(states.zipWithIndex.map { case (st, i) =>
      E(id = i + 1, state = st, time = i.toLong)
    }: _*)
    assert(ids(Windows.runs(df, 3, "state", Seq("host"))) == Seq(8L))
    // shorter runs emit nothing
    val short = events(E(id = 1, state = "1", time = 0L),
      E(id = 2, state = "2", time = 1L), E(id = 3, state = "2", time = 2L))
    assert(Windows.runs(short, 3, "state", Seq("host")).count() == 0)
    // zero-width runs emit nothing
    assert(Windows.runs(df, 0, "state", Seq("host")).count() == 0)
  }

  test("predict-linear value tables (predict-linear-test)") {
    // metrics 1..5 at times 1..5, predict 60s ahead -> 65
    val ramp = events((1 to 5).map(i =>
      E(id = i, metric = i.toDouble, time = i.toLong)): _*)
    assert(one[Double](Windows.predictLinear(ramp, 60, Seq("host")),
      "predicted") == 65.0)
    // [{100@0} {50@43200}] predict 86400s ahead -> -50
    val fall = events(E(id = 1, metric = 100.0, time = 0L),
      E(id = 2, metric = 50.0, time = 43200L))
    assert(one[Double](Windows.predictLinear(fall, 86400, Seq("host")),
      "predicted") == -50.0)
    // constant series predicts the constant
    val flat = events(E(id = 1, metric = 100.0, time = 0L),
      E(id = 2, metric = 100.0, time = 1L))
    assert(one[Double](Windows.predictLinear(flat, 60, Seq("host")),
      "predicted") == 100.0)
  }

  test("project keeps the latest event per matching predicate (project-test)") {
    // [cat, foo@1, foo@2, meow, bar@3, foo@4] with [service=foo service=bar]
    // -> final state: slot0 = foo@4, slot1 = bar@3; cat/meow ignored
    val df = events(
      E(id = 1, service = "cat", metric = 9.0, time = 0L),
      E(id = 2, service = "foo", metric = 1.0, time = 1L),
      E(id = 3, service = "foo", metric = 2.0, time = 2L),
      E(id = 4, service = "meow", metric = 9.0, time = 3L),
      E(id = 5, service = "bar", metric = 3.0, time = 4L),
      E(id = 6, service = "foo", metric = 4.0, time = 5L))
    val out = Combine.projectLatest(df,
      Seq(col("service") === "foo", col("service") === "bar")).collect().head
    assert(out.getStruct(0).getAs[Long]("event_id") == 6L)
    assert(out.getStruct(1).getAs[Long]("event_id") == 5L)
    // without anything to project to, slots are null (reference: no emit)
    val none = Combine.projectLatest(df,
      Seq(col("service") === "nope", col("service") === "nada")).collect().head
    assert(none.isNullAt(0) && none.isNullAt(1))
  }

  test("coalesce remembers the latest event per [service host] (coalesce-test)") {
    // b2 replaces b1; a and c keep their single states
    val df = events(
      E(id = 1, service = "a", host = "x", state = "one", time = 0L),
      E(id = 2, service = "b", host = "x", state = "one", time = 0L),
      E(id = 3, service = "c", host = "x", state = "one", time = 0L),
      E(id = 4, service = "b", host = "x", state = "two", time = 7L))
    val out = Combine.coalesce(df).select("service", "state").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "one", "b" -> "two", "c" -> "one"))
  }

  test("rate divides each interval's metric sum by the interval (rate-slow-even)") {
    // 10 events/s of metric 1 for 5s, interval 10 -> every bucket rate 1.0
    val df = events((0 until 50).map(i =>
      E(id = i + 1, metric = 1.0, time = i.toLong)): _*)
    val rates = Windows.rate(df, 10, Seq("host"))
      .select("rate").collect().map(_.getDouble(0)).toSeq
    assert(rates.size == 5 && rates.forall(_ == 1.0))
  }

  test("interpolate-constant fills with the latest value but not past expiry (interpolate-constant-test)") {
    // [{1 expired}@0, {2}@3, {3 expired}@6] interval 1 -> metrics
    // [1 2 2 2 3]: expired events forward once and stop the fill
    val df = events(
      E(id = 1, metric = 1.0, state = "expired", time = 0L),
      E(id = 2, metric = 2.0, time = 3L),
      E(id = 3, metric = 3.0, state = "expired", time = 6L))
    val out = Windows.interpolateConstant(df, 1, Seq("host"))
      .orderBy("window_start").select("metric").collect()
      .map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 2.0, 2.0, 2.0, 3.0))
    // regular gaps fill with the last value (em 1 2 3 4 at 0/2/4/6, dt 1)
    val steady = events(
      E(id = 1, metric = 1.0, time = 0L), E(id = 2, metric = 2.0, time = 2L),
      E(id = 3, metric = 3.0, time = 4L), E(id = 4, metric = 4.0, time = 6L))
    val filled = Windows.interpolateConstant(steady, 1, Seq("host"))
      .orderBy("window_start").select("metric").collect()
      .map(_.getDouble(0)).toSeq
    assert(filled == Seq(1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0))
  }

  test("rate emits zero for empty intervals via fill-in (rate-without-input)") {
    // events at t=0 and t=50, interval 10: buckets 10..40 rate 0
    val df = events(E(id = 1, metric = 5.0, time = 0L),
      E(id = 2, metric = 10.0, time = 50L))
    val out = Windows.fillIn(df, 10, Seq("host"), 0.0)
      .withColumn("rate", col("sum_metric") / 10)
      .orderBy("window_start").select("window_start", "rate").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(out == Seq(0L -> 0.5, 10L -> 0.0, 20L -> 0.0, 30L -> 0.0,
      40L -> 0.0, 50L -> 1.0))
  }
}
