package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows

/** Fourth batch of golden cases ported from the reference stream tests
  * (test/riemann/streams_test.clj) — the ewma / ewma-timeless value
  * tables, sreduce running-reduce tables, and the rate-expiration ttl
  * decay. Each test states the deftest it mirrors; where the batch
  * reading differs from the per-event streaming form (final value vs
  * every intermediate), the assertion uses the reference's LAST
  * emission, which the closed forms reproduce exactly. */
class GoldenEwmaRateSpec extends SparkSpec {

  private def metricsAt(ms: Seq[Double]): org.apache.spark.sql.DataFrame =
    events(ms.zipWithIndex.map { case (m, i) =>
      E(id = i + 1, metric = m, time = i.toLong)
    }: _*)

  test("ewma-timeless value tables (ewma-timeless-test)") {
    // (ewma-timeless 0) over any metrics -> 0 (the accumulator never moves)
    assert(one[Double](Windows.ewmaTimeless(
      metricsAt(Seq(1, 10, 20, -100, 4)), 0.0, Seq("host")), "ewma") == 0.0)
    // (ewma-timeless 1) -> always the latest metric
    assert(one[Double](Windows.ewmaTimeless(
      metricsAt(Seq(5, 13, 1, -10, 3)), 1.0, Seq("host")), "ewma") == 3.0)
    // (ewma-timeless 1/2) over five 1s -> 31/32 (zero-init geometric)
    assert(one[Double](Windows.ewmaTimeless(
      metricsAt(Seq(1, 1, 1, 1, 1)), 0.5, Seq("host")), "ewma") == 0.9688)
  }

  test("ewma halflife convergence and decay (ewma-test)") {
    def ramp(extra: (Double, Long)*) = events(
      ((1 to 50).map(i => E(id = i, metric = 1.0, time = i.toLong)) ++
        extra.zipWithIndex.map { case ((m, t), i) =>
          E(id = 100 + i, metric = m, time = t)
        }): _*)
    // 50 steady 1s at halflife 1 converge to 1
    assert(one[Double](Windows.ewma(ramp(), 1.0, Seq("host")), "ewma") == 1.0)
    // one zero a halflife later halves the mean; two quarter it
    assert(one[Double](Windows.ewma(ramp(0.0 -> 51L), 1.0, Seq("host")),
      "ewma") == 0.5)
    assert(one[Double](Windows.ewma(ramp(0.0 -> 51L, 0.0 -> 52L), 1.0,
      Seq("host")), "ewma") == 0.25)
    // halflife 5: zeros spaced 5s apart halve then quarter
    val h5 = events(((1 to 50).map(i =>
      E(id = i, metric = 1.0, time = i.toLong)) ++ Seq(
      E(id = 100, metric = 0.0, time = 55L),
      E(id = 101, metric = 0.0, time = 60L))): _*)
    val got = one[Double](Windows.ewma(h5, 5.0, Seq("host")), "ewma")
    assert(math.abs(got - 0.25) < 0.01, s"ewma(5) after two spaced zeros: $got")
  }

  test("ewma weights by time regardless of arrival order (ewma-test intervals)") {
    // metric 1 at times 0, 2, 1 (out of order), halflife 1 ->
    // final mean 0.875 = 0.5*(2^0) + 0.5*(2^-1) + 0.5*(2^-2)
    val df = events(
      E(id = 1, metric = 1.0, time = 0L),
      E(id = 2, metric = 1.0, time = 2L),
      E(id = 3, metric = 1.0, time = 1L))
    assert(one[Double](Windows.ewma(df, 1.0, Seq("host")), "ewma") == 0.875)
  }

  test("sreduce value tables (sreduce-test)") {
    // explicit init 1 over [1 2 3] -> [2 4 7]
    val df = metricsAt(Seq(1, 2, 3))
    val explicit = Windows.sreduceRunning(df, Seq("host"),
      "acc" -> sum(col("metric")))
      .withColumn("acc", col("acc") + 1)
      .orderBy("event_id").select("acc").collect().map(_.getDouble(0)).toSeq
    assert(explicit == Seq(2.0, 4.0, 7.0))
    // implicit init consumes the first event: [1 2 3 4] -> [3 6 10]
    val df4 = metricsAt(Seq(1, 2, 3, 4))
    val implicitly_ = Windows.sreduceRunning(df4, Seq("host"),
      "acc" -> sum(col("metric")), "n" -> count(lit(1)))
      .filter(col("n") > 1)
      .orderBy("event_id").select("acc").collect().map(_.getDouble(0)).toSeq
    assert(implicitly_ == Seq(3.0, 6.0, 10.0))
  }

  test("instrument emits rate + latency quantile events (instrumentation.clj:26-59)") {
    // four samples of 1..4 ms in one 10 s interval: rate 0.4 ev/s,
    // nearest-rank p50 = 3 ms, p999 = 4 ms; ns in, ms out
    val df = events((1 to 4).map(i =>
      E(id = i, metric = i.toDouble, time = 1L)): _*)
    val m = Windows.instrument(df, 10, floor(col("metric") * lit(1e6)),
      Seq(0.5, 0.999)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m == Map(
      "riemann s rate" -> 0.4,
      "riemann s latency 0.5" -> 3.0,
      "riemann s latency 0.999" -> 4.0))
  }

  test("instrumentApprox tracks the exact form on small samples") {
    val df = events((1 to 100).map(i =>
      E(id = i, metric = i.toDouble, time = 1L)): _*)
    val lat = floor(col("metric") * lit(1e6))
    def toMap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exact = toMap(Windows.instrument(df, 10, lat, Seq(0.5, 0.99)))
    val approx = toMap(Windows.instrumentApprox(df, 10, lat, Seq(0.5, 0.99)))
    assert(exact.keySet == approx.keySet)
    // at n=100 and accuracy 10000 the sketch is exact up to rank ±1
    for ((k, v) <- exact)
      assert(math.abs(approx(k) - v) <= 1.0, s"$k: exact $v approx ${approx(k)}")
  }

  test("percentilesApprox tracks the exact nearest-rank form") {
    val df = events((1 to 200).map(i =>
      E(id = i, metric = i.toDouble, time = 1L)): _*)
    def toMap(d: org.apache.spark.sql.DataFrame) = d
      .select("service_pt", "metric").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = toMap(Windows.percentiles(df, 10, Seq(0.5, 0.9, 0.99)))
    val approx = toMap(Windows.percentilesApprox(df, 10, Seq(0.5, 0.9, 0.99)))
    assert(exact.keySet == approx.keySet)
    for ((k, v) <- exact)
      assert(math.abs(approx(k) - v) <= 2.0, s"$k: exact $v approx ${approx(k)}")
  }

  test("rate keeps emitting zeros until the ttl lapses (rate-expiration)") {
    // (rate 1) over [{time 0 metric 1 ttl 3}] then 5 quiet seconds ->
    // [{time 1 metric 1 ttl 3} {time 2 metric 0 ttl 2} {time 3 metric 0 ttl 1}]
    val df = events(E(id = 1, metric = 1.0, time = 0L, ttl = 3.0))
    val out = Windows.rateExpiring(df, 1, Seq("host"))
      .orderBy("time_s").select("time_s", "rate", "ttl").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 1.0, 3.0), (2L, 0.0, 2.0), (3L, 0.0, 1.0)))
  }

  test("rate-expiring: next event takes over the fill (rate restart)") {
    // ttl 2 at t=0, next event at t=10 ttl 1: zero-fill only t2 (ttl 1),
    // then silence until the t=10 bucket; its own ttl fills nothing
    // (ceil(1/1)-1 = 0 extra buckets)
    val df = events(
      E(id = 1, metric = 4.0, time = 0L, ttl = 2.0),
      E(id = 2, metric = 6.0, time = 10L, ttl = 1.0))
    val out = Windows.rateExpiring(df, 2, Seq("host"))
      .orderBy("time_s").select("time_s", "rate", "ttl").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    // interval 2: bucket [0,2) emits at t2 rate 2.0 ttl 2; ttl 2 allows
    // no zero bucket (ceil(2/2)-1 = 0); bucket [10,12) emits at t12
    assert(out == Seq((2L, 2.0, 2.0), (12L, 3.0, 1.0)))
  }

  test("rate-expiring: null ttl fills interior gaps but not the tail") {
    val df = events(
      E(id = 1, metric = 2.0, time = 0L),
      E(id = 2, metric = 4.0, time = 3L))
    val out = Windows.rateExpiring(df, 1, Seq("host"))
      .orderBy("time_s").select("time_s", "rate").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 2.0), (2L, 0.0), (3L, 0.0), (4L, 4.0)))
  }
}
