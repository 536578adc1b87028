package graft

import org.apache.spark.sql.functions._
import graft.operators.{Combine, Index, Streams, Windows}
import graft.operators.Streams.EventOps

/** Golden behavioral cases ported from the reference stream tests
  * (test/riemann/streams_test.clj — smap/with/default/adjust/tag/
  * split/changed/stable/runs/throttle/window/top sections), driven
  * through tiny DataFrames the way run-stream drives event vectors. */
class StreamsSpec extends SparkSpec {

  test("where + else branches partition the stream (streams_test.clj where-test)") {
    val df = events(E(id = 1, metric = 0.5), E(id = 2, metric = 2.0),
      E(id = 3, metric = null))
    val (t, f) = df.whereElse(col("metric") > 1)
    assert(ids(t) == Seq(2L))
    assert(ids(f) == Seq(1L, 3L)) // null predicate -> else, as in truthiness
  }

  test("over / under (streams.clj:1661-1675)") {
    val df = events(E(id = 1, metric = 1.0), E(id = 2, metric = 5.0))
    assert(ids(df.over(3)) == Seq(2L))
    assert(ids(df.under(3)) == Seq(1L))
  }

  test("tagged-all / tagged-any (streams_test.clj tagged-test)") {
    val df = events(
      E(id = 1, tags = Seq("foo", "bar")),
      E(id = 2, tags = Seq("foo")),
      E(id = 3, tags = Seq("bar")),
      E(id = 4))
    assert(ids(df.taggedAll(Seq("foo", "bar"))) == Seq(1L))
    assert(ids(df.taggedAny(Seq("foo", "bar"))) == Seq(1L, 2L, 3L))
  }

  test("with overwrites, default only fills nil (streams_test.clj with/default)") {
    val df = events(E(id = 1, state = "ok", metric = 1.0), E(id = 2))
    val w = df.withFields("state" -> lit("err"))
    assert(w.select("state").collect().map(_.getString(0)).toSet == Set("err"))
    val dflt = df.defaultFields("state" -> lit("unknown"))
    assert(dflt.orderBy("event_id").select("state").collect().map(_.getString(0)).toSeq
      == Seq("ok", "unknown"))
  }

  test("adjust applies fn to one field (streams_test.clj adjust-test)") {
    val df = events(E(id = 1, metric = 2.0))
    assert(one[Double](df.adjust("metric", _ * 10), "metric") == 20.0)
  }

  test("scale multiplies metric (streams.clj:1450-1461)") {
    val df = events(E(id = 1, metric = 3.0))
    assert(one[Double](df.scale(2.5), "metric") == 7.5)
  }

  test("tag adds distinct, untag removes (streams_test.clj tag/untag)") {
    val df = events(E(id = 1, tags = Seq("a", "b")), E(id = 2))
    val tagged = df.tag("b", "c").select(array_sort(col("tags")).as("t"))
      .collect().map(_.getSeq[String](0).toList).toSet
    assert(tagged == Set(List("a", "b", "c"), List("b", "c")))
    val untagged = df.untag("b").filter(col("event_id") === 1)
    assert(untagged.select("tags").collect().head.getSeq[String](0) == Seq("a"))
  }

  test("smap drops nil results (streams.clj:163-175)") {
    val df = events(E(id = 1, metric = 1.0), E(id = 2, metric = null))
    // projection whose keep-pred nulls out missing metrics
    assert(ids(df.smap(col("metric").isNotNull, "metric" -> (col("metric") + 1)))
      == Seq(1L))
  }

  test("smapcat + sflatten explode vectors (streams.clj:177-204)") {
    val df = events(E(id = 1, tags = Seq("x", "y")))
    assert(df.smapcat(col("tags"), "tag").count() == 2)
    val nested = df.select(array(struct(col("event_id"), col("host"))).as("es"))
    assert(nested.sflatten("es").columns.toSeq == Seq("event_id", "host"))
  }

  test("split routes first-match (streams_test.clj split-test)") {
    val df = events(E(id = 1, metric = 200.0), E(id = 2, metric = 100.0),
      E(id = 3, metric = 10.0), E(id = 4, metric = null))
    val routes = df.splitRoutes(
      Seq((col("metric") > 150, "high"), (col("metric") > 50, "mid")), "low")
      .orderBy("event_id").select("route").collect().map(_.getString(0)).toSeq
    assert(routes == Seq("high", "mid", "low", "low"))
  }

  test("split without default drops non-matching events (streams.clj:1812-1853)") {
    val df = events(E(id = 1, metric = 200.0), E(id = 2, metric = 100.0),
      E(id = 3, metric = 10.0))
    val out = df.splitRoutesStrict(Seq(
      (col("metric") > 150, "high"), (col("metric") > 50, "mid")))
    assert(out.select("event_id", "route").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "high"), (2L, "mid"))) // id 3 matched nothing: dropped
  }

  test("splitp routes on extracted value (streams.clj:1855-1916)") {
    val df = events(E(id = 1, state = "critical"), E(id = 2, state = "warning"),
      E(id = 3, state = "ok"))
    val routes = df.splitp(col("state"),
      Seq(("critical", "page"), ("warning", "notify")), "ignore")
      .orderBy("event_id").select("route").collect().map(_.getString(0)).toSeq
    assert(routes == Seq("page", "notify", "ignore"))
  }

  test("dual mirrors complement as expired (streams.clj:127-152)") {
    val df = events(E(id = 1, metric = 9.0, state = "ok"),
      E(id = 2, metric = 1.0, state = "ok"))
    val (t, f) = df.dual(col("metric") > 5)
    assert(ids(t) == Seq(1L))
    assert(f.select("state").collect().head.getString(0) == "expired")
  }

  test("expired? honors state and ttl lapse (streams.clj:52-61)") {
    val df = events(
      E(id = 1, state = "expired", time = 100L),
      E(id = 2, state = "ok", time = 100L, ttl = 10.0),
      E(id = 3, state = "ok", time = 100L, ttl = 1000.0),
      E(id = 4, state = "ok", time = 100L)) // no ttl -> never expires
    assert(ids(df.expired(lit(200L))) == Seq(1L, 2L))
    assert(ids(df.notExpired(lit(200L))) == Seq(3L, 4L))
  }

  test("match polymorphic matcher (common.clj:181-212)") {
    val df = events(E(id = 1, service = "api-1"), E(id = 2, service = "web"),
      E(id = 3, service = null))
    assert(ids(df.matching("service", "api-[0-9]".r)) == Seq(1L))
    assert(ids(df.matching("service", "web")) == Seq(2L))
    assert(ids(df.matching("service", null)) == Seq(3L))
    assert(ids(df.matching("service", Seq("web", "api-1"))) == Seq(1L, 2L))
  }

  test("changed passes value transitions; init suppresses first (streams.clj:1614-1659)") {
    val df = events(
      E(id = 1, state = "ok", time = 1L), E(id = 2, state = "ok", time = 2L),
      E(id = 3, state = "bad", time = 3L), E(id = 4, state = "bad", time = 4L),
      E(id = 5, state = "ok", time = 5L))
    assert(ids(Windows.changed(df, "state", Seq("host"))) == Seq(1L, 3L, 5L))
    assert(ids(Windows.changed(df, "state", Seq("host"), init = Some("ok")))
      == Seq(3L, 5L))
  }

  test("runs passes after n consecutive equal values (streams.clj:1918-1934)") {
    val df = events(
      E(id = 1, state = "a", time = 1L), E(id = 2, state = "a", time = 2L),
      E(id = 3, state = "b", time = 3L), E(id = 4, state = "a", time = 4L),
      E(id = 5, state = "a", time = 5L), E(id = 6, state = "a", time = 6L))
    assert(ids(Windows.runs(df, 2, "state", Seq("host"))) == Seq(2L, 5L, 6L))
  }

  test("stable de-flaps: whole stable runs pass, flaps are discarded (streams.clj:1936-2030)") {
    val df = events(
      E(id = 1, state = "ok", time = 0L), E(id = 2, state = "ok", time = 100L),
      E(id = 3, state = "bad", time = 110L), E(id = 4, state = "ok", time = 120L),
      E(id = 5, state = "ok", time = 250L))
    // dt=50: the first ok run (0..100) proves stable -> BOTH its events
    // pass (the reference flushes its probation buffer); the bad flap at
    // 110 never stabilizes; the second ok run (120..250) passes whole
    assert(ids(Windows.stable(df, 50, "state", Seq("host"))) == Seq(1L, 2L, 4L, 5L))
  }

  test("throttle: n per dt bucket (streams.clj:1102-1118)") {
    val df = (1 to 6).map(i => E(id = i, time = i * 10L))
    assert(ids(Windows.throttle(events(df: _*), 2, 100, Seq("host"))) == Seq(1L, 2L))
  }

  test("fixed-event-window groups n per key (streams.clj:305-320)") {
    val df = events((1 to 7).map(i => E(id = i, metric = 1.0, time = i.toLong)): _*)
    val w = Windows.fixedEventWindow(df, 3, Seq("host")).orderBy("batch_id")
      .select("n_events").collect().map(_.getLong(0)).toSeq
    assert(w == Seq(3L, 3L, 1L))
  }

  test("moving-event-window emits per event over last n (streams.clj:292-303)") {
    val df = events((1 to 4).map(i => E(id = i, metric = i.toDouble, time = i.toLong)): _*)
    val sums = Windows.movingEventWindow(df, 2, Seq("host"))
      .orderBy("event_id").select("moving_sum").collect().map(_.getDouble(0)).toSeq
    assert(sums == Seq(1.0, 3.0, 5.0, 7.0))
  }

  test("fixed-time-window anchors at first event (streams.clj:355-418)") {
    val df = events(E(id = 1, time = 103L), E(id = 2, time = 104L),
      E(id = 3, time = 113L), E(id = 4, time = 124L))
    val rows = Windows.fixedTimeWindow(df, 10, Seq("host"))
      .orderBy("window_id").select("window_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // windows anchored at 103: [103,113) has ids 1,2; [113,123) id 3; [123,133) id 4
    assert(rows == Seq((0L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("rate sums per epoch-aligned interval (streams.clj:841-883)") {
    val df = events(E(id = 1, metric = 30.0, time = 0L),
      E(id = 2, metric = 30.0, time = 5L), E(id = 3, metric = 60.0, time = 10L))
    val r = Windows.rate(df, 10, Seq("service")).orderBy("window_start")
      .select("rate").collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(6.0, 6.0))
  }

  test("counter with reset tag segments (streams.clj:900-932)") {
    val df = events(
      E(id = 1, metric = 1.0, time = 1L), E(id = 2, metric = 2.0, time = 2L),
      E(id = 3, metric = 5.0, time = 3L, tags = Seq("reset")),
      E(id = 4, metric = 1.0, time = 4L))
    val sums = Windows.counter(df, Seq("host")).orderBy("event_id")
      .select("running_sum").collect().map(_.getDouble(0)).toSeq
    assert(sums == Seq(1.0, 3.0, 5.0, 6.0))
  }

  test("top k by grouped metric (streams.clj:1015-1100)") {
    val df = events(
      E(id = 1, host = "a", metric = 10.0), E(id = 2, host = "b", metric = 5.0),
      E(id = 3, host = "c", metric = 1.0), E(id = 4, host = "a", metric = 10.0))
    val top = Windows.topK(df, 2, Seq("host")).select("host").collect()
      .map(_.getString(0)).toSeq
    assert(top == Seq("a", "b"))
  }

  test("coalesce remembers latest per [service host] (streams.clj:1187-1241)") {
    val df = events(
      E(id = 1, host = "a", service = "cpu", metric = 1.0, time = 1L),
      E(id = 2, host = "a", service = "cpu", metric = 9.0, time = 5L),
      E(id = 3, host = "b", service = "cpu", metric = 4.0, time = 2L))
    val snap = Combine.coalesce(df).orderBy("host")
      .select("metric").collect().map(_.getDouble(0)).toSeq
    assert(snap == Seq(9.0, 4.0))
  }

  test("project holds latest match per predicate (streams.clj:2032-2101)") {
    val df = events(
      E(id = 1, service = "enq", metric = 10.0, time = 1L),
      E(id = 2, service = "deq", metric = 5.0, time = 2L),
      E(id = 3, service = "enq", metric = 20.0, time = 3L))
    val row = Combine.projectQuotient(df, col("service") === "enq",
      col("service") === "deq").collect().head
    assert(row.getDouble(0) == 20.0 && row.getDouble(1) == 5.0 &&
      row.getDouble(2) == 4.0)
  }

  test("apdex = (satisfied + tolerated/2) / total (streams.clj:2103-2157)") {
    val df = events(
      E(id = 1, metric = 10.0, time = 1L), E(id = 2, metric = 20.0, time = 2L),
      E(id = 3, metric = 80.0, time = 3L), E(id = 4, metric = 500.0, time = 4L))
    val a = Windows.apdex(df, 100, col("metric") <= 50,
      col("metric") > 50 && col("metric") <= 100, Seq("service"))
      .collect().head.getAs[Double]("apdex")
    assert(a == (2 + 1 / 2.0) / 4) // 0.625
  }

  test("moving-time-window spans the last n seconds inclusive (streams.clj:322-353)") {
    val df = events(
      E(id = 1, metric = 1.0, time = 1L), E(id = 2, metric = 2.0, time = 2L),
      E(id = 3, metric = 4.0, time = 4L))
    val sums = Windows.movingTimeWindow(df, 2, Seq("host"))
      .orderBy("event_id").select("window_sum").collect()
      .map(_.getDouble(0)).toSeq
    // [t-1, t]: {1}, {1,2}, {4} (t=4 window [3,4] excludes t<=2)
    assert(sums == Seq(1.0, 3.0, 4.0))
  }

  test("fixed-offset-time-window is epoch-aligned (streams.clj:420-431)") {
    val df = events(
      E(id = 1, metric = 1.0, time = 9L), E(id = 2, metric = 2.0, time = 10L),
      E(id = 3, metric = 3.0, time = 19L), E(id = 4, metric = 4.0, time = 20L))
    val rows = Windows.fixedOffsetTimeWindow(df, 10, Seq("host"))
      .orderBy("window_start").collect()
      .map(r => (r.getAs[Long]("window_start"), r.getAs[Double]("sum_metric")))
    assert(rows.toSeq == Seq((0L, 1.0), (10L, 5.0), (20L, 4.0)))
  }

  test("salted aggregation equals direct aggregation (skew path)") {
    val df = events((1 to 40).map(i =>
      E(id = i, host = if (i <= 35) "hot" else s"h$i", metric = i.toDouble,
        time = i.toLong)): _*)
    val salted = Windows.saltedSumCount(df, Seq("host"), "metric", 4)
      .orderBy("host").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val direct = df.groupBy("host")
      .agg(sum(col("metric")).as("s"), count(col("metric")).as("c"))
      .orderBy("host").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("index snapshot + search end-to-end (index.clj:89-95)") {
    val df = events(
      E(id = 1, host = "a", service = "api", state = "ok", metric = 1.0, time = 1L),
      E(id = 2, host = "a", service = "api", state = "critical", metric = 9.0, time = 5L),
      E(id = 3, host = "b", service = "web", state = "ok", metric = 2.0, time = 2L))
    val snap = Index.snapshot(df)
    assert(snap.count() == 2)
    assert(ids(Index.search(snap, "state = \"critical\"")) == Seq(2L))
    assert(ids(Index.search(snap, "service =~ \"a%\" and metric > 5")) == Seq(2L))
  }

  test("deps rules tag events against the index (deps.clj:24-80)") {
    import graft.operators.Deps
    val idx = events(
      E(id = 1, host = "a", service = "db", state = "ok", time = 1L),
      E(id = 2, host = "b", service = "db", state = "critical", time = 1L))
    val evs = events(
      E(id = 10, host = "a", service = "api", time = 2L),
      E(id = 11, host = "b", service = "api", time = 2L),
      E(id = 12, host = "c", service = "api", time = 2L))
    // localhost rule: my host must have a healthy db
    val local = Deps.tagSatisfied(evs, idx,
      Deps.Localhost(Deps.Matches(Map("service" -> "db", "state" -> "ok"))))
      .orderBy("event_id").select("deps_satisfied")
      .collect().map(_.getBoolean(0)).toSeq
    assert(local == Seq(true, false, false))
    // global rule: ANY healthy db anywhere satisfies everyone
    val global = Deps.tagSatisfied(evs, idx,
      Deps.Matches(Map("service" -> "db", "state" -> "ok")))
      .select("deps_satisfied").collect().map(_.getBoolean(0)).toSeq
    assert(global == Seq(true, true, true))
    // depends: only api events require the db; db events are exempt
    val dep = Deps.tagSatisfied(evs, idx,
      Deps.Depends(Deps.Matches(Map("service" -> "api")),
        Deps.Localhost(Deps.Matches(Map("service" -> "db", "state" -> "ok")))))
      .orderBy("event_id").select("deps_satisfied")
      .collect().map(_.getBoolean(0)).toSeq
    assert(dep == Seq(true, false, false))
  }

  test("deps real-match golden: the production-shaped composite rule " +
    "(deps_test.clj real-match) host by host") {
    import graft.operators.Deps._
    // the reference's 15-entry index: riak pair, memcached/redis/cpu on
    // hosts 1-4, postgres on db
    val idx = events(
      E(id = 1, host = "r1", service = "riak 1", state = "ok", time = 1L),
      E(id = 2, host = "r2", service = "riak 2", state = "warning", time = 1L),
      E(id = 3, host = "1", service = "memcached", state = "ok", time = 1L),
      E(id = 4, host = "2", service = "memcached", state = "critical", time = 1L),
      E(id = 5, host = "3", service = "memcached", state = "ok", time = 1L),
      E(id = 6, host = "4", service = "memcached", state = "critical", time = 1L),
      E(id = 7, host = "1", service = "redis", state = "ok", time = 1L),
      E(id = 8, host = "2", service = "redis", state = "ok", time = 1L),
      E(id = 9, host = "3", service = "redis", state = "critical", time = 1L),
      E(id = 10, host = "4", service = "redis", state = "critical", time = 1L),
      E(id = 11, host = "1", service = "cpu", state = "ok", time = 1L),
      E(id = 12, host = "2", service = "cpu", state = "warning", time = 1L),
      E(id = 13, host = "3", service = "cpu", state = "warning", time = 1L),
      E(id = 14, host = "4", service = "cpu", state = "ok", time = 1L),
      E(id = 15, host = "db", service = "postgres", state = "ok", time = 1L))
    // all(depends(lbapp, any(riak1 ok, riak2 ok)),
    //     depends(api, localhost(any(memcached ok, redis ok),
    //                            any(cpu ok, cpu warning))
    //                  AND postgres@db ok))
    val rule = All(Seq(
      Depends(Matches(Map("service" -> "lbapp")),
        Any(Seq(Matches(Map("service" -> "riak 1", "state" -> "ok")),
          Matches(Map("service" -> "riak 2", "state" -> "ok"))))),
      Depends(Matches(Map("service" -> "api")),
        All(Seq(
          Localhost(All(Seq(
            Any(Seq(Matches(Map("service" -> "memcached", "state" -> "ok")),
              Matches(Map("service" -> "redis", "state" -> "ok")))),
            Any(Seq(Matches(Map("service" -> "cpu", "state" -> "ok")),
              Matches(Map("service" -> "cpu", "state" -> "warning"))))))),
          Matches(Map("host" -> "db", "service" -> "postgres",
            "state" -> "ok")))))))
    val evs = events(
      E(id = 20, host = "lb", service = "lbapp", time = 2L),
      E(id = 21, host = "1", service = "api", time = 2L),
      E(id = 22, host = "2", service = "api", time = 2L),
      E(id = 23, host = "3", service = "api", time = 2L),
      E(id = 24, host = "4", service = "api", time = 2L),
      E(id = 25, host = "invisible", service = "api", time = 2L))
    val got = graft.operators.Deps.tagSatisfied(evs, idx, rule)
      .orderBy("event_id").select("deps_satisfied")
      .collect().map(_.getBoolean(0)).toSeq
    // hosts 1-3 have a healthy cache AND an acceptable cpu; host 4's
    // caches are both down; an unknown host has no local entries at all
    assert(got == Seq(true, true, true, true, false, false))
    // hash-match's empty-index case: nothing matches an empty index
    val empty = events().limit(0)
    val none = graft.operators.Deps.tagSatisfied(evs, empty,
      Matches(Map("service" -> "riak 1")))
      .select("deps_satisfied").collect().map(_.getBoolean(0)).toSeq
    assert(none.forall(_ == false))
  }

  test("index expiry view emits reaper events (core.clj:276-309)") {
    val df = events(
      E(id = 1, host = "a", service = "x", state = "ok", time = 100L, ttl = 10.0),
      E(id = 2, host = "b", service = "x", state = "ok", time = 195L, ttl = 10.0))
    val expired = Index.expiredAt(df, lit(200L))
    assert(expired.select("host").collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(expired.select("state").collect().head.getString(0) == "expired")
    assert(Index.liveAt(df, lit(200L)).count() == 1)
  }
}
