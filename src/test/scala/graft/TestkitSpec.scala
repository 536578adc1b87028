package graft

import org.apache.spark.sql.functions._

import graft.operators.Streams.EventOps
import graft.sinks.Sinks

/** The tap/io/inject workflow (reference src/riemann/test.clj:33-153,
  * config/riemann.config:23-36's live tap example). */
class TestkitSpec extends SparkSpec {

  test("taps capture intermediate streams; inject returns all captures (test.clj:120-153)") {
    val kit = Testkit.test
    val input = events(
      E(id = 1, host = "a", service = "api", metric = 10.0, time = 0L),
      E(id = 2, host = "b", service = "api", metric = 200.0, time = 1L),
      E(id = 3, host = "c", service = "web", metric = 300.0, time = 2L))
    val got = kit.inject(input) { ev =>
      val big = kit.tap("big", ev.over(100))
      kit.tap("api-big", big.where(col("service") === "api"))
      ()
    }
    assert(got.keySet == Set("big", "api-big"))
    assert(got("big").map(_.getLong(0)).sorted == Seq(2L, 3L))
    assert(got("api-big").map(_.getLong(0)) == Seq(2L))
  }

  test("duplicate tap names throw (test.clj:63-75's compile-time check)") {
    val kit = Testkit.test
    val input = events(E(id = 1, time = 0L))
    intercept[IllegalStateException] {
      kit.inject(input) { ev =>
        kit.tap("x", ev); kit.tap("x", ev); ()
      }
    }
  }

  test("io suppresses sinks in test mode and runs them in prod (test.clj:82-95)") {
    val hits = new java.util.concurrent.atomic.AtomicInteger
    val sink = new Sinks.EventSink {
      override def write(batch: org.apache.spark.sql.DataFrame,
          batchId: Long): Unit = { hits.incrementAndGet(); () }
    }
    val input = events(E(id = 1, time = 0L))
    Testkit.test.io(input, sink)
    assert(hits.get == 0)
    Testkit.prod.io(input, sink)
    assert(hits.get == 1)
  }

  test("prod mode taps are identity and capture nothing") {
    val kit = Testkit.prod
    val input = events(E(id = 1, time = 0L))
    val got = kit.inject(input) { ev =>
      assert(kit.tap("x", ev) eq ev)
      ()
    }
    assert(got.isEmpty)
  }
}
