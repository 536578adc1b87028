package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SEvent, StatefulOps}

/** Config lifecycle (core.clj:105-161 transition!) and instrumentation
  * (instrumentation.clj:50-74) tests. */
class CoreSpec extends SparkSpec {

  private def ev(m: Double, t: Long) =
    SEvent("h", "s", "ok", Some(m), new Timestamp(t * 1000), None)

  test("applyConfig starts, reuses equiv, restarts changed (core.clj:105-161)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SEvent]
    val core = new Core(spark)

    core.stream("ewma", signature = "r=0.5") {
      StatefulOps.ewmaTimeless(input.toDS(), 0.5)
        .writeStream.format("memory").outputMode("append")
    }
    assert(core.applyConfig() == Seq("ewma"))
    val q1 = core.activeQueries("ewma")

    // same signature -> equiv? -> query keeps running
    core.stream("ewma", signature = "r=0.5") {
      StatefulOps.ewmaTimeless(input.toDS(), 0.5)
        .writeStream.format("memory").outputMode("append")
    }
    assert(core.applyConfig() == Seq())
    assert(core.activeQueries("ewma").id == q1.id)

    // changed signature -> restart with the new topology
    core.stream("ewma", signature = "r=0.9") {
      StatefulOps.ewmaTimeless(input.toDS(), 0.9)
        .writeStream.format("memory").outputMode("append")
    }
    assert(core.applyConfig() == Seq("ewma"))
    assert(core.activeQueries("ewma").id != q1.id)

    // removal path: dropped from the config -> stopped on next apply
    core.removeStream("ewma")
    assert(core.applyConfig() == Seq())
    assert(core.activeQueries.isEmpty)
    core.stop()
  }

  test("instrumentation reports rates and duration quantiles (instrumentation.clj:50-74)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val instr = new Instrumentation
    spark.streams.addListener(instr)
    try {
      val input = MemoryStream[SEvent]
      val q = input.toDS().writeStream.format("memory")
        .queryName("instrumented").outputMode("append").start()
      input.addData(ev(1, 1), ev(2, 2))
      q.processAllAvailable()
      input.addData(ev(3, 3))
      q.processAllAvailable()
      // sample while the query is live (listener delivery is async;
      // termination evicts the series — that eviction is also asserted)
      var tries = 0
      while (!instr.snapshot.contains("instrumented") && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val snap = instr.snapshot
      assert(snap.contains("instrumented"))
      val (_, qs) = snap("instrumented")
      assert(qs.keySet == Set(0.5, 0.95, 0.99))
      q.stop()
      tries = 0
      while (instr.snapshot.contains("instrumented") && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      assert(!instr.snapshot.contains("instrumented")) // evicted on stop
    } finally spark.streams.removeListener(instr)
  }
}
