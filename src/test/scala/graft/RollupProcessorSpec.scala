package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{RollupProcessor, SEvent}

/** Streaming rollup: pass n per period, buffer the overflow, deliver
  * the buffered vector when the period's timer fires
  * (streams.clj:1120-1156, streams_test.clj rollup-test). */
class RollupProcessorSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000)
  private def ev(host: String, m: Double, t: Long) =
    SEvent(host, "alerts", "critical", Some(m), ts(t), None)

  test("rollup passes n per period and flushes the overflow on the timer") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val spark0 = spark
      import spark0.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[SEvent]
      val q = RollupProcessor(input.toDS(), n = 2, dtSeconds = 100)
        .writeStream.format("memory").queryName("ru").outputMode("append")
        .start()
      try {
        // period anchored at 1000: metrics 1,2 pass; 3,4 buffer
        input.addData(ev("a", 1, 1000), ev("a", 2, 1010),
          ev("a", 3, 1020), ev("a", 4, 1030))
        q.processAllAvailable()
        // advance the watermark past 1000+100 via another key, firing
        // the period timer (two triggers: advance, then fire)
        input.addData(ev("zz", 9, 1300))
        q.processAllAvailable()
        input.addData(ev("zz", 9, 1301))
        q.processAllAvailable()
        val out = spark.table("ru").as[RollupProcessor.Emission].collect()
          .filter(_.key == "alerts")
        val passed = out.filter(!_.rolled).flatMap(_.events)
          .flatMap(_.metric).sorted.toSeq
        assert(passed == Seq(1.0, 2.0, 9.0, 9.0))
        val flushes = out.filter(_.rolled)
        assert(flushes.length == 1)
        // one vector emission carrying the whole overflow, in order
        assert(flushes.head.events.flatMap(_.metric).toSeq == Seq(3.0, 4.0))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("a new period opens after the previous one closes; no flush when nothing buffered") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val spark0 = spark
      import spark0.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[SEvent]
      val q = RollupProcessor(input.toDS(), n = 2, dtSeconds = 100)
        .writeStream.format("memory").queryName("ru2").outputMode("append")
        .start()
      try {
        input.addData(ev("a", 1, 1000)) // under the cap: nothing buffers
        q.processAllAvailable()
        input.addData(ev("zz", 9, 1300)) // watermark past period end
        q.processAllAvailable()
        input.addData(ev("zz", 9, 1301))
        q.processAllAvailable()
        // next event opens a fresh period and passes immediately
        input.addData(ev("a", 5, 1400))
        q.processAllAvailable()
        val out = spark.table("ru2").as[RollupProcessor.Emission].collect()
          .filter(_.key == "alerts")
        assert(out.forall(!_.rolled)) // no overflow ever buffered
        assert(out.flatMap(_.events).flatMap(_.metric).sorted.toSeq
          == Seq(1.0, 5.0, 9.0, 9.0))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
