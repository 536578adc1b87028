package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sinks.Sinks
import graft.streaming.{ReinjectLoop, SEvent}

/** The reinject feedback loop (config.clj:280-288): an alerting branch
  * derives events and sends them BACK into the topology's top, where
  * the full pipeline (index here) sees them on the next trigger. */
class ReinjectSpec extends SparkSpec {

  test("reinject: derived alerts re-enter the topology across triggers") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val primary = MemoryStream[SEvent]
    val loop = new ReinjectLoop

    // the topology: primary UNION loopback -> (index stand-in) sink
    val all = primary.toDS().union(loop.source)
    val topo = all.writeStream.format("memory").queryName("rein_topo")
      .outputMode("append").start()
    // the alerting branch: critical events become <service>-alert events
    // reinjected at the top (the reference's (where (state "critical")
    // (with ... reinject)) idiom)
    val alerts = primary.toDS()
      .filter(col("state") === "critical")
      .withColumn("service", concat(col("service"), lit("-alert")))
      .withColumn("state", lit("ok"))
      .as[SEvent]
    val alertQ = Sinks.attach(alerts, loop.sink)
      .queryName("rein_alerts").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rein").toString)
      .start()

    try {
      primary.addData(
        SEvent("web01", "cpu", "critical", Some(0.99), new Timestamp(1000), None),
        SEvent("web02", "cpu", "ok", Some(0.2), new Timestamp(2000), None))
      alertQ.processAllAvailable() // derive + enqueue the loopback event
      topo.processAllAvailable()   // next trigger: loopback re-enters

      val seen = spark.table("rein_topo").as[SEvent].collect()
        .map(e => (e.host, e.service, e.state)).toSet
      assert(seen.contains(("web01", "cpu", "critical")))  // original
      assert(seen.contains(("web02", "cpu", "ok")))
      assert(seen.contains(("web01", "cpu-alert", "ok")))  // reinjected
      // the non-critical event produced no alert
      assert(!seen.contains(("web02", "cpu-alert", "ok")))
    } finally { topo.stop(); alertQ.stop() }
  }
}
