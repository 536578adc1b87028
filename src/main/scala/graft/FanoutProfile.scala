package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.ConfigFile
import graft.streaming.SEvent

/** Diagnostic companion to [[FanoutBench]]: runs the N=2 tee shape,
  * fires single-event latency probes, and prints each query's
  * micro-batch `durationMs` breakdown (triggerExecution, walCommit,
  * addBatch, latestOffset, queryPlanning, commitOffsets) so the tee
  * hop's latency budget is attributable instead of guessed — which
  * phase to attack next is read off the output, not inferred from
  * end-to-end medians (r19 VERDICT #2c). */
object FanoutProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ev(i: Int) = SEvent(s"h$i", "svc", "ok",
      Some(i.toDouble), new Timestamp(1706000000000L + i), Some(60.0))

    sys.env.get("FANOUT_PROF_POLL").foreach(v =>
      spark.conf.set("spark.sql.streaming.pollingDelay", v))
    val n = sys.env.getOrElse("FANOUT_PROF_SUBS", "2").toInt
    val dir = Files.createTempDirectory("graft-fanout-prof")
    val cfg = dir.resolve("c.json")
    val streams = (1 to n).map(i =>
      s"""{"name":"s$i","source":"in",
         |"pipeline":[{"op":"where","expr":"metric >= 0"}],
         |"sink":{"kind":"memory"}}""".stripMargin.replace("\n", ""))
      .mkString("[", ",", "]")
    Files.writeString(cfg, s"""{"streams":$streams}""")
    val in = MemoryStream[SEvent]
    val core = new Core(spark)
    val loader = new ConfigFile.Loader(core, spark, cfg,
      sources0 = Map("in" -> (() => in.toDF())),
      fanoutDir = dir.resolve("fanout"))
    Files.createDirectories(dir.resolve("fanout"))
    try {
      loader.reload()
      def sizes(): Seq[Int] =
        (1 to n).map(i => loader.memorySinks(s"s$i").rows.size())
      in.addData(ev(0))
      core.processAllAvailable()
      val probes = sys.env.getOrElse("FANOUT_PROF_PROBES", "15").toInt
      val lats = (1 to probes).map { p =>
        val before = sizes()
        val t = System.nanoTime()
        in.addData(ev(1000000 + p))
        val deadline = System.currentTimeMillis() + 60000
        while (sizes().zip(before).exists { case (s, b) => s <= b } &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(1)
        (System.nanoTime() - t) / 1e6
      }.sorted
      println(f"probe p50 = ${lats(lats.size / 2)}%.1f ms  " +
        f"min = ${lats.head}%.1f ms")
      for ((name, q) <- core.activeQueries.toSeq.sortBy(_._1)) {
        // median of each duration key over the non-empty recent batches
        val progs = q.recentProgress.toSeq
          .filter(_.numInputRows > 0)
        val keys = progs.flatMap(_.durationMs.keySet()
          .toArray(Array.empty[String])).distinct.sorted
        println(s"== $name (${progs.size} non-empty batches)")
        for (k <- keys) {
          val vs = progs.map(p =>
            Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L))
            .sorted
          if (vs.nonEmpty)
            println(f"   $k%-22s p50=${vs(vs.size / 2)}%4d ms  " +
              f"max=${vs.last}%4d ms")
        }
      }
    } finally { core.stop(); spark.stop() }
  }
}
