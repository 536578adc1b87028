package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.json4s.JObject
import org.json4s.jackson.JsonMethods

/** Isolated A/B for the r18 static-side cache
  * ([[graft.config.ConfigFile.cachedStatic]]): a streaming
  * `"op":"crosscorpus"` decontamination query processes `BATCHES`
  * micro-batches against an `NREF`-document reference corpus, once
  * with the cache and once with the raw (re-derive-per-batch) path.
  * Without the cache every micro-batch re-scans the reference parquet
  * and re-runs shingle→minhash→banding over the WHOLE corpus before
  * the join — per-trigger cost proportional to reference size, the
  * firehose scale bug the mixed-workload soak surfaced. Prints one
  * JSON line with mean per-batch seconds for both paths.
  *
  * Env: NREF (default 20000), BATCHES (10), SPARK_GRAFT_CPUS (16).
  */
object StaticCacheBench {
  def main(args: Array[String]): Unit = {
    val nRef = sys.env.getOrElse("NREF", "20000").toInt
    val nBatches = sys.env.getOrElse("BATCHES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = Files.createTempDirectory("graft-staticbench")
    val ref = dir.resolve("ref.parquet").toString
    spark.range(nRef).select(col("id").as("doc_id"),
        concat(lit("reference document body "),
          col("id").cast("string"),
          lit(" with distinct words "),
          md5(col("id").cast("string"))).as("text"))
      .write.mode("overwrite").parquet(ref)

    val opJson = JsonMethods.parse(
      s"""{"op":"crosscorpus","table":"$ref","threshold":0.5}""")
      .asInstanceOf[JObject]

    def run(cached: Boolean): Double = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, String, java.sql.Timestamp)]
      val stream = in.toDF().toDF("doc_id", "text", "time")
      val out =
        if (cached) graft.config.ConfigFile.applyOp(stream, opJson)
        else {
          // the pre-r18 shape: the reference subtree re-executes in
          // every micro-batch
          val refB = graft.streaming.StreamingCrossCorpus.referenceBanded(
            spark.read.parquet(ref), 16, 4, 3,
            graft.pipeline.Caps.DefaultMaxBucket)
          graft.streaming.StreamingCrossCorpus.matches(
              stream, refB, "time", 16, 4, 3, 0.5)
            .select("new_id", "ref_id", "est_jaccard", "band")
        }
      val q = out.writeStream.format("noop")
        .option("checkpointLocation",
          dir.resolve(s"ckpt-$cached").toString)
        .start()
      try {
        // warm batch (plan + code gen + first cache materialization)
        in.addData((-1L, "warmup document", new java.sql.Timestamp(0)))
        q.processAllAvailable()
        val t0 = System.nanoTime()
        for (i <- 0 until nBatches) {
          in.addData((i.toLong, s"arriving document $i unique words",
            new java.sql.Timestamp(i * 1000L)))
          q.processAllAvailable()
        }
        (System.nanoTime() - t0) / 1e9 / nBatches
      } finally q.stop()
    }

    val raw = run(cached = false)
    val cached = run(cached = true)
    println(f"""{"metric":"crosscorpus_per_batch_sec","n_ref":$nRef,""" +
      f""""batches":$nBatches,"raw":$raw%.3f,"cached":$cached%.3f,""" +
      f""""speedup":${raw / cached}%.1f}""")
    spark.stop()
  }
}
