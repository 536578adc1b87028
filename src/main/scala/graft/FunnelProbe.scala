package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

/** One-off stage-timing probe for the curation funnel (diagnostic). */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("funnel-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }
    val corpus = docs.filter(col("doc_id") % 10 =!= 0).cache()
    val bench = docs.filter(col("doc_id") % 10 === 0)
    t("corpus.count")(corpus.count())
    val qdocs = TextAnalysis.gopherKeep(corpus, 20, 100000).cache()
    t("quality.count")(qdocs.count())
    val exactKeep = qdocs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val edocs = qdocs.join(exactKeep, "doc_id").cache()
    t("exact.count")(edocs.count())
    val esh = Dedup.shingles(edocs).select(col("doc_id"), col("shingles"))
    val pairs = t("pairs.build+count") {
      val p = Dedup.minhashPairsFromShingles(esh).cache()
      p.count(); p
    }
    val ndocs = t("neardup.count") {
      val n = Dedup.dedupedCorpus(edocs, pairs).cache(); n.count(); n
    }
    val clean = TextAnalysis.contaminationFromShingles(
        Dedup.shingles(ndocs).select(col("doc_id"), col("shingles")), bench)
      .filter(col("n_contaminated") * 2 < col("n_shingles"))
      .select("doc_id")
    t("clean.count")(clean.count())
    spark.stop()
  }
}
