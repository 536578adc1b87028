package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup, TextAnalysis}

// throwaway stage profiler — not part of the library surface
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("funnel-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime()
      val r = f
      println(f"PROBE $name ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }
    val corpus = docs.filter(col("doc_id") % 10 =!= 0).cache()
    val bench = docs.filter(col("doc_id") % 10 === 0)
    t("corpus")(corpus.count())
    val qdocs = TextAnalysis.gopherKeep(corpus, 20, 100000).cache()
    t("quality")(qdocs.count())
    val exactKeep = qdocs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val edocs = qdocs.join(exactKeep, "doc_id").cache()
    t("exact")(edocs.count())
    val sdocs = Dedup.substringDedup(edocs)
      .filter(col("n_removed") * 2 < col("n_tokens"))
      .select(col("doc_id"), col("text_clean").as("text")).cache()
    t("substring")(sdocs.count())
    val esh = Dedup.shingles(sdocs).select(col("doc_id"), col("shingles"))
    val banded0 = Dedup.bandedFromShingles(esh).cache()
    t("banded")(banded0.count())
    val ndocs = Dedup.dedupedCorpus(sdocs,
      Dedup.minhashPairsFromBanded(banded0)).cache()
    t("neardup")(ndocs.count())
    val ccHits = Dedup.crossCorpusNearDupsFromBanded(
        banded0.join(ndocs.select("doc_id"), "doc_id"),
        Dedup.bandedReference(bench))
      .select(col("new_id").as("doc_id")).distinct()
    val cdocs = ndocs.join(ccHits, Seq("doc_id"), "left_anti").cache()
    t("crosscorpus")(cdocs.count())
    val clean = TextAnalysis.contaminationFromShingles(
        Dedup.shingles(cdocs).select(col("doc_id"), col("shingles")), bench)
      .filter(col("n_contaminated") * 2 < col("n_shingles"))
      .select("doc_id")
    t("clean")(clean.count())
    t("fullFunnel")(Curation.curationFunnel(docs).collect().toList)
    spark.stop()
  }
}
