package graft

import graft.pipeline.{Bpe, TextAnalysis, Unigram}

/** r17 ADVICE: model-carrying kernels must share ONE broadcast per
  * (context, model content) — no per-call orphan broadcasts in the
  * long-running firehose, and two independently built identical
  * queries must canonicalize equal again (broadcast-typed case-class
  * expr params compare by reference). */
class BroadcastsSpec extends SparkSpec {

  test("same model content -> same Broadcast instance; different " +
    "content -> different") {
    val b1 = Bpe.broadcastMerges(spark, Seq("a b", "ab c"))
    val b2 = Bpe.broadcastMerges(spark, List("a b", "ab c"))
    assert(b1 eq b2)
    val other = Bpe.broadcastMerges(spark, Seq("x y"))
    assert(!(other eq b1))
  }

  test("key contract: iteration-order-sensitive collections (maps/sets) " +
    "are rejected loudly — two equal maps can serialize differently and " +
    "would silently mint duplicate broadcasts (r19 ADVICE)") {
    val e1 = intercept[IllegalArgumentException] {
      graft.pipeline.Broadcasts.of(spark,
        ("k", Map("a" -> 1, "b" -> 2)))(42)
    }
    assert(e1.getMessage.contains("sorted sequence"))
    // nested inside a tuple/list is caught too
    val e2 = intercept[IllegalArgumentException] {
      graft.pipeline.Broadcasts.of(spark,
        ("k", List(Set("x", "y"))))(42)
    }
    assert(e2.getMessage.contains("sorted sequence"))
    // the canonical form the contract asks for works
    val b = graft.pipeline.Broadcasts.of(spark,
      ("k", Map("a" -> 1, "b" -> 2).toList.sorted))(42)
    assert(b.value == 42)
  }

  test("two independently built identical BPE queries canonicalize " +
    "equal (cached-plan reuse works across separate builds)") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "ab ab"), (2L, "abc")).toDF("doc_id", "text")
    val q1 = Bpe.encode(docs, Seq("a b", "ab c"))
    val q2 = Bpe.encode(docs, List("a b", "ab c"))
    assert(q1.queryExecution.analyzed.sameResult(q2.queryExecution.analyzed))
    // and the shared instance produces the right counts
    assert(q1.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ==
      q2.collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("langid: two separately TRAINED (equal-content) models share " +
    "one broadcast — the key restores structural identity over the " +
    "model's array fields") {
    val spark0 = spark
    import spark0.implicits._
    val docs = ((0 until 10).map(i =>
      (i.toLong, s"alpha bravo charlie delta $i", "aa")) ++
      (0 until 10).map(i =>
        (100L + i, s"zulu xray quebec juliett $i", "zz")))
      .toDF("doc_id", "text", "lang")
    val m1 = TextAnalysis.langIdModel(docs)
    val m2 = TextAnalysis.langIdModel(docs)
    assert(!(m1 eq m2)) // distinct instances, content-equal arrays
    val q1 = TextAnalysis.langIdApply(docs, m1)
    val q2 = TextAnalysis.langIdApply(docs, m2)
    assert(q1.queryExecution.analyzed.sameResult(q2.queryExecution.analyzed))
  }

  test("entries are keyed by content DIGEST and dropped when their " +
    "context ends: the cache retains 16-byte digests, not model deep " +
    "copies, and an ApplicationEnd drops the app's entries eagerly " +
    "instead of waiting for LRU displacement (r18 ADVICE)") {
    val appId = spark.sparkContext.applicationId
    Bpe.broadcastMerges(spark, Seq("q r", "qr s"))
    assert(graft.pipeline.Broadcasts.sizeFor(appId) > 0)
    // the ApplicationEnd listener calls dropApp; the shared test
    // session cannot be stopped here, so drive the drop path directly
    graft.pipeline.Broadcasts.dropApp(appId)
    assert(graft.pipeline.Broadcasts.sizeFor(appId) == 0)
    // the cache repopulates on next use (fresh listener registration)
    val b = Bpe.broadcastMerges(spark, Seq("q r", "qr s"))
    assert(graft.pipeline.Broadcasts.sizeFor(appId) > 0)
    assert(b.value.toSeq == Seq("q r", "qr s"))
  }

  test("unigram: equal-content models share; the cost map is built " +
    "once per content") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val model = Seq(("ab", 5L, 10L), ("a", 3L, 20L), ("b", 2L, 25L))
    val q1 = Unigram.encodeTokensDf(docs, model)
    val q2 = Unigram.encodeTokensDf(docs, model.toList)
    assert(q1.queryExecution.analyzed.sameResult(q2.queryExecution.analyzed))
    assert(q1.collect().map(_.getSeq[String](1)).toSeq ==
      q2.collect().map(_.getSeq[String](1)).toSeq)
  }
}
