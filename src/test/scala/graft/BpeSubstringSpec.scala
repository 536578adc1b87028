package graft

import graft.pipeline.{Bpe, Dedup}

/** Golden + parity tests for the two r12 pipeline additions: exact
  * substring dedup (Lee et al. 2021) and deterministic BPE training /
  * encoding (Sennrich et al. 2016). */
class BpeSubstringSpec extends SparkSpec {

  // ------------------------------------------------------------- BPE

  test("BPE merge application: non-overlapping left-to-right pass") {
    assert(Bpe.applyMerge("a a a", "a a") == "aa a")
    assert(Bpe.applyMerge("a a a a", "a a") == "aa aa")
    assert(Bpe.applyMerge("x a b y", "a b") == "x ab y")
    // a symbol whose text embeds the left part must not false-match
    assert(Bpe.applyMerge("xa b", "a b") == "xa b")
    assert(Bpe.applyMerge("l o w", "l o") == "lo w")
  }

  test("BPE training on Sennrich et al.'s worked vocabulary") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.trainOnVocab(vocab, 4)
    // (e,s) weight 9 from newest+widest; then (es,t) 9; then the 7-way
    // tie between "l o" and "o w" breaks to the smaller pair string
    assert(merges.map(_._2).take(3) == Seq("e s", "es t", "l o"))
    assert(merges.take(2).map(_._4) == Seq(9L, 9L))
    assert(merges(2)._4 == 7L)
    // vocab exhaustion is loud, never a silent early stop
    assertThrows[IllegalStateException](
      Bpe.trainOnVocab(Seq(("ab", 1L)), 5))
  }

  test("BPE encode (Column form) agrees with the driver-side rewrite " +
    "on every document") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "low lower newest widest low"),
      (2L, "the quick brown fox, the quick!"),
      (3L, "a"),
      (4L, "spark spark spark 12345 engine"),
      // the review's divergence shapes: newline (DOTALL split) and a
      // non-BMP char (code points, not UTF-16 units) must agree
      // between the driver leg and the Column leg
      (5L, "emoji 😀 and a\nnewline mix")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 10, 50)
      .select("pair").collect().map(_.getString(0)).toSeq
    val got = Bpe.encode(docs, merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val re = graft.pipeline.TextAnalysis.BpeSplitRe.r
    val want = docs.orderBy("doc_id").collect().map { r =>
      val toks = re.findAllIn(r.getString(1)).toSeq
      val n = toks.map { t =>
        merges.foldLeft(Bpe.initialSym(t))(Bpe.applyMerge)
          .split(" ").length.toLong
      }.sum
      (r.getLong(0), toks.size.toLong, n)
    }
    assert(got.toSeq == want.toSeq)
    // merged tokens really compress: fewer BPE tokens than characters
    assert(got.forall { case (_, pre, bpe) => bpe >= pre })
  }

  // ------------------------------------------ exact substring dedup

  test("substring dedup strips non-canonical duplicated spans and " +
    "keeps the canonical occurrence (Lee et al. 2021 keep-one)") {
    val spark0 = spark
    import spark0.implicits._
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"intro words here $span tail a"),
      (2L, s"different opening text $span other ending b"),
      (3L, "no duplicated content in this document at all")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs, 8).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 holds the canonical occurrence: nothing removed
    assert(got(0) == ((1L, 13L, 0L, s"intro words here $span tail a")))
    // doc 2's copy of the 8-token span is removed, the rest survives
    assert(got(1) == ((2L, 14L, 8L,
      "different opening text other ending b")))
    assert(got(2)._3 == 0L)
  }

  test("substring dedup: spans longer than minLen are removed in " +
    "full, short docs and sub-minLen repeats untouched") {
    val spark0 = spark
    import spark0.implicits._
    val long = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10" // 10-token duplicated run
    val docs = Seq(
      (1L, s"$long x y z"),
      (2L, s"p q r $long"),
      (3L, "tiny doc"), // < minLen tokens: no grams at all
      (4L, "rep rep rep rep rep short")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs, 8).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 0L, s"$long x y z"))) // canonical
    // all 10 tokens of the duplicated run go (3 overlapping dup grams
    // cover positions 4..13)
    assert(got(1) == ((2L, 10L, "p q r")))
    assert(got(2) == ((3L, 0L, "tiny doc")))
    assert(got(3)._2 == 0L) // 5-token repeat < minLen: kept
  }
}
