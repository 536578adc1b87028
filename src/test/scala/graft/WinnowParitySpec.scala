package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}

/** Winnowing fingerprint kernel: parity against the column-form spec,
  * the published guarantee, and the overlap-pair consumer.
  * Reference: Schleimer, Wilkerson & Aiken, SIGMOD 2003 (public
  * algorithm; riemann itself has no document operators). */
class WinnowParitySpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def fpsOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toList

  test("kernel matches the column-form spec element-exactly " +
    "(incl. short docs, doc shorter than k, empty text)") {
    val d = docsDf(
      0L -> "the quick brown fox jumps over the lazy dog and keeps going",
      1L -> "tiny",                       // shorter than k=12: one gram
      2L -> "",                           // empty text
      3L -> "aaaaaaaaaaaaaaaaaaaaaaaa",   // all-identical grams
      4L -> ("x" * 7 + "distinct middle content here" + "y" * 7))
    for ((k, w) <- Seq((12, 8), (5, 4), (3, 1), (12, 50))) {
      val kernel = fpsOf(TextAnalysis.winnow(d, k, w))
      val spec = fpsOf(TextAnalysis.winnowColumns(d, k, w))
      assert(kernel == spec, s"k=$k w=$w")
    }
  }

  test("null text propagates null (matching the column form)") {
    val d = docsDf(0L -> "some perfectly ordinary text to fingerprint")
      .unionByName(docsDf(1L -> "x").withColumn("text",
        lit(null).cast("string")))
    val kernel = TextAnalysis.winnow(d, 12, 8).orderBy("doc_id").collect()
    val spec = TextAnalysis.winnowColumns(d, 12, 8).orderBy("doc_id").collect()
    assert(kernel(1).isNullAt(1) && spec(1).isNullAt(1))
    assert(kernel(0).getSeq[Long](1) == spec(0).getSeq[Long](1))
  }

  test("winnowing guarantee: a shared verbatim substring of length >= " +
    "k+w-1 yields at least one shared fingerprint") {
    val k = 12; val w = 8
    val shared = "this exact paragraph was copied between the documents verbatim"
    assert(shared.length >= k + w - 1)
    val d = docsDf(
      0L -> s"completely unrelated opening words then $shared and a tail",
      1L -> s"$shared with an entirely different surrounding context here",
      2L -> "no overlap with anything else at all in this one honestly")
    val fps = fpsOf(TextAnalysis.winnow(d, k, w)).toMap
    assert(fps(0L).toSet.intersect(fps(1L).toSet).nonEmpty)
    assert(fps(2L).toSet.intersect(fps(0L).toSet).isEmpty)
  }

  test("identical texts have identical fingerprint sets; fingerprints " +
    "are a subset of the doc's gram hashes") {
    val t = "winnowing selects a deterministic subset of the gram hashes"
    val d = docsDf(0L -> t, 1L -> t)
    val fps = fpsOf(TextAnalysis.winnow(d, 12, 8)).toMap
    assert(fps(0L) == fps(1L) && fps(0L).nonEmpty)
    // fingerprints are a subset of the doc's full gram-hash set
    val spark0 = spark
    import spark0.implicits._
    val allGramHashes = docsDf(0L -> t).selectExpr(
        s"transform(sequence(0, greatest(length(text)-12, 0)), i -> " +
        s"CAST(conv(substring(md5(substring(text, i+1, 12)), 1, 15), 16, 10) " +
        s"AS BIGINT) % ${Dedup.MinhashP}L) AS hs")
      .as[Seq[Long]].head().toSet
    assert(fps(0L).toSet.subsetOf(allGramHashes))
  }

  test("winnowOverlapPairs finds partial verbatim overlap that " +
    "whole-document similarity misses, and respects minShared") {
    val copied = "an entire boilerplate footer paragraph shared by both pages"
    val d = docsDf(
      0L -> s"first page body totally different from the second $copied",
      1L -> s"$copied second page body with its own words and numbers",
      2L -> "third page shares nothing with the other two documents")
    val pairs = Dedup.winnowOverlapPairs(d, 12, 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // a high minShared threshold suppresses the pair
    val strict = Dedup.winnowOverlapPairs(d, 12, 8, minShared = 1000)
    assert(strict.count() == 0)
  }

  test("randomized unicode parity: kernel matches the column form on " +
    "mixed-width codepoints (the byte-offset table vs substring)") {
    val rnd = new scala.util.Random(11) // deterministic
    val alphabet: IndexedSeq[String] = // 1-, 2-, 3-, and 4-byte UTF-8
      ("abc XYZ 09".map(_.toString) ++ Seq("é", "ß", "中", "日", "€", "🙂", "𝕊"))
    val docs = (1 to 40).map { id =>
      val n = 1 + rnd.nextInt(60)
      (id.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString)
    }
    val d = docsDf(docs: _*)
    for ((k, w) <- Seq((12, 8), (5, 3), (2, 1)))
      assert(fpsOf(TextAnalysis.winnow(d, k, w)) ==
        fpsOf(TextAnalysis.winnowColumns(d, k, w)), s"k=$k w=$w")
  }

  test("overlap pairs run the kernel once: no self-join at all, one scan " +
    "(AQE-final plan)") {
    // r11: pair synthesis moved inside the fp partition (member-list
    // aggregation on the cap's own exchange + a narrow nested
    // transform) — the self-join whose exchange-reuse this test used
    // to pin no longer exists, which is strictly stronger
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Dedup.winnowOverlapPairs(d)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"pair synthesis should not join:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"documents scanned more than once:\n$p")
  }

  test("winnow plans narrow: no exchange before the kernel projection") {
    val d = docsDf(0L -> "plans should not shuffle for a per-row kernel")
    val p = TextAnalysis.winnow(d, 12, 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected exchange:\n$p")
  }
}
