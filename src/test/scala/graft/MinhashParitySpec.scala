package graft

import graft.pipeline.Dedup
import scala.util.Random

/** The one-pass [[graft.pipeline.MinhashKernel]] must be element-exact
  * against the column-expression signature it replaced (which is also
  * the DuckDB oracle's formulation): same md5-derived hashes, same
  * affine minima, same null conventions. */
class MinhashParitySpec extends SparkSpec {

  private def compare(texts: Seq[String], k: Int): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Any](1).toList)).toSeq
    val fast = rows(Dedup.minhashSignatureFromShingles(sh, k))
    val spec = rows(Dedup.minhashSignatureFromShinglesColumns(sh, k))
    assert(fast == spec)
  }

  test("kernel ≡ column form on a random corpus (k = 16 and k = 8)") {
    val rnd = new Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "x", "y", "", "日本")
    val texts = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(40))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    compare(texts, 16)
    compare(texts, 8)
  }

  test("kernel ≡ column form on degenerate docs (empty, single word, dup shingles)") {
    compare(Seq("", "one", "a b", "a b c", "a b c a b c a b c", "  "), 16)
  }

  test("shingle kernel ≡ column form incl. null/empty/multi-space texts") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new Random(31)
    val vocab = Seq("alpha", "beta", "", "x", "y")
    val texts: Seq[String] = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")) ++ Seq("", null, "one", "a  b", "a b a b a b")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (w <- Seq(2, 3, 10)) {
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select("doc_id", "shingles").orderBy("doc_id").collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toSeq
      assert(rows(Dedup.shingles(df, w)) == rows(Dedup.shinglesColumns(df, w)),
        s"w=$w")
    }
  }

  test("lang-grams kernel ≡ column form incl. non-ASCII / short / null texts") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge
    val rnd = new Random(13)
    val alphabet = "abcdefg 日本語ß"
    val texts: Seq[String] = (1 to 50).map(_ =>
      (1 to (3 + rnd.nextInt(60)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("", null, "ab", "abc", "日本語テキスト")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val buckets = graft.pipeline.TextAnalysis.LangIdBuckets
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toSeq
    // the column form (the DuckDB oracle's spelling) guarded by the
    // same length >= 3 filter langIdNgram applies before either form
    val spec = rows(df.filter(length(col("text")) >= 3).select(col("doc_id"),
      expr(graft.pipeline.TextAnalysis.langIdGramsExpr(buckets)).as("g")))
    val fast = rows(df.filter(length(col("text")) >= 3).select(col("doc_id"),
      ColumnBridge.column(graft.pipeline.LangGramsExpr(
        ColumnBridge.expression(col("text")), buckets)).as("g")))
    assert(fast == spec)
  }

  test("bigram-feature kernel ≡ column form incl. empty-token / " +
    "single-word / null / non-ASCII texts") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge
    val rnd = new Random(41)
    val vocab = Seq("alpha", "beta", "", "x", "日本", "ß")
    val texts: Seq[String] = (1 to 50).map(_ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")) ++ Seq("", null, "one", "a  b", "a b ", " a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id", "b").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val spec = rows(graft.pipeline.TextAnalysis.bigramFeatsColumns(df))
    val fast = rows(df.select(col("doc_id"),
      explode(ColumnBridge.column(graft.pipeline.BigramHashExpr(
        ColumnBridge.expression(col("text")),
        Dedup.MinhashP, 4096))).as("b")))
    assert(fast == spec)
  }

  test("simhash kernel ≡ aggregation form incl. null/empty/dup-token texts") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new Random(53)
    val vocab = Seq("alpha", "beta", "gamma", "", "x", "日本")
    val texts: Seq[String] = (1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(40))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")) ++ Seq("", null, "one", "a  b")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(rows(Dedup.simhash(df)) == rows(Dedup.simhashColumns(df)))
  }

  test("a null shingle array yields the k-null signature, like the column form") {
    val spark0 = spark
    import spark0.implicits._
    val sh = Seq((1L, null: Seq[String]), (2L, Seq("a b c", "b c d")))
      .toDF("doc_id", "shingles")
    val fast = Dedup.minhashSignatureFromShingles(sh, 4)
      .orderBy("doc_id").collect()
    val spec = Dedup.minhashSignatureFromShinglesColumns(sh, 4)
      .orderBy("doc_id").collect()
    assert(fast.map(_.toString).toSeq == spec.map(_.toString).toSeq)
    assert(fast(0).getSeq[Any](1).forall(_ == null))
  }
}
