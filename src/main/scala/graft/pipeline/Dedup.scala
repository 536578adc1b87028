package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  * Designed shuffle-first: every variant reduces to a single hash
  * exchange on a bucket key (content hash, LSH band bucket, or blocking
  * key), so at 100 TB the cost is one shuffle of (key, doc_id) pairs —
  * never an all-pairs comparison.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id as
    * canonical. One shuffle on md5(text). */
  def exact(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .groupBy("content_hash")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Word-shingle column: w-gram shingles of the whitespace-tokenized
    * text (the MinHash input). */
  def shingles(docs: DataFrame, w: Int = 3): DataFrame =
    docs.withColumn("words", split(col("text"), " "))
      .withColumn("shingles",
        expr(s"array_distinct(transform(sequence(0, greatest(size(words)-$w, 0)), " +
          s"i -> concat_ws(' ', slice(words, i+1, $w))))"))
      .drop("words")

  /** MinHash signatures: k independent permutations simulated with
    * md5(seed || shingle); the signature element for seed i is the
    * lexicographic min hash. Portable (md5 is engine-independent, so the
    * DuckDB oracle reproduces it exactly) and one narrow pass per doc. */
  def minhashSignature(docs: DataFrame, k: Int = 16, w: Int = 3): DataFrame =
    shingles(docs, w)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .crossJoin(spark_range_df(docs, k))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit("|"), col("sh"))))
        .as("minhash"))

  private def spark_range_df(docs: DataFrame, k: Int): DataFrame =
    docs.sparkSession.range(k).toDF("seed")

  /** MinHash-LSH near-dup pairs: band the signature (b bands × r rows),
    * bucket-join on (band, band-hash), then estimate Jaccard as the
    * fraction of equal signature elements. Only bucket-colliding pairs
    * are compared — the scale path. */
  def minhashPairs(docs: DataFrame, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, w: Int = 3): DataFrame = {
    val r = k / bands
    val sig = minhashSignature(docs, k, w)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("seed"), col("minhash"))))
        .as("sig"))
      .withColumn("sig", expr("transform(sig, s -> s.minhash)"))
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> named_struct('band', b, 'bucket', " +
        s"md5(concat_ws(',', slice(sig, b*$r+1, $r)))))")).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), p -> p))")
          .cast("double") / k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard within a blocking key (default: lang) — the
    * verification pass after LSH candidate generation, or standalone on
    * small blocks. Jaccard on distinct shingle sets is exact rational
    * arithmetic, so it's oracle-checkable. */
  def ngramJaccardPairs(docs: DataFrame, w: Int = 3, threshold: Double = 0.3,
      blockCol: String = "lang"): DataFrame = {
    val sh = shingles(docs, w).select(col("doc_id"), col(blockCol).as("block"),
      col("shingles"))
    val a = sh.as("a")
    val b = sh.as("b")
    a.join(b, col("a.block") === col("b.block") &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.shingles"), col("b.shingles"))))
      .withColumn("uni", size(array_union(col("a.shingles"), col("b.shingles"))))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash fingerprint (64-bit) from token counts: per-token md5-derived
    * bits, weighted-majority per bit position. Near-dups = fingerprints
    * within a small Hamming distance; pairs found by exact-match on
    * rotated fingerprint blocks (4×16-bit block index). */
  def simhash(docs: DataFrame, bits: Int = 32): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      // token hash: first 16 hex chars of md5 → long via conv
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val bitCols = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$b")
    }
    val agg = toks.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val fp = (0 until bits).map { b =>
      when(col(s"b$b") > 0, lit(1L) * math.pow(2, b).toLong).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** Embedding-cosine near-dup pairs within a blocking key (label):
    * exact cosine over candidate pairs. For global scale use
    * [[Similarity.lshBuckets]] as the blocking stage instead. */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.99): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("label"),
      Similarity.normalized(col("embedding")).as("unit"))
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.label") === col("b.label") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Similarity.dot(col("a.unit"), col("b.unit")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
