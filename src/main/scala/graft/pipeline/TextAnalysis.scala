package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The trained Naive-Bayes char-n-gram language-ID model (the
  * [[TextAnalysis.langIdNgram]] sufficient statistic): sorted lang
  * list, per-lang log2 normalizer, the dense smoothed log-likelihood
  * grid flattened ROW-MAJOR (`lcFlat(l * buckets + b)`) as a primitive
  * long[], and the seen-bucket mask. Persistable via
  * [[Models.saveLangId]] / [[Models.loadLangId]]. */
case class LangIdModel(buckets: Int, langs: Seq[String], lnb: Seq[Long],
    lcFlat: Array[Long], seen: Array[Boolean]) {
  require(lcFlat.length == langs.length * buckets,
    s"lcFlat must be the row-major |langs|×buckets grid: " +
      s"${lcFlat.length} != ${langs.length} × $buckets")
}

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language-ID heuristics, and content fingerprinting.
  * All pure Catalyst column expressions — no UDFs, fully codegen'd, and
  * reproducible in the DuckDB oracle.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that")

  def tokens(text: Column): Column = split(text, " ")

  /** Token/char counts + a BPE-ish subword estimate (≈ chars/4 is the
    * standard heuristic for byte-pair encodings). */
  /** GPT-2-style pre-tokenizer split, lookahead-free so Java regex and
    * RE2 (the DuckDB oracle) agree: contraction suffixes, space-glued
    * letter runs, digit runs, punctuation runs. Counting its matches
    * is the standard fast BPE-token estimate (each pre-token becomes
    * ≥1 BPE token; the chars/4 column stays as the cruder bound). */
  val BpeSplitRe: String =
    "'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      length(col("text")).as("n_chars"),
      size(tokens(col("text"))).as("n_tokens"),
      size(array_distinct(tokens(col("text")))).as("n_distinct_tokens"),
      (length(col("text")) / lit(4)).cast("long").as("est_bpe_tokens"),
      regexp_count(col("text"), lit(BpeSplitRe)).cast("long")
        .as("bpe_regex_tokens"))

  /** Quality score: mean token length, type-token ratio, stopword
    * ratio, repetition (1 - distinct/total). Deterministic rational
    * arithmetic + one rounded double. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(stopwords))).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    docs.select(col("doc_id"),
      round(length(col("text")).cast("double") / nTok, 4).as("mean_token_len"),
      round(nDistinct / nTok, 4).as("type_token_ratio"),
      round(nStop / nTok, 4).as("stopword_ratio"),
      round(lit(1.0) - nDistinct / nTok, 4).as("repetition"))
  }

  /** Language-ID heuristic: score = stopword-list hit fraction per
    * language profile; predict the best-scoring profile (n-gram-free
    * variant of the classic stopword profile method). With one profile
    * this is an is-English score. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val enScore = size(filter(toks, t => t.isInCollection(stopwords)))
      .cast("double") / size(toks)
    docs.select(col("doc_id"), col("lang").as("declared_lang"),
      round(enScore, 4).as("en_score"),
      when(enScore >= 0.05, "en").otherwise("other").as("predicted_lang"))
  }

  /** Bucket count for [[langIdNgram]]'s hashed char-3-gram features. */
  val LangIdBuckets: Int = 4096

  /** Fixed-point log2 scale for [[langIdNgram]]: 2^20 units per bit. */
  val LangIdLogScale: Long = 1L << 20

  /** Deterministic fixed-point log2 of a positive integer expression:
    * exponent from the binary-string length (the HLL bitlen trick —
    * Spark `length(conv(x,10,2))` == DuckDB `length(bin(x))`), mantissa
    * by the classic piecewise-linear interpolation log2(2^e + f) ≈
    * e + f/2^e (max error 0.086 bit), everything integer bit ops so
    * both engines produce the IDENTICAL long — no ln(), no doubles
    * (the [[bigramLikelihood]] determinism discipline, but in log
    * space so Naive Bayes products become exact sums). Counts wider
    * than 20 bits pre-shift the fraction, so nothing overflows. */
  private[graft] def log2Fixed(x: String): String = {
    val s = LangIdLogScale
    val e = s"(length(conv(cast(($x) as string), 10, 2)) - 1)"
    s"(cast($e as bigint) * ${s}L + " +
      s"(shiftright(($x) - shiftleft(1L, $e), greatest($e - 20, 0)) * ${s}L) " +
      s"div shiftleft(1L, least($e, 20)))"
  }

  /** DuckDB spelling of [[log2Fixed]] — same bit ops, same longs. */
  private[graft] def log2FixedDuck(x: String): String = {
    val s = LangIdLogScale
    val e = s"(length(bin($x)) - 1)"
    s"(CAST($e AS BIGINT) * $s + " +
      s"((($x - (CAST(1 AS BIGINT) << $e)) >> greatest($e - 20, 0)) * $s) " +
      s"// (CAST(1 AS BIGINT) << least($e, 20)))"
  }

  /** Shared gram expression: hashed char 3-grams of `text` into
    * [[LangIdBuckets]] bins (md5-derived 60-bit hash, the
    * importanceWeights discipline, so the oracle replays it). */
  private[graft] def langIdGramsExpr(buckets: Int): String =
    "transform(sequence(1, length(text) - 2), i -> " +
      "cast(conv(substring(md5(concat('lid:', substring(text, i, 3))), " +
      s"1, 15), 16, 10) as bigint) % ${buckets}L)"

  /** Corpus-trained character-n-gram language ID — the CLD2/langid.py
    * method (Naive Bayes over hashed char 3-grams, uniform prior),
    * replacing [[langId]]'s stopword heuristic with a model FIT ON THE
    * LABELED CORPUS: score(d, lang) = Σ_g [L(c(lang,g)+1) − L(N_lang+B)]
    * with add-one smoothing and L the deterministic fixed-point log2,
    * predict the argmax (ties to the lexicographically largest lang —
    * explicit, not plan-luck). Docs shorter than one gram predict
    * "und" with score 0.
    *
    * Scale shape: pass 1 aggregates the sufficient statistic — the
    * (lang, bucket) count table, ≤ |langs| × buckets rows no matter
    * the corpus size — and collects it (the model); pass 2 joins the
    * BROADCAST dense profile grid back over the gram stream and
    * reduces per (doc, lang) with map-side partial aggregation. Two
    * corpus passes, the corpus never reshuffled except by doc_id.
    * Reference behavior anchor: riemann has no text ops; this is the
    * curation-pipeline layer (cf. CCNet's fastText LID stage). */
  def langIdNgram(docs: DataFrame,
      buckets: Int = LangIdBuckets): DataFrame =
    langIdApply(docs, langIdModel(docs, buckets))

  /** PREDICT pass of [[langIdNgram]] under an already-trained model —
    * the production shape: train once ([[langIdModel]]), persist
    * ([[Models.saveLangId]]), apply the reloaded artifact to every
    * subsequent corpus without re-training. */
  def langIdApply(docs: DataFrame, m: LangIdModel): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    // predict = ONE narrow codegen'd projection: the NB score is a pure
    // per-document function of the tiny trained grid, so the column
    // form's gram explode × |langs| broadcast-join × (doc, lang)
    // aggregation (a corpus-scale exchange) collapses into the scorer
    // kernel; langIdNgramColumns keeps the join form as the parity pin
    docs.select(col("doc_id"), col("lang").as("declared_lang"),
        ColumnBridge.column(LangScoreExpr(
          ColumnBridge.expression(col("text")),
          broadcastModel(docs.sparkSession, m))).as("w"))
      .select(col("doc_id"), col("declared_lang"),
        col("w.predicted_lang").as("predicted_lang"),
        col("w.nb_score").as("nb_score"))
  }

  /** The trained grid as a cached broadcast keyed by model CONTENT
    * (LangIdModel carries arrays, whose case-class equality is by
    * reference — the key lists restore structural identity): the
    * predict and annotate faces of one model, and config reloads that
    * re-load one artifact, share ONE Broadcast per context. */
  private def broadcastModel(spark: org.apache.spark.sql.SparkSession,
      m: LangIdModel): org.apache.spark.broadcast.Broadcast[LangIdModel] =
    Broadcasts.of(spark, ("langid", (m.buckets, m.langs.toList,
      m.lnb.toList, m.lcFlat.toList, m.seen.toList)))(m)

  /** In-place annotation form of [[langIdApply]] for pipelines that
    * must keep their own shape (the config-stream `"op":"langid"`):
    * adds `predicted_lang` + `nb_score` next to the existing columns —
    * one narrow codegen'd projection over `text`, stateless on a
    * stream. */
  def langIdAnnotate(df: DataFrame, m: LangIdModel): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(!df.columns.contains("predicted_lang") &&
      !df.columns.contains("nb_score"),
      "langid output columns predicted_lang/nb_score already exist")
    require(!df.columns.contains("__graft_ls"),
      "langid reserves column __graft_ls")
    df.withColumn("__graft_ls", ColumnBridge.column(LangScoreExpr(
        ColumnBridge.expression(col("text")),
        broadcastModel(df.sparkSession, m))))
      .withColumn("predicted_lang", col("__graft_ls.predicted_lang"))
      .withColumn("nb_score", col("__graft_ls.nb_score"))
      .drop("__graft_ls")
  }

  /** Pass 1 of [[langIdNgram]]: the (lang, bucket) sufficient
    * statistic — bounded at |langs| × `buckets` rows no matter the
    * corpus — collected and shaped for the scorer kernel: sorted lang
    * list, per-lang log2 normalizer, dense smoothed log-likelihood
    * grid over SEEN buckets, and the seen mask (grams hashing to an
    * unseen bucket don't score — the inner-join semantics). Costs are
    * computed with [[Unigram.l2]], the driver spelling of
    * [[log2Fixed]], so they equal the SQL-computed ones bit for bit. */
  private[graft] def langIdModel(docs: DataFrame, buckets: Int = LangIdBuckets)
      : LangIdModel = {
    import org.apache.spark.sql.graft.ColumnBridge
    val counts = docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        explode(ColumnBridge.column(
          LangGramsExpr(ColumnBridge.expression(col("text")), buckets)))
          .as("b"))
      .filter(col("lang").isNotNull)
      .groupBy("lang", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val langs = counts.map(_._1).distinct.sorted.toSeq
    val cMap = counts.map { case (l, b, c) => (l, b) -> c }.toMap
    val nLang = counts.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    val seen = Array.fill(buckets)(false)
    counts.foreach { case (_, b, _) => seen(b.toInt) = true }
    val lnb = langs.map(l => Unigram.l2(nLang(l) + buckets))
    // dense row-major |langs| × buckets grid as a primitive long[] —
    // ships compactly inside the task binary (no boxed nested Seqs)
    val lcFlat = new Array[Long](langs.length * buckets)
    for (l <- langs.indices; b <- 0 until buckets if seen(b))
      lcFlat(l * buckets + b) =
        Unigram.l2(cMap.getOrElse((langs(l), b.toLong), 0L) + 1)
    LangIdModel(buckets, langs, lnb, lcFlat, seen)
  }

  /** The broadcast-join (column) form of [[langIdNgram]]'s predict
    * pass — the DuckDB oracle's formulation, kept as the scorer
    * kernel's parity pin (PipelineSpec). */
  private[graft] def langIdNgramColumns(docs: DataFrame,
      buckets: Int = LangIdBuckets): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    def grams = docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        explode(ColumnBridge.column(
          LangGramsExpr(ColumnBridge.expression(col("text")), buckets)))
          .as("b"))
    val counts = grams.filter(col("lang").isNotNull)
      .groupBy("lang", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val langs = counts.map(_._1).distinct.sorted.toSeq
    val seenB = counts.map(_._2).distinct.sorted.toSeq
    val cMap = counts.map { case (l, b, c) => (l, b) -> c }.toMap
    val nLang = counts.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    // dense (lang × seen-bucket) grid of smoothed log-likelihoods and
    // the per-lang normalizer — both tiny, both broadcast
    val grid = langs.flatMap(l => seenB.map(b =>
        (l, b, cMap.getOrElse((l, b), 0L)))).toDF("lang", "b", "c")
      .select(col("lang"), col("b"), expr(log2Fixed("c + 1")).as("lc"))
    val nl = langs.map(l => (l, nLang(l) + buckets))
      .toDF("lang", "nbt")
      .select(col("lang"), expr(log2Fixed("nbt")).as("lnb"))
    val pred = grams.drop("lang")
      .join(broadcast(grid), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("lc")).as("sl"), count(lit(1)).as("ng"))
      .join(broadcast(nl), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        (col("sl") - col("ng") * col("lnb")).as("score"))
      .groupBy("doc_id")
      .agg(max(struct(col("score"), col("lang"))).as("w"))
    docs.select(col("doc_id"), col("lang").as("declared_lang"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("doc_id"), col("declared_lang"),
        coalesce(col("w.lang"), lit("und")).as("predicted_lang"),
        coalesce(col("w.score"), lit(0L)).as("nb_score"))
  }

  /** TF-IDF top terms per document: tf = term count / doc length,
    * idf = ln(N / df), keep the `topK` highest-scoring terms per doc
    * (ties after rounding broken by term). Shuffle shape at scale: one
    * explode + (doc, term) aggregation, a term-keyed df aggregation,
    * one join back on term — all hash-partitioned equijoins, no
    * all-pairs anything. */
  def tfIdf(docs: DataFrame, topK: Int = 5): DataFrame = {
    val n = docs.count()
    val terms = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    // both branches grow from the SAME (doc_id, term) aggregate, so the
    // explode and its shuffle are one reused exchange — a separate
    // distinct() subplan for df would tokenize the corpus twice
    val tfBase = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    val tf = tfBase.withColumn("doc_len",
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")))
    val df = tfBase.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("tfidf", round(
        (col("cnt").cast("double") / col("doc_len")) *
          log(lit(n.toDouble) / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .select("doc_id", "term", "tfidf", "rk")
  }

  /** Okapi BM25 retrieval scoring (Robertson et al., TREC-3) — the
    * standard ranked-search companion to [[tfIdf]]: per document,
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) over the
    * query's terms, idf = ln(1 + (N−df+0.5)/(df+0.5)). Used in
    * curation as the "find documents about X" primitive (topical
    * subset extraction, eval-set retrieval).
    *
    * Scale shape: the explode is filtered to the query's terms BEFORE
    * the (doc, term) aggregation, so the shuffle carries only matching
    * rows; the |terms|-row df relation is broadcast; one join back to
    * doc lengths; top-k under the usual row_number window. Per-term
    * scores are rounded to 9 decimals and summed as DECIMAL so the
    * per-doc total is independent of addition order (a raw double Σ
    * can differ in the last ulp between partition merge orders). */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    require(queryTerms.nonEmpty, "need at least one query term")
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("dl"))
    // r21: ONE stats pass — count and token total come out of the same
    // aggregation job (they were two sequential barriers, each a full
    // corpus scan at scale)
    val stats = lens.agg(count(lit(1)), sum(col("dl"))).head()
    val n = stats.getLong(0)
    // an empty corpus would make sum(dl) NULL (opaque NPE at getLong)
    // and avgdl 0/0 — fail with the actual problem instead
    require(n > 0, "bm25: empty corpus (no documents to rank)")
    val totTok = stats.getLong(1)
    val avgdl = totTok.toDouble / n
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfRel), "term")
      .join(lens, "doc_id")
      .withColumn("idf", log(lit(1.0) +
        (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("s", col("idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
      .withColumn("s9",
        round(col("s"), 9).cast(DecimalType(38, 9)))
    val ranked = scored.groupBy("doc_id")
      .agg(round(sum(col("s9")).cast("double"), 6).as("bm25"),
        count(lit(1)).cast("int").as("n_terms_hit"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("rk") <= topK)
    ranked.select("doc_id", "bm25", "n_terms_hit", "rk")
  }

  /** Benchmark decontamination: the fraction of each document's w-gram
    * shingles that appear in ANY benchmark document — the standard
    * train/test-overlap check before training. The benchmark shingle
    * set is distinct-deduped and joined on the shingle (hash-partitioned
    * equijoin; broadcast when the benchmark is small), so the cost is
    * one shuffle of the corpus' exploded shingles. */
  /** Corpus-trained bigram language-model likelihood — the CCNet-style
    * LM quality filter's shape (score each document under a model of
    * the corpus; low likelihood = noise/garble, tails get dropped), in
    * fully deterministic arithmetic: per-bigram add-one-smoothed
    * conditional likelihood (c(w1 w2)+1)/(c(w1)+V) as an IEEE double
    * of exact longs, floored to a 1e-6-scaled long; the document score
    * is the mean of those terms (monotone in the smoothed likelihood —
    * an LM-likelihood signal, deliberately NOT log-perplexity: ln()
    * is not bit-identical across engines, long division and floor
    * are). Scale shape: two corpus-level aggregations (bigram and
    * prefix counts) joined back on their own keys — co-partitioned
    * hash joins, no broadcast of the (large) count tables. */
  def bigramLikelihood(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      // single-token docs MUST drop here: sequence(1, 0) is Spark's
      // DESCENDING [1, 0] (not DuckDB's empty series) — ws[1] throws
      // under ANSI, and phantom null bigrams would poison V otherwise
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws)-1), " +
          "i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val biCounts = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val prefixCounts = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = bi.agg(countDistinct(col("w2")).as("v"))
    bi.join(biCounts, Seq("w1", "w2"))
      .join(prefixCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(lit(1e6) * (col("c12") + 1).cast("double") /
          (col("c1") + col("v")).cast("double")).as("tl"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("tl")).as("s"))
      // half-up rounding of the exact rational mean in INTEGER
      // arithmetic — round(double, 6) disagrees across engines exactly
      // at .5 micro-unit boundaries (sf0.1 hit one); (2s+n) div (2n)
      // is the same half-up value, bit-identical everywhere
      .select(col("doc_id"), col("n_bigrams"),
        (expr("(2*s + n_bigrams) div (2*n_bigrams)").cast("double") /
          1e6).as("lm_score"))
  }

  /** DSIR-shape importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each raw
    * document by how target-like its hashed-bigram features are, for
    * importance resampling toward a target domain. Features are md5
    * bigram hashes into `buckets` bins (the paper's hashed n-gram
    * model); per-feature ratio = p̂_target(b) / p̂_raw(b) with add-one
    * smoothing, composed as exact-long doubles and floored to a
    * 1e-6-scaled long; the document weight is the mean ratio (a
    * monotone importance signal — the paper's log-sum needs ln(),
    * which is not bit-identical across engines; long division and
    * floor are). Scale: two bounded-size (≤ `buckets` rows) count
    * tables broadcast back over one narrow feature pass. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = 4096): DataFrame = {
    // hashed-bigram features via the codegen'd kernel — the column
    // form (featsColumns, the DuckDB oracle's spelling and the parity
    // pin) md5s per bigram in an interpreted lambda, and this relation
    // is consumed three times
    def feats(docs: DataFrame): DataFrame = {
      import org.apache.spark.sql.graft.ColumnBridge
      docs.select(col("doc_id"),
        explode(ColumnBridge.column(BigramHashExpr(
          ColumnBridge.expression(col("text")), Dedup.MinhashP, buckets)))
          .as("b"))
    }
    val rawF = feats(raw)
    val tCounts = feats(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val rCounts = rawF.groupBy("b").agg(count(lit(1)).as("cr"))
    val totals = tCounts.agg(sum(col("ct")).as("nt"))
      .crossJoin(rCounts.agg(sum(col("cr")).as("nr")))
    rawF
      .join(broadcast(rCounts), Seq("b"))
      .join(broadcast(tCounts), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        // association mirrored exactly in the oracle: 1e6 × (num / den)
        floor(lit(1e6) * (
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double") *
            (col("nr") + buckets).cast("double")) /
          ((col("nt") + buckets).cast("double") *
            (col("cr") + 1).cast("double")))).as("tw"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("tw")).as("s"))
      // same integer half-up mean as bigramLikelihood (see there)
      .select(col("doc_id"), col("n_feats"),
        (expr("(2*s + n_feats) div (2*n_feats)").cast("double") /
          1e6).as("importance"))
  }

  /** The interpreted-lambda (column) spelling of
    * [[importanceWeights]]'s feature pass — the DuckDB oracle's
    * formulation, kept as the kernel's parity pin
    * (MinhashParitySpec). */
  private[graft] def bigramFeatsColumns(docs: DataFrame,
      buckets: Int = 4096): DataFrame = docs
    .select(col("doc_id"), split(col("text"), " ").as("ws"))
    // see bigramLikelihood: sequence(1, 0) descends on 1-token docs
    .filter(size(col("ws")) >= 2)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(ws)-1), " +
        s"i -> CAST(conv(substring(md5(concat(ws[i-1], ' ', ws[i])), 1, 15), 16, 10) AS BIGINT) % ${Dedup.MinhashP}L)"))
      .as("h"))
    .select(col("doc_id"), (col("h") % buckets).cast("int").as("b"))

  def contamination(docs: DataFrame, benchmark: DataFrame,
      w: Int = 3): DataFrame =
    contaminationFromShingles(Dedup.shingles(docs, w), benchmark, w)

  /** [[contamination]] from a pre-shingled (doc_id, shingles) relation
    * — shares the tokenize+shingle pass with the funnel's near-dup
    * stage instead of re-scanning the survivors. */
  def contaminationFromShingles(docShingles: DataFrame,
      benchmark: DataFrame, w: Int = 3): DataFrame = {
    val ds = docShingles
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val bs = Dedup.shingles(benchmark, w)
      .select(explode(col("shingles")).as("sh")).distinct()
      .withColumn("_hit", lit(1))
    ds.join(bs, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }

  /** Winnowing fingerprints (Schleimer et al. 2003): sorted distinct
    * selected k-gram hashes per document as `fps: array<long>` — a
    * position-robust span-level signature (any verbatim shared
    * substring of length ≥ k+w-1 guarantees a shared fingerprint).
    * Hot path: one codegen'd [[WinnowExpr]] pass per document, no
    * explode, no shuffle; [[winnowColumns]] is the column-form spec it
    * is parity-pinned to (WinnowParitySpec), and — modulo syntax — the
    * DuckDB oracle's formulation. */
  def winnow(docs: DataFrame, k: Int = 20, w: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    docs.select(col("doc_id"), ColumnBridge.column(
      graft.pipeline.WinnowExpr(
        ColumnBridge.expression(col("text")), k, w)).as("fps"))
  }

  /** The column-expression spec of [[winnow]]: stride-1 char k-grams
    * hashed with the MinHash md5-prefix scheme, then each w-window's
    * minimum, distinct + sorted. O(n·w) interpreted lambdas — kept as
    * the executable reference, not the hot path. */
  private[graft] def winnowColumns(docs: DataFrame, k: Int, w: Int): DataFrame =
    docs
      // greatest() skips nulls, so without the explicit guard a null
      // text would produce [null] instead of null (the kernel's value)
      .withColumn("hs", expr(
        s"CASE WHEN text IS NULL THEN NULL ELSE " +
        s"transform(sequence(0, greatest(length(text)-$k, 0)), i -> " +
        s"CAST(conv(substring(md5(substring(text, i+1, $k)), 1, 15), 16, 10) " +
        s"AS BIGINT) % ${Dedup.MinhashP}L) END"))
      .withColumn("fps", expr(
        s"CASE WHEN hs IS NULL THEN NULL ELSE " +
        s"sort_array(array_distinct(transform(sequence(0, greatest(size(hs)-$w, 0)), " +
        s"s -> array_min(slice(hs, s+1, $w))))) END"))
      .select(col("doc_id"), col("fps"))

  /** Content fingerprint: md5 over the sorted distinct token bag —
    * word-order-insensitive near-dup key (cheap complement to MinHash). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
        .as("bag_fingerprint"),
      md5(col("text")).as("exact_fingerprint"))

  /** Token k-gram multiset from a MATERIALIZED token-array column `w`
    * (NOT deduped — repetition signals need multiplicity, unlike
    * [[Dedup.shingles]]). Referencing a pre-split column matters: HOF
    * lambdas are interpreted and re-evaluate their subtrees, so an
    * inline `split(text)` would re-split the document once per gram
    * position — O(tokens²) string work. Guarded against Spark's
    * descending-sequence inference on short docs. */
  private def gramList(k: Int): Column = {
    // element_at chain, not concat_ws(slice(...)): slice allocates a
    // k-element array per gram before joining it
    val parts = (0 until k).map(j =>
      if (j == 0) s"element_at(w, i)" else s"element_at(w, i + $j)")
      .mkString(", ' ', ")
    when(size(col("w")) >= k, expr(
      s"transform(sequence(1, size(w) - ${k - 1}), i -> concat($parts))"))
      .otherwise(array().cast("array<string>"))
  }

  /** Combined Gopher-rules document filter (Rae et al. 2021 §A1.1,
    * public paper; thresholds adapted to whitespace tokens): word count
    * in [minWords, maxWords], mean token length in [3, 10], at least 2
    * stopwords, symbol-to-token ratio ('#' or ellipsis) ≤ 0.1, and a
    * duplicate-3-gram fraction (1 − distinct/total, the in-row proxy
    * for the paper's char-weighted metric) ≤ 0.3. Emits each signal,
    * each rule verdict, and the conjunction — as ONE narrow codegen'd
    * projection, no shuffle, so at 100 TB the filter rides the scan. */
  /** The five Gopher signals over a relation carrying `text` and a
    * MATERIALIZED token-array column `w`: (nTok, meanLen, nStop,
    * symRatio, dup3) — the COLUMN-form spec [[GopherExpr]] is
    * parity-pinned against (kept executable via
    * [[gopherFilterColumns]]; the hot path is the kernel). */
  private def gopherSignals: (Column, Column, Column, Column, Column) = {
    val nTok = size(col("w"))
    val meanLen = round(length(col("text")).cast("double") /
      nTok.cast("double"), 4)
    val nStop = size(filter(col("w"), t => t.isInCollection(stopwords)))
    val symRatio = round(regexp_count(col("text"), lit("#|\\.\\.\\."))
      .cast("double") / nTok.cast("double"), 4)
    val g3 = gramList(3)
    val dup3 = round(when(size(g3) > 0,
      lit(1.0) - size(array_distinct(g3)).cast("double") /
        size(g3).cast("double")).otherwise(0.0), 4)
    (nTok, meanLen, nStop, symRatio, dup3)
  }

  /** The Gopher rule conjunction over [[GopherKernel.signalStruct]]
    * fields rooted at `g` — shared by [[gopherFilter]] and
    * [[gopherKeep]], so the two can never drift. */
  private def gopherRules(g: Column, minWords: Int,
      maxWords: Int): Seq[(String, Column)] = Seq(
    "ok_words" -> (g("n_tokens") >= minWords && g("n_tokens") <= maxWords),
    "ok_token_len" ->
      (g("mean_token_len") >= 3.0 && g("mean_token_len") <= 10.0),
    "ok_stopwords" -> (g("n_stopwords") >= 2),
    "ok_symbols" -> (g("symbol_ratio") <= 0.1),
    "ok_repetition" -> (g("dup_3gram_frac") <= 0.3))

  private def gopherStruct: Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(GopherExpr(ColumnBridge.expression(col("text"))))
  }

  /** [[gopherFilter]] survivors with the INPUT columns preserved — the
    * curation-funnel shape. Same rules (shared [[GopherExpr]] kernel +
    * [[gopherRules]]; survivor set pinned equal in PipelineSpec),
    * applied as one narrow kernel filter: no doc_id join, no shuffle —
    * at 100 TB the quality stage rides the scan. */
  def gopherKeep(docs: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val keep = gopherRules(col("_g"), minWords, maxWords)
      .map(_._2).reduce(_ && _)
    docs.withColumn("_g", gopherStruct).filter(keep).drop("_g")
  }

  /** [[gopherKeep]]'s verdict carried as a boolean COLUMN instead of a
    * filter — the r22 curation-funnel shape (one cached corpus relation
    * serves both the corpus count and the quality stage; the verdict
    * rides along). Same shared kernel + [[gopherRules]], so the flag
    * cannot drift from gopherKeep/gopherFilter. */
  def gopherKeepFlagged(docs: DataFrame, flag: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val keep = gopherRules(col("_g"), minWords, maxWords)
      .map(_._2).reduce(_ && _)
    docs.withColumn("_g", gopherStruct).withColumn(flag, keep).drop("_g")
  }

  def gopherFilter(docs: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val base = docs.select(col("doc_id"), gopherStruct.as("_g"))
    val rules = gopherRules(col("_g"), minWords, maxWords)
    base.select(Seq(col("doc_id"), col("_g.n_tokens").as("n_tokens"),
      col("_g.mean_token_len").as("mean_token_len"),
      col("_g.n_stopwords").as("n_stopwords"),
      col("_g.symbol_ratio").as("symbol_ratio"),
      col("_g.dup_3gram_frac").as("dup_3gram_frac")) ++
      rules.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep",
        col("ok_words") && col("ok_token_len") && col("ok_stopwords") &&
          col("ok_symbols") && col("ok_repetition"))
  }

  /** The column-expression spec of [[gopherFilter]] — HOF lambdas, no
    * kernel; the executable reference GopherExpr is parity-pinned to
    * (PipelineSpec), and, modulo syntax, the DuckDB oracle's
    * formulation. */
  private[graft] def gopherFilterColumns(docs: DataFrame,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("w"))
    val (nTok, meanLen, nStop, symRatio, dup3) = gopherSignals
    base.select(col("doc_id"), nTok.as("n_tokens"),
      meanLen.as("mean_token_len"), nStop.as("n_stopwords"),
      symRatio.as("symbol_ratio"), dup3.as("dup_3gram_frac"),
      (nTok >= minWords && nTok <= maxWords).as("ok_words"),
      (meanLen >= 3.0 && meanLen <= 10.0).as("ok_token_len"),
      (nStop >= 2).as("ok_stopwords"),
      (symRatio <= 0.1).as("ok_symbols"),
      (dup3 <= 0.3).as("ok_repetition"))
      .withColumn("keep",
        col("ok_words") && col("ok_token_len") && col("ok_stopwords") &&
          col("ok_symbols") && col("ok_repetition"))
  }

  /** Gopher-style within-document repetition signals (Rae et al. 2021
    * §A1.1 quality filters, public method): share of the single most
    * frequent bigram, and the fraction of bigram / trigram occurrences
    * that are duplicates (occurrences beyond each gram's first). High
    * values mark boilerplate and degenerate generations. One explode +
    * one (doc, gram) aggregation per gram size — the tf-idf shuffle
    * shape, linear in corpus tokens, no all-pairs anywhere. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    // repetition is a pure per-document function: the kernel computes
    // all three fractions in one map-side pass with NO exchange at all
    // (the aggregation spec below shuffles every (doc, gram) twice);
    // inline() of the 0-or-1 struct reproduces the drop semantics for
    // null texts and docs too short for trigrams
    import org.apache.spark.sql.graft.ColumnBridge
    docs.select(col("doc_id"), inline(ColumnBridge.column(
      RepetitionExpr(ColumnBridge.expression(col("text"))))))
  }

  private[graft] def repetitionSignalsColumns(docs: DataFrame): DataFrame = {
    // ONE pass: both gram sizes explode together under a size tag, so
    // the text is split once and there is a single (doc, k, gram)
    // shuffle + no self-join (the two-branch form cost a second scan
    // and a join at the end). The size tag rides as a one-char string
    // prefix — exploding flat strings beats exploding structs, and the
    // tag keeps the two gram spaces disjoint in one aggregation.
    val tagged = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(concat(
        transform(gramList(2), g => concat(lit("2"), g)),
        transform(gramList(3), g => concat(lit("3"), g)))).as("tg"))
    val perK = tagged.groupBy("doc_id", "tg").agg(count(lit(1)).as("c"))
      .withColumn("k", substring(col("tg"), 1, 1).cast("int"))
      .groupBy("doc_id", "k").agg(
        max("c").as("mx"), sum("c").as("tot"), count(lit(1)).as("nd"))
    def only(k: Int, c: Column) = max(when(col("k") === k, c))
    perK.groupBy("doc_id").agg(
      round(only(2, col("mx")) / only(2, col("tot")).cast("double"), 4)
        .as("top_bigram_frac"),
      round((only(2, col("tot")) - only(2, col("nd"))) /
        only(2, col("tot")).cast("double"), 4).as("dup_2gram_frac"),
      round((only(3, col("tot")) - only(3, col("nd"))) /
        only(3, col("tot")).cast("double"), 4).as("dup_3gram_frac"))
      // a doc too short for trigrams has no k=3 group: drop it, matching
      // the oracle's inner join across gram sizes
      .filter(col("dup_3gram_frac").isNotNull)
  }

  /** PII surface scan: counts of email / IPv4 / phone-shaped spans per
    * document — the redaction pre-pass every public-web training
    * pipeline runs. Regexes stay in the RE2-compatible subset (no
    * lookaround) so the same pattern runs on any engine; pure codegen'd
    * regexp_count, one narrow pass. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"
  def piiScan(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Re)).as("n_ipv4"),
      regexp_count(col(textCol), lit(PhoneRe)).as("n_phones"))
}
