package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding merge training and encoding — the
  * token-count-under-a-real-tokenizer unit every data mixture is
  * budgeted in (Sennrich et al. 2016; GPT-2-style pre-tokenization via
  * [[TextAnalysis.BpeSplitRe]]).
  *
  * Scale shape: the sufficient statistic for BPE training is the
  * word-frequency table, so training is ONE distributed shuffle
  * (pre-token explode → groupBy → deterministic top-`vocabCap` by
  * (freq desc, word asc) via TakeOrdered) followed by a driver-side
  * merge loop over ≤ vocabCap rows — the same collect-the-tiny-
  * sufficient-statistic posture as the Lloyd codebook trainers.
  * Production tokenizers train on a bounded sample for exactly this
  * reason; the cap is the documented knob.
  *
  * Determinism & oracle parity: symbols are space-separated strings
  * (pre-token spaces first mapped to Ġ, GPT-2's convention), a merge
  * step picks argmax pair by (weighted count desc, pair string asc),
  * and merge application is a literal string rewrite —
  * `trim(replace(replace(' ' + sym.replace(" ","  ") + ' ',
  * ' l  r ', ' lr '), "  ", " "))` — the exact formula the DuckDB
  * oracle's unrolled CTE chain evaluates, so both engines perform the
  * same left-to-right non-overlapping pass. Encoding applies the
  * trained merges in rank order as nested codegen'd `replace`
  * expressions inside a `transform` lambda — no UDFs. */
object Bpe {

  /** Space marker inside pre-tokens (GPT-2's Ġ, U+0120) — symbol
    * strings stay space-free so space-delimited rewriting is sound. */
  val SpaceMark = "Ġ"

  /** Entry-surface training size, shared with the oracle's unrolled
    * CTE chain (EntryOracle.bpeCtes must unroll exactly this many
    * rounds over exactly this vocab cap). */
  val DefaultMerges = 20
  val DefaultVocabCap = 200

  /** Initial symbol string of a pre-token: Ġ-mapped CODE POINTS joined
    * by single spaces ("hello" → "h e l l o") — code points, not UTF-16
    * units, so the driver agrees with the Spark/DuckDB legs' per-
    * codepoint regex split on non-BMP text. */
  private[graft] def initialSym(tok: String): String = {
    val sb = new StringBuilder
    tok.replace(" ", SpaceMark).codePoints().forEach { cp =>
      if (sb.nonEmpty) sb.append(' ')
      sb.appendAll(Character.toChars(cp))
    }
    sb.toString
  }

  /** Code-point lexicographic compare == UTF-8 byte order == the
    * oracle's varchar ORDER BY (Java String.compareTo is UTF-16
    * code-unit order, which flips supplementary vs U+E000+ chars). */
  private[pipeline] def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** One merge application — THE shared rewrite formula (see object
    * doc); `pair` is "l r". */
  private[graft] def applyMerge(sym: String, pair: String): String = {
    val pat = " " + pair.replace(" ", "  ") + " "
    val rep = " " + pair.replace(" ", "") + " "
    (" " + sym.replace(" ", "  ") + " ")
      .replace(pat, rep).replace("  ", " ").trim
  }

  /** The word-frequency sufficient statistic: distributed pre-token
    * counts, deterministic top-`vocabCap`. */
  def wordFreq(docs: DataFrame, vocabCap: Int): DataFrame =
    docs.select(explode(
        regexp_extract_all(col("text"), lit(TextAnalysis.BpeSplitRe), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(vocabCap)

  /** Driver-side merge loop over a collected (word, freq) table.
    * Returns (rank, pair, merged, cnt) rows, rank 1-based. Throws if a
    * round finds no pair at all (vocab exhausted — raise vocabCap or
    * lower nMerges; silently stopping early would silently diverge
    * from the oracle's fixed unroll). */
  private[graft] def trainOnVocab(vocab: Seq[(String, Long)],
      nMerges: Int): Seq[(Long, String, String, Long)] = {
    var syms = vocab.map { case (w, f) => (initialSym(w), f) }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = scala.collection.mutable.HashMap[String, Long]()
      for ((s, f) <- syms) {
        val parts = s.split(" ")
        var i = 0
        while (i < parts.length - 1) {
          val pr = parts(i) + " " + parts(i + 1)
          counts(pr) = counts.getOrElse(pr, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) throw new IllegalStateException(
        s"BPE round $rank: no pairs left — vocab exhausted before " +
          s"$nMerges merges")
      // argmax by (count desc, pair asc in CODE-POINT order — the
      // oracle's UTF-8 ORDER BY)
      val (bestPair, bestCnt) = counts.toSeq.reduceLeft { (x, y) =>
        if (y._2 > x._2 || (y._2 == x._2 && cpCompare(y._1, x._1) < 0)) y
        else x
      }
      out += ((rank.toLong, bestPair, bestPair.replace(" ", ""), bestCnt))
      syms = syms.map { case (s, f) => (applyMerge(s, bestPair), f) }
    }
    out.result()
  }

  /** BPE merge training end-to-end: (rank, pair, merged, cnt). */
  def trainMerges(docs: DataFrame, nMerges: Int = DefaultMerges,
      vocabCap: Int = DefaultVocabCap): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = wordFreq(docs, vocabCap).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainOnVocab(vocab, nMerges)
      .toDF("rank", "pair", "merged", "cnt")
  }

  /** The Column form of [[applyMerge]] for one merge — nested inside
    * the encode `transform` lambda, all codegen'd string functions. */
  private def applyMergeCol(sym: Column, pair: String): Column = {
    val pat = " " + pair.replace(" ", "  ") + " "
    val rep = " " + pair.replace(" ", "") + " "
    trim(replace(replace(
      concat(lit(" "), replace(sym, lit(" "), lit("  ")), lit(" ")),
      lit(pat), lit(rep)), lit("  "), lit(" ")))
  }

  /** Encode every document under the trained merges and count tokens:
    * (doc_id, n_pretokens, n_bpe_tokens) — one codegen'd
    * [[BpeCountExpr]] pass per document with per-partition distinct-
    * token memoization (Zipf makes instances >> distincts, so each
    * distinct pre-token pays the merge fold once). The merges ride
    * into the kernel as plan constants, so encoding stays a pure
    * narrow per-doc pass — the 100 TB shape. Values are bit-identical
    * to [[encodeExpand]] (shared per-token formula; pinned by
    * BpeKernelParitySpec). */
  def encode(docs: DataFrame, merges: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val counts = ColumnBridge.column(BpeCountExpr(
      ColumnBridge.expression(col("text")),
      broadcastMerges(docs.sparkSession, merges)))
    docs.select(col("doc_id"), counts.as("c"))
      .select(col("doc_id"), col("c.n_pretokens").as("n_pretokens"),
        col("c.n_bpe_tokens").as("n_bpe_tokens"))
  }

  /** Materialize the actual token sequences — the training-data
    * product the counts summarize: (doc_id, tokens array<string>) in
    * document order, via the memoized kernel. A pure narrow per-doc
    * pass like [[encode]]; at 100 TB this is the final tokenize step
    * written alongside the packed-sequence layout
    * ([[Curation.packSequences]]). */
  def encodeTokens(docs: DataFrame, merges: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    docs.select(col("doc_id"), ColumnBridge.column(BpeTokensExpr(
      ColumnBridge.expression(col("text")),
      broadcastMerges(docs.sparkSession, merges)))
      .as("tokens"))
  }

  /** The rank-ordered merge list as a cached broadcast: every surface
    * over one model (encode + encodeTokens, the config `tokens` op
    * across reloads) shares ONE Broadcast per context — see
    * [[Broadcasts]]. */
  private[graft] def broadcastMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[String])
      : org.apache.spark.broadcast.Broadcast[Array[String]] =
    Broadcasts.of(spark, ("bpe-merges", merges.toList))(merges.toArray)

  /** The expression-tree form of [[encode]] (nested codegen'd replaces,
    * no kernel, no memo) — kept as the in-engine parity reference. */
  def encodeExpand(docs: DataFrame, merges: Seq[String]): DataFrame = {
    val toks = regexp_extract_all(col("text"),
      lit(TextAnalysis.BpeSplitRe), lit(0))
    def encTok(t: Column): Column = {
      // (?s) so '.' covers newline chars too — ALL THREE legs (driver
      // codePoints, this regex, the oracle's '(?s).') split the same
      val init = trim(regexp_replace(
        translate(t, " ", SpaceMark), "(?s)(.)", "$1 "))
      merges.foldLeft(init)((s, pr) => applyMergeCol(s, pr))
    }
    docs.select(col("doc_id"),
      size(toks).cast("long").as("n_pretokens"),
      aggregate(transform(toks, encTok _),
        lit(0L), (acc, s) => acc + size(split(s, " ")))
        .as("n_bpe_tokens"))
  }

  /** Train and return JUST the rank-ordered merge pair list — the one
    * extraction every train-then-encode surface shares (so the count
    * and token queries can never train on divergent lists). */
  def trainMergeList(docs: DataFrame, nMerges: Int = DefaultMerges,
      vocabCap: Int = DefaultVocabCap): Seq[String] = {
    val vocab = wordFreq(docs, vocabCap).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainOnVocab(vocab, nMerges).map(_._2)
  }

  /** Train + encode in one call (the `q_bpe_encode` surface). */
  def trainAndEncode(docs: DataFrame, nMerges: Int = DefaultMerges,
      vocabCap: Int = DefaultVocabCap): DataFrame =
    encode(docs, trainMergeList(docs, nMerges, vocabCap))

  /** Train + materialize token sequences (the `q_bpe_tokens` surface). */
  def trainAndEncodeTokens(docs: DataFrame, nMerges: Int = DefaultMerges,
      vocabCap: Int = DefaultVocabCap): DataFrame =
    encodeTokens(docs, trainMergeList(docs, nMerges, vocabCap))
}
