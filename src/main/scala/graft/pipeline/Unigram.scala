package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Unigram-LM (SentencePiece-style) tokenizer — the
  * second of the two standard subword algorithms (Kudo 2018,
  * "Subword Regularization"; the [[Bpe]] module is the first), built
  * the same way: the distributed job only ever computes the bounded
  * word-frequency sufficient statistic, training runs as a
  * deterministic loop on the driver, and encoding is a pure per-row
  * Catalyst expression chain with the trained model riding along as
  * plan literals.
  *
  * Algorithm (hard-EM, every step integer arithmetic so the DuckDB
  * oracle replays it bit for bit):
  *   1. seed: all ≤[[MaxPieceLen]]-char substrings of the top
  *      [[VocabCap]] pre-tokens, frequency-weighted; keep every single
  *      character plus the top [[SeedMultis]] multi-char pieces by
  *      (count desc, piece asc); initial piece cost = fixed-point
  *      −log2 likelihood with add-one smoothing
  *      ([[TextAnalysis.log2Fixed]] — no ln(), no doubles).
  *   2. E-step (Viterbi): segment each vocab word by the min-cost
  *      dynamic program (ties broken by fewer tokens via the
  *      cost·64+1 packing, then by SMALLEST split point — explicit,
  *      not plan-luck) and count frequency-weighted piece usage along
  *      the backtraced path.
  *   3. M-step + prune: keep singles plus the top [[TargetMultis]]
  *      used multi-char pieces by (usage desc, piece asc); final cost
  *      = smoothed fixed-point −log2 of the usage distribution.
  *
  * Encoding scores each document's pre-tokens under the final vocab
  * with the same DP: per (doc, distinct pre-token) — Zipf makes
  * instances ≫ distincts — as [[MaxWordLen]] sequential projections
  * over plain columns (each b_i references the b_j columns, so the
  * plan stays linear and codegen'd; no UDF, no kernel). Pre-tokens
  * longer than [[MaxWordLen]] fall back to one-token-per-char at
  * [[UnkCost]] (mirrored exactly in the oracle). Scale shape: one
  * (doc_id, word) partial-agg exchange + one doc_id rollup; the model
  * is a ≤ ~200-entry literal map.
  *
  * Spaces inside pre-tokens map to Ġ ([[Bpe.SpaceMark]], GPT-2's
  * convention) exactly as in BPE, so the two tokenizers share the
  * pre-token universe and their token counts are comparable inputs to
  * [[Curation.mixturePlan]].
  */
object Unigram {

  /** Training words longer than this are dropped from the vocab fit;
    * encode-time words longer than this take the per-char fallback. */
  val MaxWordLen = 12

  /** Longest candidate subword piece. */
  val MaxPieceLen = 4

  /** Seed multi-char pieces kept before EM. */
  val SeedMultis = 150

  /** Multi-char pieces surviving the prune. */
  val TargetMultis = 60

  /** Training pre-token vocabulary size (the [[Bpe]] cap). */
  val VocabCap = 200

  private val S: Long = TextAnalysis.LangIdLogScale

  /** Cost of an out-of-vocab single character (and the per-char
    * fallback rate for over-long words): 30 bits in fixed point —
    * worse than any trained piece, still finite. */
  val UnkCost: Long = 30L * S

  /** Driver spelling of [[TextAnalysis.log2Fixed]] — the identical
    * integer formula, so driver-trained costs equal the oracle's
    * SQL-computed ones. */
  private[graft] def l2(x: Long): Long = {
    require(x >= 1, s"l2 needs x >= 1, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val f = x - (1L << e)
    val sh = math.max(e - 20, 0)
    e.toLong * S + ((f >> sh) * S) / (1L << math.min(e, 20))
  }

  /** Code-point vector of a word (so driver substrings agree with the
    * two engines' per-character substr on non-BMP text). */
  private def cps(w: String): Array[String] = {
    val b = Array.newBuilder[String]
    w.codePoints().forEach(cp => b += new String(Character.toChars(cp)))
    b.result()
  }

  private def cpLt(a: String, b: String): Boolean =
    Bpe.cpCompare(a, b) < 0

  /** The trained model: (piece, usage, cost) sorted by piece in
    * code-point order. */
  def trainOnWords(words0: Seq[(String, Long)])
      : Seq[(String, Long, Long)] = {
    val words = words0
      .map { case (w, f) => (w.replace(" ", Bpe.SpaceMark), f) }
      .map { case (w, f) => (cps(w), f) }
      .filter { case (a, _) => a.length >= 1 && a.length <= MaxWordLen }
    require(words.nonEmpty, "unigram training needs a non-empty corpus")
    // 1. seed counts over all short substrings
    val cnts = scala.collection.mutable.HashMap.empty[String, Long]
    for ((a, f) <- words; i <- a.indices;
         l <- 1 to math.min(MaxPieceLen, a.length - i)) {
      val p = a.slice(i, i + l).mkString
      cnts(p) = cnts.getOrElse(p, 0L) + f
    }
    val singles = cnts.keys.filter(cps(_).length == 1).toSeq
      .sortWith(cpLt)
    val multis = cnts.toSeq.filter { case (p, _) => cps(p).length >= 2 }
      .sortWith((x, y) => x._2 > y._2 ||
        (x._2 == y._2 && cpLt(x._1, y._1)))
      .take(SeedMultis).map(_._1)
    val vocab0 = singles ++ multis
    val t0 = vocab0.map(cnts).sum
    val cost0: Map[String, Long] =
      vocab0.map(p => p -> (l2(t0 + vocab0.size) - l2(cnts(p) + 1))).toMap
    // 2. hard-EM round: Viterbi segment every vocab word, count usage
    val usage = scala.collection.mutable.HashMap.empty[String, Long]
    for ((a, f) <- words) {
      val n = a.length
      val b = new Array[Long](n + 1)
      val bj = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        var best = Long.MaxValue
        var bestJ = -1
        var j = math.max(0, i - MaxPieceLen)
        while (j < i) {
          val p = a.slice(j, i).mkString
          // every single char of a training word is a seeded single,
          // so a finite path always exists; multi-char pieces outside
          // the seed are simply not candidates
          val pcOpt = cost0.get(p)
          if (pcOpt.isDefined) {
            val v = b(j) + pcOpt.get * 64 + 1
            if (v < best) { best = v; bestJ = j } // strict < → smallest j
          }
          j += 1
        }
        b(i) = best; bj(i) = bestJ
        i += 1
      }
      var pos = n
      while (pos > 0) {
        val j = bj(pos)
        val p = a.slice(j, pos).mkString
        usage(p) = usage.getOrElse(p, 0L) + f
        pos = j
      }
    }
    // 3. prune to singles + top-used multis, rescore on usage
    val multisKept = multis.filter(p => usage.getOrElse(p, 0L) >= 1)
      .sortWith((x, y) => usage(x) > usage(y) ||
        (usage(x) == usage(y) && cpLt(x, y)))
      .take(TargetMultis)
    val vocab1 = singles ++ multisKept
    val t1 = vocab1.map(p => usage.getOrElse(p, 0L)).sum
    vocab1.map(p => (p, usage.getOrElse(p, 0L),
        l2(t1 + vocab1.size) - l2(usage.getOrElse(p, 0L) + 1)))
      .sortWith((x, y) => cpLt(x._1, y._1))
  }

  /** Fit on the distributed word-frequency statistic (ONE shuffle +
    * a ≤[[VocabCap]]-row collect, the [[Bpe.trainMerges]] posture). */
  def trainModel(docs: DataFrame): Seq[(String, Long, Long)] =
    trainOnWords(Bpe.wordFreq(docs, VocabCap).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq)

  /** The `q_unigram_train` surface: (piece, usage, cost). */
  def train(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainModel(docs).toDF("piece", "usage", "cost")
  }

  /** Encode every document under a trained model:
    * (doc_id, n_pretokens, n_unigram_tokens, total_cost) — counts and
    * the summed fixed-point −log2 cost of the Viterbi segmentations.
    * Hot path: the memoized per-pre-token DP kernel
    * ([[UnigramCountExpr]]) — ONE narrow codegen'd projection, no
    * exchange; [[encodeColumns]] keeps the original projection-chain
    * form as the parity oracle (UnigramSpec pins equality). */
  def encode(docs: DataFrame,
      model: Seq[(String, Long, Long)]): DataFrame = {
    require(model.nonEmpty, "unigram encode needs a non-empty model")
    import org.apache.spark.sql.graft.ColumnBridge
    docs.select(col("doc_id"), ColumnBridge.column(UnigramCountExpr(
        ColumnBridge.expression(col("text")),
        broadcastCosts(docs, model))).as("u"))
      .select(col("doc_id"), col("u.n_pretokens").as("n_pretokens"),
        col("u.n_unigram_tokens").as("n_unigram_tokens"),
        col("u.total_cost").as("total_cost"))
  }

  /** The projection-chain (column) form of [[encode]] — the DuckDB
    * oracle's formulation, kept as the kernel's parity pin. */
  private[graft] def encodeColumns(docs: DataFrame,
      model: Seq[(String, Long, Long)]): DataFrame = {
    require(model.nonEmpty, "unigram encode needs a non-empty model")
    val costMap = map(model.flatMap { case (p, _, c) =>
      Seq(lit(p), lit(c)) }: _*)
    val words = docs
      .select(col("doc_id"), explode(regexp_extract_all(col("text"),
        lit(TextAnalysis.BpeSplitRe), lit(0))).as("w0"))
      .select(col("doc_id"),
        translate(col("w0"), " ", Bpe.SpaceMark).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
    // the Viterbi DP as MaxWordLen sequential projections: b_i = best
    // packed (cost·64 + ntokens) over the ≤MaxPieceLen pieces ending
    // at i — column references keep the plan linear, all codegen'd
    var dp = words.withColumn("b0", lit(0L))
    for (i <- 1 to MaxWordLen) {
      val cands = (math.max(0, i - MaxPieceLen) until i).map { j =>
        val sub = substring(col("word"), j + 1, i - j)
        val pc = coalesce(try_element_at(costMap, sub) * 64 + 1,
          if (i - j == 1) lit(UnkCost * 64 + 1)
          else lit(Long.MaxValue / 4))
        col(s"b$j") + pc
      }
      val bestI = if (cands.size == 1) cands.head else least(cands: _*)
      dp = dp.withColumn(s"b$i",
        when(length(col("word")) >= i, bestI))
    }
    val packed = element_at(
      array((1 to MaxWordLen).map(i => col(s"b$i")): _*),
      length(col("word")))
    val overlong = length(col("word")) > MaxWordLen
    val agg = dp
      .withColumn("ntok_w", when(overlong,
        length(col("word")).cast("long")).otherwise(packed % 64))
      // packed ≥ 0, so >> 6 IS the exact cost·64 unpack (a plain `/`
      // would go through double division)
      .withColumn("cost_w", when(overlong,
        length(col("word")).cast("long") * UnkCost)
        .otherwise(shiftright(packed, 6)))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_pretokens"),
        sum(col("cnt") * col("ntok_w")).as("n_unigram_tokens"),
        sum(col("cnt") * col("cost_w")).as("total_cost"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pretokens"), lit(0L)).as("n_pretokens"),
        coalesce(col("n_unigram_tokens"), lit(0L)).as("n_unigram_tokens"),
        coalesce(col("total_cost"), lit(0L)).as("total_cost"))
  }

  /** Train + encode in one call (the `q_unigram_encode` surface). */
  def trainAndEncode(docs: DataFrame): DataFrame =
    encode(docs, trainModel(docs))

  /** Materialize every document's unigram token SEQUENCE — the
    * training-data product the counts summarize, in document order
    * (the [[Bpe.encodeTokens]] contract for the second tokenizer):
    * (doc_id, tokens array<string>). Same Viterbi DP as [[encode]]
    * with the backtrace kept (smallest split point on ties — the
    * oracle's rule); over-long pre-tokens fall back to one token per
    * character. One narrow memoized-kernel projection, no exchange. */
  def encodeTokensDf(docs: DataFrame,
      model: Seq[(String, Long, Long)]): DataFrame = {
    require(model.nonEmpty, "unigram encode needs a non-empty model")
    import org.apache.spark.sql.graft.ColumnBridge
    docs.select(col("doc_id"), ColumnBridge.column(UnigramTokensExpr(
      ColumnBridge.expression(col("text")),
      broadcastCosts(docs, model))).as("tokens"))
  }

  /** The trained (piece → cost) vocab as ONE broadcast HashMap — the
    * shape both Viterbi kernels walk, shipped once per executor
    * instead of re-serialized with every stage's task binary (at a
    * production 50 k-piece vocab the literal form is multi-MB of pure
    * serialization tax per stage). */
  private def broadcastCosts(docs: DataFrame,
      model: Seq[(String, Long, Long)])
      : org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, java.lang.Long]] = {
    Broadcasts.of(docs.sparkSession, ("unigram-costs", model.toList)) {
      val m = new java.util.HashMap[String, java.lang.Long]()
      model.foreach { case (p, _, c) => m.put(p, java.lang.Long.valueOf(c)) }
      m
    }
  }

  /** Train + materialize tokens (the `q_unigram_tokens` surface). */
  def trainAndEncodeTokens(docs: DataFrame): DataFrame =
    encodeTokensDf(docs, trainModel(docs))
}
