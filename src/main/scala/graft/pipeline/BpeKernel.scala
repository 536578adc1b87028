package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass BPE token counting — the hot-path form of [[Bpe.encode]].
  *
  * The expression-tree form applies every trained merge as a nested
  * `replace` over every OCCURRENCE of every pre-token: ~4 string
  * traversals × nMerges per token instance. But BPE encoding is a pure
  * function of the pre-token, and token instances are Zipf-distributed —
  * a corpus partition sees each distinct pre-token many times. This
  * kernel pre-tokenizes with the same compiled [[TextAnalysis.BpeSplitRe]]
  * and encodes each DISTINCT pre-token once per partition (bounded
  * memo table), turning the per-instance cost into a hash probe.
  *
  * Parity: the per-token computation is literally
  * [[Bpe.initialSym]] + the [[Bpe.applyMerge]] fold — the same shared
  * formula the Column form, the driver trainer, and the DuckDB oracle
  * evaluate — so counts are bit-identical (BpeKernelParitySpec pins the
  * kernel against the expression-tree form on real corpus text).
  *
  * Scale shape: narrow per-row map, no shuffle, no driver state; the
  * memo table lives in generated-class mutable state (one per
  * partition-instance) and self-clears past [[BpeKernel.MaxCache]]
  * distinct tokens so an adversarial vocabulary cannot hold executor
  * heap.
  */
object BpeKernel {

  /** Memo-table bound: far above any natural per-partition distinct
    * pre-token count (English web text plateaus ~10^5); past it the
    * table clears and rebuilds rather than growing without bound. */
  val MaxCache = 1 << 20

  private val Pat = java.util.regex.Pattern.compile(TextAnalysis.BpeSplitRe)

  val countStruct: StructType = StructType(Seq(
    StructField("n_pretokens", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false)))

  /** BPE token count of ONE pre-token: the shared-formula fold. */
  private def tokenCount(tok: String, merges: Array[String]): Long = {
    var sym = Bpe.initialSym(tok)
    var i = 0
    while (i < merges.length) {
      sym = Bpe.applyMerge(sym, merges(i))
      i += 1
    }
    // symbols are space-separated; count = spaces + 1 (sym is never
    // empty: a pre-token has >= 1 code point)
    var n = 1L
    var j = sym.indexOf(' ')
    while (j >= 0) { n += 1; j = sym.indexOf(' ', j + 1) }
    n
  }

  /** (n_pretokens, n_bpe_tokens) of one document under the memo table. */
  def encodeCounts(text: UTF8String, merges: Array[String],
      cache: java.util.HashMap[String, java.lang.Long]): InternalRow = {
    if (text == null) return null
    if (cache.size() > MaxCache) cache.clear()
    val m = Pat.matcher(text.toString)
    var np = 0L
    var nb = 0L
    while (m.find()) {
      val tok = m.group()
      np += 1
      var c = cache.get(tok)
      if (c == null) {
        c = java.lang.Long.valueOf(tokenCount(tok, merges))
        cache.put(tok, c)
      }
      nb += c.longValue()
    }
    new GenericInternalRow(Array[Any](np, nb))
  }

  /** The materialized token sequence of one document: every
    * pre-token's final symbol string split on spaces, concatenated in
    * document order — the array a training-data loader consumes.
    * Shares the memo-table discipline of [[encodeCounts]] (cached
    * values are the SPLIT arrays, so each occurrence pays one copy,
    * not a re-fold). */
  def encodeTokens(text: UTF8String, merges: Array[String],
      cache: java.util.HashMap[String, Array[UTF8String]]): ArrayData = {
    if (text == null) return null
    if (cache.size() > MaxCache) cache.clear()
    val m = Pat.matcher(text.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) {
      val tok = m.group()
      var toks = cache.get(tok)
      if (toks == null) {
        var sym = Bpe.initialSym(tok)
        var i = 0
        while (i < merges.length) {
          sym = Bpe.applyMerge(sym, merges(i))
          i += 1
        }
        toks = sym.split(" ").map(UTF8String.fromString)
        cache.put(tok, toks)
      }
      var j = 0
      while (j < toks.length) { out += toks(j); j += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

/** One-pass Unigram-LM encode — the hot-path form of [[Unigram.encode]].
  *
  * The column form runs the Viterbi DP as [[Unigram.MaxWordLen]]
  * sequential projections whose piece lookups are `try_element_at`
  * over a ~200-entry MAP LITERAL — a linear scan per candidate, ~48
  * candidates per distinct (doc, word) row, behind a corpus-wide
  * (doc, word) exchange. Encoding is a pure function of the pre-token
  * (Zipf: instances ≫ distincts), so this kernel pre-tokenizes with
  * the same compiled [[TextAnalysis.BpeSplitRe]], runs the IDENTICAL
  * packed-long DP (cost·64 + ntokens, smallest-j ties) per DISTINCT
  * pre-token once per partition, and accumulates the document sums in
  * the same pass — no exchange at all. UnigramSpec pins the kernel
  * against the column form ([[Unigram.encodeColumns]]) on corpus text.
  */
object UnigramKernel {

  val encodeStruct: StructType = StructType(Seq(
    StructField("n_pretokens", LongType, nullable = false),
    StructField("n_unigram_tokens", LongType, nullable = false),
    StructField("total_cost", LongType, nullable = false)))

  private val Pat = java.util.regex.Pattern.compile(TextAnalysis.BpeSplitRe)

  /** (ntokens, cost) of ONE pre-token under the packed-long DP —
    * literally [[Unigram.encode]]'s b_i recurrence: candidate cost
    * cost(piece)·64+1, per-char fallback UnkCost·64+1, multi-char
    * non-pieces Long.MaxValue/4, strict < so the smallest j wins. */
  private def wordCount(word: String,
      cost: java.util.HashMap[String, java.lang.Long]): Array[Long] = {
    // code-point starts (the two engines' substr counts characters)
    val n0 = word.codePointCount(0, word.length)
    if (n0 > Unigram.MaxWordLen)
      return Array(n0.toLong, n0.toLong * Unigram.UnkCost)
    val offs = new Array[Int](n0 + 1)
    var oi = 0
    var ci = 0
    while (oi < word.length) {
      offs(ci) = oi
      oi += Character.charCount(word.codePointAt(oi))
      ci += 1
    }
    offs(n0) = word.length
    val b = new Array[Long](n0 + 1)
    var i = 1
    while (i <= n0) {
      var best = Long.MaxValue
      var j = math.max(0, i - Unigram.MaxPieceLen)
      while (j < i) {
        val c = cost.get(word.substring(offs(j), offs(i)))
        val pc =
          if (c != null) c.longValue() * 64 + 1
          else if (i - j == 1) Unigram.UnkCost * 64 + 1
          else Long.MaxValue / 4
        val v = b(j) + pc
        if (v < best) best = v
        j += 1
      }
      b(i) = best
      i += 1
    }
    Array(b(n0) % 64, b(n0) >> 6)
  }

  /** The Viterbi pieces of ONE pre-token, left to right — the same
    * packed-long DP as [[wordCount]] with the backtrace kept (strict <
    * keeps the smallest split point, the oracle's (value asc, j asc)
    * rule); over-long words fall back to one token per CODE POINT. */
  private def wordTokens(word: String,
      cost: java.util.HashMap[String, java.lang.Long]): Array[UTF8String] = {
    val n0 = word.codePointCount(0, word.length)
    val offs = new Array[Int](n0 + 1)
    var oi = 0
    var ci = 0
    while (oi < word.length) {
      offs(ci) = oi
      oi += Character.charCount(word.codePointAt(oi))
      ci += 1
    }
    offs(n0) = word.length
    if (n0 > Unigram.MaxWordLen)
      return Array.tabulate(n0)(i =>
        UTF8String.fromString(word.substring(offs(i), offs(i + 1))))
    val b = new Array[Long](n0 + 1)
    val bj = new Array[Int](n0 + 1)
    var i = 1
    while (i <= n0) {
      var best = Long.MaxValue
      var bestJ = -1
      var j = math.max(0, i - Unigram.MaxPieceLen)
      while (j < i) {
        val c = cost.get(word.substring(offs(j), offs(i)))
        val pc =
          if (c != null) c.longValue() * 64 + 1
          else if (i - j == 1) Unigram.UnkCost * 64 + 1
          else Long.MaxValue / 4
        val v = b(j) + pc
        if (v < best) { best = v; bestJ = j }
        j += 1
      }
      b(i) = best; bj(i) = bestJ
      i += 1
    }
    val rev = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = n0
    while (pos > 0) {
      val j = bj(pos)
      rev += UTF8String.fromString(word.substring(offs(j), offs(pos)))
      pos = j
    }
    rev.reverse.toArray
  }

  /** The materialized unigram token sequence of one document: every
    * pre-token's Viterbi pieces, concatenated in document order — the
    * [[BpeKernel.encodeTokens]] contract for the second tokenizer. */
  def encodeTokens(text: UTF8String,
      cost: java.util.HashMap[String, java.lang.Long],
      cache: java.util.HashMap[String, Array[UTF8String]]): ArrayData = {
    if (text == null) return null
    if (cache.size() > BpeKernel.MaxCache) cache.clear()
    val m = Pat.matcher(text.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) {
      val tok = m.group().replace(" ", Bpe.SpaceMark)
      var toks = cache.get(tok)
      if (toks == null) {
        toks = wordTokens(tok, cost)
        cache.put(tok, toks)
      }
      var j = 0
      while (j < toks.length) { out += toks(j); j += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** (n_pretokens, n_unigram_tokens, total_cost) of one document. */
  def encodeCounts(text: UTF8String,
      cost: java.util.HashMap[String, java.lang.Long],
      cache: java.util.HashMap[String, Array[Long]]): InternalRow = {
    if (text == null)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    if (cache.size() > BpeKernel.MaxCache) cache.clear()
    val m = Pat.matcher(text.toString)
    var np = 0L
    var nt = 0L
    var tc = 0L
    while (m.find()) {
      val tok = m.group().replace(" ", Bpe.SpaceMark)
      np += 1
      var r = cache.get(tok)
      if (r == null) {
        r = wordCount(tok, cost)
        cache.put(tok, r)
      }
      nt += r(0)
      tc += r(1)
    }
    new GenericInternalRow(Array[Any](np, nt, tc))
  }
}

/** `unigram_count(text)`: struct(n_pretokens, n_unigram_tokens,
  * total_cost) under the trained piece-cost model — memo isolation per
  * expression instance, like [[BpeCountExpr]]. Never null (a null doc
  * is the zero row, matching the column form's left-join coalesce). */
case class UnigramCountExpr(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[String, java.lang.Long]])
    extends UnaryExpression {
  override def dataType: DataType = UnigramKernel.encodeStruct
  override def nullable: Boolean = false

  @transient private lazy val costMap = model.value

  @transient private lazy val evalCache =
    new ThreadLocal[java.util.HashMap[String, Array[Long]]] {
      override def initialValue() =
        new java.util.HashMap[String, Array[Long]]()
    }

  override def eval(input: InternalRow): Any =
    UnigramKernel.encodeCounts(
      child.eval(input).asInstanceOf[UTF8String], costMap,
      evalCache.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // the vocab rides a Broadcast STUB in the references array — the
    // payload is fetched once per executor, not serialized per stage
    val bcRef = ctx.addReferenceObj("unigramCostsBc", model,
      "org.apache.spark.broadcast.Broadcast")
    val costRef = ctx.addMutableState("java.util.HashMap", "unigramCosts",
      v => s"$v = (java.util.HashMap) $bcRef.value();")
    val cacheVar = ctx.addMutableState("java.util.HashMap", "unigramMemo",
      v => s"$v = new java.util.HashMap();")
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} = graft.pipeline.UnigramKernel.encodeCounts(
        ${c.isNull} ? null : ${c.value}, $costRef, $cacheVar);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unigram_tokens(text)`: the document's materialized unigram token
  * sequence (array<string>) under the trained piece-cost model — memo
  * isolation per expression instance, like [[UnigramCountExpr]]. */
case class UnigramTokensExpr(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[String, java.lang.Long]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val costMap = model.value

  @transient private lazy val evalCache =
    new ThreadLocal[java.util.HashMap[String, Array[UTF8String]]] {
      override def initialValue() =
        new java.util.HashMap[String, Array[UTF8String]]()
    }

  override def eval(input: InternalRow): Any =
    UnigramKernel.encodeTokens(
      child.eval(input).asInstanceOf[UTF8String], costMap,
      evalCache.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val bcRef = ctx.addReferenceObj("unigramCostsBc", model,
      "org.apache.spark.broadcast.Broadcast")
    val costRef = ctx.addMutableState("java.util.HashMap", "unigramCosts",
      v => s"$v = (java.util.HashMap) $bcRef.value();")
    val cacheVar = ctx.addMutableState("java.util.HashMap", "unigramTokMemo",
      v => s"$v = new java.util.HashMap();")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.UnigramKernel.encodeTokens(
          ${c.isNull} ? null : ${c.value}, $costRef, $cacheVar);
      boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_count(text)`: struct(n_pretokens, n_bpe_tokens) under the
  * trained `merges`, applied in rank order. */
case class BpeCountExpr(child: Expression,
    merges: org.apache.spark.broadcast.Broadcast[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = BpeKernel.countStruct
  override def nullable: Boolean = child.nullable

  @transient private lazy val mergesArr = merges.value

  /** Interpreted-eval memo table — PER EXPRESSION INSTANCE (the memo
    * is only valid for this instance's merge list; a shared map would
    * poison counts across plans trained on different corpora) and per
    * thread. The codegen path gets the same isolation from
    * per-generated-instance mutable state. */
  @transient private lazy val evalCache =
    new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
      override def initialValue() =
        new java.util.HashMap[String, java.lang.Long]()
    }

  override def eval(input: InternalRow): Any =
    BpeKernel.encodeCounts(
      child.eval(input).asInstanceOf[UTF8String], mergesArr,
      evalCache.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // merge list rides a Broadcast STUB — fetched once per executor
    // instead of serialized into every stage's task binary
    val bcRef = ctx.addReferenceObj("bpeMergesBc", merges,
      "org.apache.spark.broadcast.Broadcast")
    val mergesRef = ctx.addMutableState("java.lang.String[]", "bpeMerges",
      v => s"$v = (java.lang.String[]) $bcRef.value();")
    val cacheVar = ctx.addMutableState("java.util.HashMap", "bpeMemo",
      v => s"$v = new java.util.HashMap();")
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} = graft.pipeline.BpeKernel.encodeCounts(
        ${c.isNull} ? null : ${c.value}, $mergesRef, $cacheVar);
      boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_tokens(text)`: the document's materialized BPE token sequence
  * (array<string>) under the trained `merges`, rank order — same memo
  * isolation as [[BpeCountExpr]]. */
case class BpeTokensExpr(child: Expression,
    merges: org.apache.spark.broadcast.Broadcast[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val mergesArr = merges.value

  @transient private lazy val evalCache =
    new ThreadLocal[java.util.HashMap[String, Array[UTF8String]]] {
      override def initialValue() =
        new java.util.HashMap[String, Array[UTF8String]]()
    }

  override def eval(input: InternalRow): Any =
    BpeKernel.encodeTokens(
      child.eval(input).asInstanceOf[UTF8String], mergesArr,
      evalCache.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val bcRef = ctx.addReferenceObj("bpeMergesBc", merges,
      "org.apache.spark.broadcast.Broadcast")
    val mergesRef = ctx.addMutableState("java.lang.String[]", "bpeMerges",
      v => s"$v = (java.lang.String[]) $bcRef.value();")
    val cacheVar = ctx.addMutableState("java.util.HashMap", "bpeTokMemo",
      v => s"$v = new java.util.HashMap();")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.BpeKernel.encodeTokens(
          ${c.isNull} ? null : ${c.value}, $mergesRef, $cacheVar);
      boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
