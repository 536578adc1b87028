package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature kernel behind a codegen'd Catalyst
  * expression. The column form in [[Dedup.minhashSignatureFromShingles]]
  * evaluates `transform(shingles, md5→long)` and then k separate
  * `array_min(transform(hs, affine))` lambdas — higher-order functions
  * are interpreted, so that's k+1 boxed traversals per document plus an
  * md5→hex-string→conv round-trip per shingle. This kernel digests each
  * shingle once (bytes, no hex string) and folds all k running minima
  * in the same pass — identical math, so the DuckDB oracle and the
  * banded LSH consumers are unchanged (MinhashParitySpec pins
  * element-exact equality against the column form). */
object MinhashKernel {

  /** First 60 bits of the md5 digest (= the first 15 hex chars the
    * column form parses) reduced mod P. */
  private def shingleHash(md: java.security.MessageDigest,
      s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) >> 4) & 0xfL)
    h % Dedup.MinhashP
  }

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, _ => {
      val cs = (0 until k).map(Dedup.minhashCoeff)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  /** Signature of one shingle array. Null/empty/all-null inputs yield
    * an array of k nulls — exactly what `array(array_min(transform(
    * null-or-empty, ...)), ...)` evaluates to in the column form. */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    if (shingles == null)
      return new GenericArrayData(Array.fill[Any](k)(null))
    val (a, b) = coeffs(k)
    val n = shingles.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val h = shingleHash(md, shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          val v = (h * a(j) + b(j)) % Dedup.MinhashP
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins.map(Long.box).toArray[Any])
  }
}

/** One-pass w-gram shingler — the column form
  * (`array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(words, i+1, w))))`) walks interpreted lambdas and re-slices
  * per gram. Distinct keeps first-occurrence order; a null or empty
  * text yields `[""]` (split of "" is [""], and concat_ws over the
  * null words array renders "") — ShingleParity cases in
  * MinhashParitySpec pin all of it. */
object ShingleKernel {
  def shingles(text: UTF8String, w: Int): ArrayData = {
    if (text == null)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val words = text.toString.split(" ", -1)
    val n = words.length
    val m = math.max(n - w, 0)
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= m) {
      sb.setLength(0)
      val end = math.min(i + w, n)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** `shingles(text)`: array<string> of distinct w-grams; never null. */
case class ShinglesExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    ShingleKernel.shingles(
      child.eval(input).asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.ShingleKernel.shingles(
          ${c.isNull} ? null : ${c.value}, $w);
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass SimHash kernel — the fingerprint is a pure per-document
  * function (token counts → 64 weighted sign bits), but the column
  * form computes it through an explode + two grouped aggregations:
  * two full-corpus shuffles. This kernel counts tokens locally,
  * digests each DISTINCT token once (bytes, no hex round-trip: h1 =
  * digest bits 0..59, h2 = bits 60..119, exactly the first/next 15
  * hex chars the column form parses), accumulates the 64 signed
  * counters, and packs sign bits (strictly-positive → 1, bit 63 via
  * the signed min-long weight). Null-text docs drop via the 0-or-1
  * inline, matching the explode's no-row semantics.
  * SimhashParity cases in MinhashParitySpec pin equality. */
object SimhashKernel {

  private def nibbles(d: Array[Byte], from: Int, n: Int): Long = {
    var h = 0L
    var i = from
    while (i < from + n) {
      val b = d(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      h = (h << 4) | nib.toLong
      i += 1
    }
    h
  }

  def simhash(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.HashMap[String, Long]
    text.toString.split(" ", -1).foreach(t =>
      counts.merge(t, 1L, (a, b) => a + b))
    val acc = new Array[Long](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      val d = md.digest(e.getKey.getBytes("UTF-8"))
      val h1 = nibbles(d, 0, 15)
      val h2 = nibbles(d, 15, 15)
      val c = e.getValue
      var b = 0
      while (b < 64) {
        val h = if (b < 60) h1 >> b else h2 >> (b - 60)
        if ((h & 1L) == 1L) acc(b) += c else acc(b) -= c
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) fp += (if (b == 63) Long.MinValue else 1L << b)
      b += 1
    }
    new GenericArrayData(Array[Any](
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](fp))))
  }
}

/** `simhash(text)`: 0-or-1 single-field structs (the fingerprint),
  * consumed via `inline`. */
case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("simhash", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SimhashKernel.simhash(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.SimhashKernel.simhash(
          ${c.isNull} ? null : ${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass hashed char-3-gram kernel for [[TextAnalysis.langIdNgram]].
  * The column form (`transform(sequence(1, length-2), i ->
  * conv(substr(md5(concat('lid:', substring(text, i, 3))), 1, 15), 16,
  * 10) % B)`) is an interpreted lambda per CHARACTER position — an
  * md5→hex→parse round-trip ~1000× per document, and langIdNgram walks
  * the corpus twice (train + predict): it dominated the whole bench
  * fleet at 8.5 s. This kernel resolves code-point offsets once per
  * document (Spark's `substring` counts characters, i.e. code points —
  * String.substring counts UTF-16 units, so the offsets are mapped
  * explicitly) and digests each gram's bytes directly: same first-60-
  * bits-of-md5 value, so the DuckDB oracle chain is unchanged.
  * LangGramsParity in MinhashParitySpec pins element-exact equality
  * against the column form, non-ASCII included. */
object LangGramsKernel {
  def grams(text: UTF8String, buckets: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val s = text.toString
    // code-point start offsets (chars in Spark/DuckDB substring terms)
    val offs = new Array[Int](s.codePointCount(0, s.length) + 1)
    var ci = 0
    var oi = 0
    while (oi < s.length) {
      offs(ci) = oi
      oi += Character.charCount(s.codePointAt(oi))
      ci += 1
    }
    offs(ci) = s.length
    val n = ci // characters
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefix = "lid:".getBytes("UTF-8")
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      md.reset()
      md.update(prefix)
      md.update(s.substring(offs(i), offs(i + 3)).getBytes("UTF-8"))
      val d = md.digest()
      // first 15 hex chars = bytes 0..6 + the high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      out(i) = h % buckets
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `lang_grams(text)`: array<long> of hashed char-3-gram buckets;
  * never null (null / too-short text → empty array — the consumer
  * explodes, so both spell "no rows"). */
case class LangGramsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    LangGramsKernel.grams(
      child.eval(input).asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.LangGramsKernel.grams(
          ${c.isNull} ? null : ${c.value}, $buckets);
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass hashed-bigram feature kernel for
  * [[TextAnalysis.importanceWeights]] (DSIR features): the column form
  * md5s each bigram inside an interpreted `transform` lambda, and the
  * feature relation is consumed three times (raw counts, target
  * counts, the scoring join), so the interpreted digest walks the
  * corpus repeatedly. Same bytes → first-60-bits → % P → % buckets
  * value as the SQL spelling, so the DuckDB oracle chain is unchanged;
  * MinhashParitySpec pins kernel ≡ column element-exact. */
object BigramHashKernel {
  def feats(text: UTF8String, p: Long, buckets: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    // Spark's split(col, " ") = Java split limit -1: keeps empties
    val ws = text.toString.split(" ", -1)
    if (ws.length < 2) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](ws.length - 1)
    var i = 1
    while (i < ws.length) {
      md.reset()
      md.update(ws(i - 1).getBytes("UTF-8"))
      md.update(' '.toByte)
      md.update(ws(i).getBytes("UTF-8"))
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      out(i - 1) = ((h % p) % buckets).toInt
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `bigram_feats(text)`: array<int> of hashed bigram buckets; never
  * null (null / single-token text → empty array — the consumer
  * explodes, so both spell "no rows", matching the size >= 2 filter). */
case class BigramHashExpr(child: Expression, p: Long, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    BigramHashKernel.feats(
      child.eval(input).asInstanceOf[UTF8String], p, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.BigramHashKernel.feats(
          ${c.isNull} ? null : ${c.value}, ${p}L, $buckets);
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass Naive-Bayes language scorer for
  * [[TextAnalysis.langIdNgram]]'s PREDICT pass. The column form
  * explodes every gram instance, broadcast-joins the dense
  * (lang × seen-bucket) grid (multiplying the stream |langs|-fold),
  * and aggregates per (doc, lang) — a corpus-scale exchange for what
  * is a pure per-document function of a ≤ |langs|·4096-cell literal
  * table. This kernel walks the document's grams once (the
  * [[LangGramsKernel]] hash), accumulates all |langs| running score
  * sums in the same pass (exact long addition — order-free), and
  * returns the argmax with the column form's tie rule (score first,
  * then binary-largest lang). Grams outside the SEEN bucket set drop
  * from both the sums and the gram count, exactly like the inner join;
  * a doc with no counted gram predicts ("und", 0), exactly like the
  * left-join coalesce. TextAnalysis.langIdNgramColumns keeps the
  * join-form as the parity pin (PipelineSpec). */
object LangScoreKernel {
  /** Codegen-init helpers: unpack the broadcast [[LangIdModel]] into
    * the primitive shapes the scorer walks (once per task, not per
    * row). */
  def langsArr(m: LangIdModel): Array[UTF8String] =
    m.langs.map(UTF8String.fromString).toArray
  def lnbArr(m: LangIdModel): Array[Long] = m.lnb.toArray

  /** `lc` is the dense (lang × bucket) grid flattened ROW-MAJOR
    * (`lc(l * buckets + b)`) — a primitive long[] so the trained model
    * stays compact; the whole model rides ONE Broadcast stub in the
    * plan (fetched per executor), never boxed nested Seqs in the task
    * binary. */
  def score(text: UTF8String, buckets: Int, langs: Array[UTF8String],
      lnb: Array[Long], lc: Array[Long],
      seen: Array[Boolean]): org.apache.spark.sql.catalyst.InternalRow = {
    val und = UTF8String.fromString("und")
    val nl = langs.length
    val grams = LangGramsKernel.grams(text, buckets)
    val acc = new Array[Long](nl)
    var ng = 0L
    var i = 0
    val n = grams.numElements()
    while (i < n) {
      val b = grams.getLong(i).toInt
      if (seen(b)) {
        ng += 1
        var l = 0
        while (l < nl) { acc(l) += lc(l * buckets + b); l += 1 }
      }
      i += 1
    }
    if (ng == 0L)
      return new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](und, 0L))
    var bestL = -1
    var bestS = Long.MinValue
    var l = 0
    while (l < nl) {
      val s = acc(l) - ng * lnb(l)
      if (s > bestS || (s == bestS &&
          (bestL < 0 || langs(l).compareTo(langs(bestL)) > 0))) {
        bestS = s; bestL = l
      }
      l += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](langs(bestL), bestS))
  }
}

/** `lang_score(text)`: struct(predicted_lang, nb_score) under the
  * trained grid — never null. The model (a |langs|×buckets grid: at
  * production scale 100+ langs × 4096 buckets ≈ multi-MB) rides a
  * Broadcast stub, fetched once per executor instead of serialized
  * into every stage's task binary. */
case class LangScoreExpr(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[LangIdModel])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("predicted_lang", StringType, nullable = false),
    StructField("nb_score", LongType, nullable = false)))
  override def nullable: Boolean = false

  @transient private lazy val m = model.value
  @transient private lazy val langsArr = LangScoreKernel.langsArr(m)
  @transient private lazy val lnbArr = LangScoreKernel.lnbArr(m)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    LangScoreKernel.score(child.eval(input).asInstanceOf[UTF8String],
      m.buckets, langsArr, lnbArr, m.lcFlat, m.seen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val bcRef = ctx.addReferenceObj("lsModelBc", model,
      "org.apache.spark.broadcast.Broadcast")
    val mVar = ctx.addMutableState("graft.pipeline.LangIdModel", "lsModel",
      v => s"$v = (graft.pipeline.LangIdModel) $bcRef.value();")
    val langsRef = ctx.addMutableState(
      "org.apache.spark.unsafe.types.UTF8String[]", "lsLangs",
      v => s"$v = graft.pipeline.LangScoreKernel.langsArr($mVar);")
    val lnbRef = ctx.addMutableState("long[]", "lsLnb",
      v => s"$v = graft.pipeline.LangScoreKernel.lnbArr($mVar);")
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} = graft.pipeline.LangScoreKernel.score(
        ${c.isNull} ? null : ${c.value}, $mVar.buckets(), $langsRef,
        $lnbRef, $mVar.lcFlat(), $mVar.seen());
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(shingles)`: array<long> of k per-permutation minima.
  * Never null itself (null input → array of k nulls, matching the
  * column form), so eval/codegen bypass the null-shortcut. */
case class MinhashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinhashKernel.sig(
      child.eval(input).asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.MinhashKernel.sig(
          ${childGen.isNull} ? null : ${childGen.value}, $k);
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact n-gram-Jaccard verification kernels (the PPJoin-flavored
  * rewrite of the array_intersect/array_union verify pass — Xiao et
  * al. 2011, "Efficient Similarity Joins for Near-Duplicate
  * Detection").
  *
  * [[NgramHashSortKernel]] maps each document's distinct shingle
  * strings to the FULL 60-bit md5 prefix (the same first-15-hex-chars
  * digest the minhash path uses, WITHOUT the mod-P reduction — 2^60
  * keys keep the per-pair collision odds ~1e-14, so intersection /
  * union COUNTS equal the string-set counts and the jaccard doubles
  * come out bit-identical to the retained column form) and sorts them.
  * Sorted long arrays make the verify join rows ~3x narrower than the
  * shingle strings they replace, and intersection becomes a
  * merge-walk instead of a per-pair hash-set build.
  *
  * [[NgramJaccardKernel.inter]] returns |A ∩ B| exactly, or -1 when
  * the pair PROVABLY cannot reach `threshold`:
  *   - length filter: even min(na,nb) shared elements leave
  *     jaccard < t;
  *   - PPJoin prefix filter: any pair with inter ≥ α (α = ⌊t·max(na,
  *     nb)⌋, a conservative lower bound on the intersection any
  *     qualifying pair must have) shares an element inside the
  *     (n − α + 1)-prefixes under the global hash order — disjoint
  *     prefixes prove jaccard < t without walking the tails;
  *   - positional bound: during the merge-walk, when the best still
  *     reachable intersection can no longer clear t, stop.
  * Every exit is conservative (−1 only when jaccard < t is certain),
  * so `filter(inter >= 0)` + the final jaccard-threshold filter emit
  * EXACTLY the rows the unfiltered form emits. */
object NgramJaccardKernel {

  /** Sorted 60-bit md5 hashes of a shingle array (nulls dropped;
    * null array → null). */
  def hashSort(shingles: ArrayData): ArrayData = {
    if (shingles == null) return null
    val n = shingles.numElements()
    val out = new Array[Long](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    var m = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        md.reset()
        val d = md.digest(shingles.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xfL)
        out(m) = h
        m += 1
      }
      i += 1
    }
    val arr = if (m == n) out else java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** Exact intersection size of two SORTED long arrays, or -1 when the
    * pair provably cannot reach `threshold` (see object doc). */
  def inter(a: ArrayData, b: ArrayData, threshold: Double): java.lang.Integer = {
    if (a == null || b == null) return null
    val na = a.numElements()
    val nb = b.numElements()
    // length filter: the largest possible intersection is min(na, nb)
    val maxI = math.min(na, nb)
    if (na + nb > 0 &&
        maxI.toDouble / (na + nb - maxI) < threshold) return -1
    if (threshold > 0 && maxI > 0) {
      // PPJoin prefix filter under the ascending hash order. α =
      // ⌊t·max⌋ understates the ⌈t·max⌉ bound, so prefixes only get
      // LONGER than the lemma needs — never a false drop.
      val alpha = math.floor(threshold * math.max(na, nb)).toInt
      val la = math.min(na, na - alpha + 1)
      val lb = math.min(nb, nb - alpha + 1)
      var ia = 0
      var ib = 0
      var found = false
      while (!found && ia < la && ib < lb) {
        val va = a.getLong(ia)
        val vb = b.getLong(ib)
        if (va == vb) found = true
        else if (va < vb) ia += 1
        else ib += 1
      }
      if (!found) return -1
    }
    // full merge-walk with the positional upper bound
    var ia = 0
    var ib = 0
    var n = 0
    while (ia < na && ib < nb) {
      val va = a.getLong(ia)
      val vb = b.getLong(ib)
      if (va == vb) { n += 1; ia += 1; ib += 1 }
      else {
        if (va < vb) ia += 1 else ib += 1
        // best still-reachable intersection
        val bound = n + math.min(na - ia, nb - ib)
        if (bound.toDouble / (na + nb - bound) < threshold) return -1
      }
    }
    n
  }

  /** PPJoin decision over possibly-TRUNCATED sorted hash prefixes —
    * the r17 payload-bounded group-synthesis contract. `a`/`b` carry
    * at most the first `cap` hashes (ascending) of sets whose TRUE
    * sizes are `na`/`nb`; the caller bounds every aggregation-row
    * payload at cap·8 bytes per member regardless of document length.
    *
    * Returns the exact |A ∩ B| (≥ 0) when both arrays are complete;
    * -1 when the pair PROVABLY cannot reach `threshold` (length
    * filter on the true sizes, or the full PPJoin prefixes fit inside
    * the truncated arrays and are disjoint); -2 when the truncated
    * prefixes cannot decide — the caller re-verifies those few pairs
    * against the full hash sets via a narrow join. Every -1 is
    * conservative, so exact ∪ re-verified emits EXACTLY the
    * unfiltered form's rows. */
  def interBounded(a: ArrayData, b: ArrayData, na: Int, nb: Int,
      threshold: Double): java.lang.Integer = {
    if (a == null || b == null) return null
    val ka = a.numElements()
    val kb = b.numElements()
    if (ka >= na && kb >= nb) return inter(a, b, threshold)
    // length filter on the TRUE sizes
    val maxI = math.min(na, nb)
    if (na + nb > 0 &&
        maxI.toDouble / (na + nb - maxI) < threshold) return -1
    if (threshold > 0 && maxI > 0) {
      // prefix filter over whatever part of each exact prefix the
      // truncated arrays still hold; only DECISIVE (-1) when both
      // exact prefixes fit inside the available data
      val alpha = math.floor(threshold * math.max(na, nb)).toInt
      val la = math.min(na, na - alpha + 1)
      val lb = math.min(nb, nb - alpha + 1)
      val sa = math.min(la, ka)
      val sb = math.min(lb, kb)
      var ia = 0
      var ib = 0
      var found = false
      while (!found && ia < sa && ib < sb) {
        val va = a.getLong(ia)
        val vb = b.getLong(ib)
        if (va == vb) found = true
        else if (va < vb) ia += 1
        else ib += 1
      }
      if (!found && la <= ka && lb <= kb) return -1
    }
    -2
  }
}

/** `ngram_hash_sort(shingles)`: sorted array<long> of 60-bit md5
  * shingle hashes (null-propagating). */
case class NgramHashSortExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    NgramJaccardKernel.hashSort(child.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.pipeline.NgramJaccardKernel.hashSort($c);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ngram_inter(hsh_a, hsh_b)`: exact |A∩B| over sorted hash arrays,
  * -1 when provably below the jaccard threshold (null-propagating). */
case class NgramInterExpr(left: Expression, right: Expression,
    threshold: Double)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val r = NgramJaccardKernel.inter(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData], threshold)
    if (r == null) null else r.intValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("interBoxed")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      java.lang.Integer $boxed = graft.pipeline.NgramJaccardKernel.inter(
        ${l.isNull} ? null : ${l.value},
        ${r.isNull} ? null : ${r.value}, $threshold);
      boolean ${ev.isNull} = $boxed == null;
      int ${ev.value} = ${ev.isNull} ? -1 : $boxed.intValue();
      """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `ngram_inter_bounded(hs_a, hs_b, n_a, n_b)`: the truncated-prefix
  * form of [[NgramInterExpr]] — see
  * [[NgramJaccardKernel.interBounded]]. Null iff either array is
  * null. */
case class NgramInterBoundedExpr(hsA: Expression, hsB: Expression,
    nA: Expression, nB: Expression, threshold: Double)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def first: Expression = hsA
  override def second: Expression = hsB
  override def third: Expression = nA
  override def fourth: Expression = nB
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val na = nA.eval(input)
    val nb = nB.eval(input)
    if (na == null || nb == null) return null
    val r = NgramJaccardKernel.interBounded(
      hsA.eval(input).asInstanceOf[ArrayData],
      hsB.eval(input).asInstanceOf[ArrayData],
      na.asInstanceOf[Int], nb.asInstanceOf[Int], threshold)
    if (r == null) null else r.intValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = hsA.genCode(ctx)
    val b = hsB.genCode(ctx)
    val na = nA.genCode(ctx)
    val nb = nB.genCode(ctx)
    val boxed = ctx.freshName("interBoxed")
    ev.copy(code = code"""
      ${a.code}
      ${b.code}
      ${na.code}
      ${nb.code}
      java.lang.Integer $boxed =
        (${na.isNull} || ${nb.isNull}) ? null :
          graft.pipeline.NgramJaccardKernel.interBounded(
            ${a.isNull} ? null : ${a.value},
            ${b.isNull} ? null : ${b.value},
            ${na.value}, ${nb.value}, $threshold);
      boolean ${ev.isNull} = $boxed == null;
      int ${ev.value} = ${ev.isNull} ? -1 : $boxed.intValue();
      """)
  }
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): Expression =
    copy(hsA = f, hsB = s, nA = t, nB = q)
}

/** One-pass fixed-word-count segmentation for [[Curation.segmentDedup]]
  * — the r17 docmix probe caught the column form
  * (`transform(sequence(...), i -> array_join(slice(words, ...), ' '))`)
  * going QUADRATIC on long documents: Spark's `Slice` copies the whole
  * word array per segment (toObjectArray), so a 10⁶-word doc paid
  * 10⁵ × 10⁶ element copies. This kernel walks the text once.
  *
  * Semantics bit-match the column form (parity-pinned): words =
  * split-by-single-space keeping trailing empties (Spark
  * `split(text, " ")`, limit -1), segments = consecutive `segWords`
  * groups rejoined with one space, null text → null. */
object SegmentsKernel {
  def segments(text: UTF8String, segWords: Int): ArrayData = {
    if (text == null) return null
    val words = text.toString.split(" ", -1)
    val n = words.length
    val nSeg = (n + segWords - 1) / segWords
    // sequence(0, -1) in the column form yields [0, -1] → two slices
    // that both resolve to the full (empty) remainder; unreachable
    // here because split(-1) never returns an empty array (n >= 1)
    val out = new Array[AnyRef](math.max(nSeg, 0))
    var g = 0
    while (g < nSeg) {
      val from = g * segWords
      val until = math.min(n, from + segWords)
      val sb = new java.lang.StringBuilder()
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(words(i))
        i += 1
      }
      out(g) = UTF8String.fromString(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** `segments(text)`: array<string> of `segWords`-word segments
  * (null-propagating). */
case class SegmentsExpr(child: Expression, segWords: Int)
    extends UnaryExpression {
  require(segWords > 0, s"segWords ($segWords) must be positive")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SegmentsKernel.segments(
      child.eval(input).asInstanceOf[UTF8String], segWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.pipeline.SegmentsKernel.segments($c, $segWords);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-doc packed LSH cell array for the group-synthesis candidate
  * path: `cells(2b) / cells(2b+1)` hold the first/second 60 bits of
  * band b's md5 bucket (120 bits total — bucket equality through the
  * pack is md5-collision-exact), `-1` marks a band whose (band,
  * bucket) group was hot-capped away (a capped band can never count
  * as shared). */
object LshCellsKernel {
  /** cl: array<struct<band:int, hi:long, lo:long>> (any order, bands
    * may be missing) → array<long> of 2·bands cells. */
  def pack(cl: ArrayData, bands: Int): ArrayData = {
    val out = Array.fill(2 * bands)(-1L)
    if (cl != null) {
      val n = cl.numElements()
      var i = 0
      while (i < n) {
        if (!cl.isNullAt(i)) {
          val r = cl.getStruct(i, 3)
          val b = r.getInt(0)
          if (b >= 0 && b < bands) {
            out(2 * b) = r.getLong(1)
            out(2 * b + 1) = r.getLong(2)
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** First band where both packed cell arrays hold the SAME un-capped
    * bucket, or -1. The group-synthesis filter `firstShared == band`
    * keeps exactly one copy of every colliding pair — the de-dup the
    * self-join path paid a corpus-scale `distinct()` for. */
  def firstShared(a: ArrayData, b: ArrayData): Int = {
    if (a == null || b == null) return -1
    val n = math.min(a.numElements(), b.numElements()) / 2
    var i = 0
    while (i < n) {
      val hi = a.getLong(2 * i)
      if (hi != -1L && hi == b.getLong(2 * i) &&
          a.getLong(2 * i + 1) == b.getLong(2 * i + 1)) return i
      i += 1
    }
    -1
  }
}

/** `lsh_cells(cl)`: packed 2·bands cell array (never null). */
case class LshCellsExpr(child: Expression, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    LshCellsKernel.pack(child.eval(input).asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.LshCellsKernel.pack(
          ${c.isNull} ? null : ${c.value}, $bands);
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `first_shared_band(cells_a, cells_b)`: see [[LshCellsKernel]]. */
case class FirstSharedBandExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    LshCellsKernel.firstShared(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      int ${ev.value} = graft.pipeline.LshCellsKernel.firstShared(
        ${l.isNull} ? null : ${l.value},
        ${r.isNull} ? null : ${r.value});
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
