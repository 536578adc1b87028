package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003) as ONE codegen'd kernel pass per document.
  *
  * Character k-grams at stride 1 are hashed (same 60-bit md5-prefix
  * mod P scheme as [[MinhashKernel]], so the DuckDB oracle reproduces
  * every value), then each window of `w` consecutive gram hashes
  * contributes its minimum; the distinct sorted selection is the
  * fingerprint set. The winnowing guarantee: any substring of length
  * ≥ k+w-1 shared verbatim by two documents yields at least one
  * shared fingerprint — position-robust span-level overlap detection,
  * the local complement to MinHash's whole-document similarity
  * (reference scope: riemann has no document ops; this extends the
  * LLM-pipeline layer).
  *
  * The column form in [[TextAnalysis.winnowColumns]] is the executable
  * spec (O(n·w) interpreted lambdas); this kernel computes the same
  * values with an O(n) monotonic-deque sliding minimum, hashing each
  * gram's bytes directly (no hex-string round trip). Substring
  * semantics use `UTF8String.substringSQL`, the exact unit Spark's
  * `substring` uses, so parity holds beyond ASCII too.
  */
object WinnowKernel {

  /** UTF-8 sequence length from its first byte (invalid lead bytes
    * count 1, mirroring UTF8String's forgiving walk). */
  private def seqLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xe0) == 0xc0) 2
    else if ((b & 0xf0) == 0xe0) 3
    else if ((b & 0xf8) == 0xf0) 4
    else 1

  /** Sorted distinct winnowed fingerprints of `text`, or null for null
    * text (matching the column form's null propagation). A document
    * shorter than k contributes its whole text as the single gram.
    *
    * Hot-loop discipline (this runs once per k-gram, ~n times per
    * document): grams are hashed as byte RANGES of the one UTF-8
    * buffer — the identical bytes `substring` would copy out — via a
    * reusable digest buffer, so the loop allocates nothing. A
    * codepoint-offset table keeps gram boundaries in the same
    * character units Spark's `substring` uses (WinnowParitySpec pins
    * parity with the column form). The first cut of this kernel
    * allocated a UTF8String + digest array per gram and box-sorted a
    * TreeSet: 3x slower on the sf0.1 bench. */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    if (text == null) return null
    val bytes = text.getBytes
    // codepoint start offsets: off(j) = byte offset of char j
    var n = 0
    var i = 0
    while (i < bytes.length) { i += seqLen(bytes(i)); n += 1 }
    val off = new Array[Int](n + 1)
    i = 0; var j = 0
    while (i < bytes.length) { off(j) = i; i += seqLen(bytes(i)); j += 1 }
    off(n) = bytes.length
    val nGrams = math.max(n - k, 0) + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val hs = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      val start = off(i)
      val end = off(math.min(i + k, n))
      md.reset()
      md.update(bytes, start, end - start)
      md.digest(dig, 0, 16)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = (h << 4) | ((dig(7) >> 4) & 0xfL)
      hs(i) = h % Dedup.MinhashP
      i += 1
    }
    val nWin = math.max(nGrams - w, 0) + 1
    // O(n) sliding minimum: monotonic deque of candidate indices
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // deque occupies [head, tail)
    val sel = new Array[Long](nWin)
    var selLen = 0
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      val windowStart = i - w + 1 // window [windowStart, i]
      while (deque(head) < windowStart) head += 1 // i itself is enqueued
      // windows are complete once i >= w-1; if the doc has fewer grams
      // than w there is exactly one (clamped) window, emitted at the end
      if (i >= w - 1) { sel(selLen) = hs(deque(head)); selLen += 1 }
      i += 1
    }
    if (nWin == 1 && nGrams < w) { sel(0) = hs(deque(head)); selLen = 1 }
    java.util.Arrays.sort(sel, 0, selLen)
    var distinct = 0
    i = 0
    while (i < selLen) { // count + compact in place
      if (i == 0 || sel(i) != sel(i - 1)) { sel(distinct) = sel(i); distinct += 1 }
      i += 1
    }
    val out = new Array[Any](distinct)
    i = 0
    while (i < distinct) { out(i) = sel(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow(text, k, w)`: sorted distinct fingerprint hashes as
  * array&lt;long&gt;. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow k and w must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(text: Any): Any =
    WinnowKernel.fingerprints(text.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.pipeline.WinnowKernel.fingerprints($c, $k, $w);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
