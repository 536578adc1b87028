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

  /** First 60 bits of the md5 digest (= the 15 hex chars the column
    * form parses) reduced mod P — identical to MinhashKernel's scheme. */
  private def gramHash(md: java.security.MessageDigest,
      s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) >> 4) & 0xfL)
    h % Dedup.MinhashP
  }

  /** Sorted distinct winnowed fingerprints of `text`, or null for null
    * text (matching the column form's null propagation). A document
    * shorter than k contributes its whole text as the single gram. */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    if (text == null) return null
    val n = text.numChars()
    val nGrams = math.max(n - k, 0) + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hs(i) = gramHash(md, text.substringSQL(i + 1, k))
      i += 1
    }
    val nWin = math.max(nGrams - w, 0) + 1
    // O(n) sliding minimum: monotonic deque of candidate indices
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // deque occupies [head, tail)
    val selected = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      val windowStart = i - w + 1 // window [windowStart, i]
      while (deque(head) < windowStart) head += 1 // i itself is enqueued
      // windows are complete once i >= w-1; if the doc has fewer grams
      // than w there is exactly one (clamped) window, emitted at the end
      if (i >= w - 1) selected.add(hs(deque(head)))
      i += 1
    }
    if (nWin == 1 && nGrams < w) selected.add(hs(deque(head)))
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
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
