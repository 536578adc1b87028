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
