package graft.pipeline

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition signals as ONE kernel pass — the
  * explode-and-aggregate form shuffles every (doc, gram) pair twice to
  * compute what is a pure per-document function; at 100 TB that is two
  * full-corpus exchanges for values a map-side loop over each text
  * computes exactly. Output values are identical to the aggregation
  * form (TextKernelsParitySpec pins them, and the DuckDB oracle is
  * unchanged): grams are the same element_at chains, fractions round
  * HALF_UP to 4 digits like Spark's `round`, and documents too short
  * for trigrams (or with null text) drop — the inline() of a 0-or-1
  * array reproduces the explode-then-inner-join row semantics. */
object TextKernels {

  val repetitionStruct: StructType = StructType(Seq(
    StructField("top_bigram_frac", DoubleType),
    StructField("dup_2gram_frac", DoubleType),
    StructField("dup_3gram_frac", DoubleType)))

  private val Empty = new GenericArrayData(Array.empty[Any])

  private def round4(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** (max count, total grams, distinct grams) of the k-grams. */
  private def gramStats(words: Array[String], k: Int): (Long, Long, Long) = {
    val n = words.length
    if (n < k) return (0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    var mx = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > mx) mx = c }
    (mx, (n - k + 1).toLong, counts.size().toLong)
  }

  def repetition(text: UTF8String): ArrayData = {
    if (text == null) return Empty
    val words = text.toString.split(" ", -1)
    val (mx2, tot2, nd2) = gramStats(words, 2)
    val (_, tot3, nd3) = gramStats(words, 3)
    if (tot3 == 0) return Empty // too short for trigrams: row drops
    new GenericArrayData(Array[Any](new GenericInternalRow(Array[Any](
      round4(mx2.toDouble / tot2),
      round4((tot2 - nd2).toDouble / tot2),
      round4((tot3 - nd3).toDouble / tot3)))))
  }
}

/** The five Gopher quality signals as ONE kernel pass (the column form
  * is a HOF-heavy predicate — interpreted lambdas, with the trigram
  * array re-built per reference; this is a pure per-document function,
  * so compute it map-side in one loop). Value-exact against the column
  * [[TextAnalysis.gopherSignals]] formula (same split-with-trailing-
  * empties tokenization, same code-point length, same divide-then-
  * subtract dup3 shape, same HALF_UP rounding; pinned by
  * GopherKernelParity in PipelineSpec and the unchanged q_gopher_filter
  * oracle row). Null text → null struct (the column form's comparisons
  * all go null and the row drops). */
object GopherKernel {

  val signalStruct: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = true),
    StructField("mean_token_len", DoubleType, nullable = true),
    StructField("n_stopwords", IntegerType, nullable = true),
    StructField("symbol_ratio", DoubleType, nullable = true),
    StructField("dup_3gram_frac", DoubleType, nullable = false)))

  /** Null text under the COLUMN form: every signal goes null EXCEPT
    * dup_3gram_frac — its `when(size(g3) > 0, …).otherwise(0.0)` takes
    * the otherwise branch (null condition), so it is 0.0 and
    * ok_repetition is TRUE while the other verdicts (and the keep
    * conjunction) are null. The kernel reproduces that row exactly. */
  private val NullTextRow =
    new GenericInternalRow(Array[Any](null, null, null, null, 0.0))

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextAnalysis.stopwords.foreach(w => { s.add(w); () })
    s
  }

  private val SymbolPat = java.util.regex.Pattern.compile("#|\\.\\.\\.")

  private def round4(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP).doubleValue()

  def signals(text: UTF8String): GenericInternalRow = {
    if (text == null) return NullTextRow
    val str = text.toString
    // split(text, " ") keeps trailing empties (Java limit -1 semantics)
    val words = str.split(" ", -1)
    val nTok = words.length
    // Spark length() counts code points, not UTF-16 units
    val meanLen = round4(text.numChars().toDouble / nTok.toDouble)
    var nStop = 0
    var i = 0
    while (i < nTok) {
      if (stopSet.contains(words(i))) nStop += 1
      i += 1
    }
    var nSym = 0
    val m = SymbolPat.matcher(str)
    while (m.find()) nSym += 1
    val symRatio = round4(nSym.toDouble / nTok.toDouble)
    val dup3 =
      if (nTok < 3) 0.0
      else {
        val tot3 = nTok - 2
        val seen = new java.util.HashSet[String](tot3 * 2)
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < tot3) {
          sb.setLength(0)
          sb.append(words(j)).append(' ').append(words(j + 1))
            .append(' ').append(words(j + 2))
          seen.add(sb.toString)
          j += 1
        }
        // the column form's exact shape: 1.0 - distinct/total (divide
        // first, subtract second — NOT (total-distinct)/total)
        round4(1.0 - seen.size().toDouble / tot3.toDouble)
      }
    new GenericInternalRow(Array[Any](nTok, meanLen, nStop, symRatio, dup3))
  }
}

/** `gopher_signals(text)`: [[GopherKernel.signalStruct]] (never null —
  * null text yields the column form's partial-null row). */
case class GopherExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GopherKernel.signalStruct
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    GopherKernel.signals(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} = graft.pipeline.GopherKernel.signals(
        ${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `repetition(text)`: 0-or-1 [[TextKernels.repetitionStruct]],
  * consumed via `inline`. */
case class RepetitionExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(TextKernels.repetitionStruct, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextKernels.repetition(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.pipeline.TextKernels.repetition(
          ${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
