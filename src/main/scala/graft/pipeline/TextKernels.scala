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
