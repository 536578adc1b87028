package graft.pipeline

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass L2 normalization kernel, value-exact with
  * [[Similarity.normalizedColumns]] — cast each element to double,
  * square, cast to decimal(38,18) (the Double.toString-based
  * conversion Spark's double→decimal cast performs, then HALF_UP to 18
  * digits), sum exactly, back to double, sqrt, divide. The column form
  * runs two interpreted lambdas plus a decimal box per element per
  * row; this folds the norm and the division in one traversal.
  *
  * Null conventions (pinned by NormalizeParitySpec): null array →
  * null; a null element null-poisons the decimal sum, so the norm and
  * EVERY output element are null (zip_with divides each x by the null
  * norm); empty array → empty array. Decimal OVERFLOW also nulls,
  * exactly like the column spec: a square that is NaN/Infinite or
  * ≥ 1e20 nulls the (x*x)→decimal(38,18) cast, and a running sum
  * ≥ 1e20 nulls the per-step re-cast to decimal(38,18) (20 integer
  * digits is the cap at scale 18) — either way the norm is null and
  * the whole output is null, never a silently-finite vector. These are
  * the PERMISSIVE (non-ANSI) cast semantics: under Spark 4's default
  * ANSI mode the column form instead throws on overflow; the kernel
  * deliberately keeps overflow→null so one pathological embedding
  * null-poisons its own row instead of failing the whole job. */
object NormalizeKernel {

  // decimal(38,18) holds at most 20 integer digits: |v| >= 1e20 is the
  // overflow->null threshold of both the element cast and the per-step
  // accumulator re-cast in Similarity.normalizedColumns
  private val cap38s18 = new JBigDecimal("1E20")

  def normalize(a: ArrayData, elemIsFloat: Boolean): ArrayData = {
    if (a == null) return null
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val xs = new Array[Double](n)
    var acc = JBigDecimal.ZERO
    var poisoned = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) poisoned = true
      else {
        val x = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        xs(i) = x
        if (!poisoned) {
          val sq = x * x
          if (java.lang.Double.isNaN(sq) || java.lang.Double.isInfinite(sq)) {
            // double->decimal cast of NaN/Infinity is null
            poisoned = true
          } else {
            // Decimal(d) = BigDecimal over Double.toString, then
            // changePrecision(38,18) = HALF_UP to scale 18 — null on
            // overflow. The running add is decimal(38,18)+decimal(38,18)
            // → decimal(38,17) (Spark's allowPrecisionLoss cap:
            // 18+20+1=39 > 38 drops a scale digit, HALF_UP), re-cast to
            // scale 18 by the lambda — null on overflow; so every step
            // rounds to 17 decimals and caps at 20 integer digits.
            val sqDec = JBigDecimal.valueOf(sq)
              .setScale(18, RoundingMode.HALF_UP)
            if (sqDec.abs.compareTo(cap38s18) >= 0) poisoned = true
            else {
              acc = acc.add(sqDec).setScale(17, RoundingMode.HALF_UP)
              if (acc.abs.compareTo(cap38s18) >= 0) poisoned = true
            }
          }
        }
      }
      i += 1
    }
    if (poisoned) {
      // null element / decimal overflow -> null norm -> all-null output
      return new GenericArrayData(Array.fill[Any](n)(null))
    }
    val norm = math.sqrt(acc.doubleValue())
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = xs(i) / norm; i += 1 }
    new GenericArrayData(out)
  }
}

/** `l2_normalize(a)`: the unit vector as array<double>. */
case class NormalizeExpr(child: Expression) extends UnaryExpression {
  // lazy: child.dataType is unresolved at construction from the
  // DataFrame API; only eval/codegen (post-analysis) may ask for it
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernel.normalize(input.asInstanceOf[ArrayData], elemIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.pipeline.NormalizeKernel.normalize($c, $elemIsFloat)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
