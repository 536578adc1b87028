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
  * norm); empty array → empty array. */
object NormalizeKernel {

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
          // Decimal(d) = BigDecimal over Double.toString, then
          // changePrecision(38,18) = HALF_UP to scale 18. The running
          // add is decimal(38,18)+decimal(38,18) → decimal(38,17)
          // (Spark's allowPrecisionLoss cap: 18+20+1=39 > 38 drops a
          // scale digit, HALF_UP), re-cast to scale 18 by the lambda —
          // so every step rounds to 17 decimals; replicated exactly.
          acc = acc.add(JBigDecimal.valueOf(x * x)
            .setScale(18, RoundingMode.HALF_UP))
            .setScale(17, RoundingMode.HALF_UP)
        }
      }
      i += 1
    }
    if (poisoned) {
      // null element -> null norm -> all-null output of length n
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
