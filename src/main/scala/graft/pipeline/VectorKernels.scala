package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass vector kernels behind codegen'd Catalyst expressions — the
  * replacements for the similarity layer's `zip_with`/`aggregate`
  * higher-order lambdas (interpreted, boxed, and one full traversal per
  * hyperplane). Semantics are element-exact with the column forms they
  * replace, including the null conventions `zip_with`'s padding
  * produces (SimilarityParitySpec pins all of them):
  *
  *  - scaled dot: null input array, length mismatch, or any null
  *    element → NULL (a padded null poisons the long sum);
  *  - plane bucket: the same conditions make every plane's projection
  *    NULL, so every `when(proj >= 0, ...)` falls to its 0 branch —
  *    the bucket is 0, never null. */
object VectorKernels {

  /** `aggregate(zip_with(a, b, (x, y) => floor(x*y*scale)), 0L, _+_)`,
    * boxed-null on any of zip_with's null paths. */
  def dotScaled(a: ArrayData, b: ArrayData, scale: Double): java.lang.Long = {
    if (a == null || b == null) return null
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null // zip_with pads the short side with nulls
    var acc = 0L
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += math.floor(a.getDouble(i) * b.getDouble(i) * scale).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  private val planeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int), Array[Array[Double]]]()
  private def planes(nPlanes: Int, dims: Int, offset: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dims, offset), _ =>
      Array.tabulate(nPlanes, dims)((p, d) =>
        Similarity.planeComponent(offset + p, d)))

  /** All `nPlanes` sign projections in one traversal; any zip_with
    * null path zeroes every plane's contribution (see class doc). */
  def planeBucket(unit: ArrayData, nPlanes: Int, dims: Int,
      offset: Int): Long = {
    if (unit == null || unit.numElements() != dims) return 0L
    val h = planes(nPlanes, dims, offset)
    val acc = new Array[Long](nPlanes)
    var i = 0
    while (i < dims) {
      if (unit.isNullAt(i)) return 0L
      val x = unit.getDouble(i)
      var p = 0
      while (p < nPlanes) {
        acc(p) += math.floor(x * h(p)(i) * 1e12).toLong
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      if (acc(p) >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** All `outDims` plane projections of the JL random-projection
    * matrix in one traversal, as 1e12-scaled longs (proj[j] = Σᵢ
    * floor(xᵢ · plane(offset+j)ᵢ · 1e12)). Null conventions match
    * [[dotScaled]] — null input, wrong length, or a null element →
    * null (a projection of garbage is not a zero vector). */
  def planeProject(unit: ArrayData, outDims: Int, dims: Int,
      offset: Int): GenericArrayData = {
    if (unit == null || unit.numElements() != dims) return null
    val h = planes(outDims, dims, offset)
    val acc = new Array[Long](outDims)
    var i = 0
    while (i < dims) {
      if (unit.isNullAt(i)) return null
      val x = unit.getDouble(i)
      var p = 0
      while (p < outDims) {
        acc(p) += math.floor(x * h(p)(i) * 1e12).toLong
        p += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** `aggregate(zip_with(a, b, (x, y) => floor((x-y)*(x-y)*scale)), 0L, _+_)`
    * — the scaled squared-L2 distance used for PQ residual encoding
    * (min-L2 is the quantization objective that bounds |q·x − q·x̂|;
    * max-dot would favor large-norm codewords on non-unit residuals).
    * Null conventions identical to [[dotScaled]]. */
  def l2Scaled(a: ArrayData, b: ArrayData, scale: Double): java.lang.Long = {
    if (a == null || b == null) return null
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null
    var acc = 0L
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += math.floor(d * d * scale).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Nearest-codeword label by scaled squared-L2 ([[l2Scaled]], 1e12),
    * ties to the SMALLEST label — the ordering `row_number over
    * (order by d ASC NULLS LAST, label)` materializes (a null distance
    * loses to every real one). Null svec or empty cents → null. */
  def argminCellL2(svec: ArrayData, cents: ArrayData): java.lang.Integer = {
    if (svec == null || cents == null) return null
    val n = cents.numElements()
    var found = false
    var bestLabel = 0
    var bestScore = 0L
    var bestHasScore = false
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 2)
        val label = row.getInt(0)
        val s = l2Scaled(svec, row.getArray(1), 1e12)
        val better =
          if (!found) true
          else if (s == null) !bestHasScore && label < bestLabel
          else if (!bestHasScore) true
          else if (s.longValue != bestScore) s.longValue < bestScore
          else label < bestLabel
        if (better) {
          bestLabel = label
          bestHasScore = s != null
          bestScore = if (s == null) 0L else s.longValue
          found = true
        }
      }
      i += 1
    }
    if (found) java.lang.Integer.valueOf(bestLabel) else null
  }

  /** Nearest-centroid label by scaled dot, ties to the SMALLEST label —
    * exactly the ordering `row_number over (order by score desc, label)`
    * materializes in the windowed spec (including its nulls-last desc
    * rule for a null score). `cents` is an array of
    * struct(label int, cvec array double). Null unit or empty cents →
    * null. */
  def argmaxCell(unit: ArrayData, cents: ArrayData): java.lang.Integer = {
    if (unit == null || cents == null) return null
    val n = cents.numElements()
    var found = false
    var bestLabel = 0
    var bestScore = 0L
    var bestHasScore = false
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 2)
        val label = row.getInt(0)
        val s = dotScaled(unit, row.getArray(1), 1e16)
        val better =
          if (!found) true
          else if (s == null) !bestHasScore && label < bestLabel
          else if (!bestHasScore) true
          else if (s.longValue != bestScore) s.longValue > bestScore
          else label < bestLabel
        if (better) {
          bestLabel = label
          bestHasScore = s != null
          bestScore = if (s == null) 0L else s.longValue
          found = true
        }
      }
      i += 1
    }
    if (found) java.lang.Integer.valueOf(bestLabel) else null
  }
}

/** `dot_scaled(a, b)`: Σ floor(aᵢ·bᵢ·scale) as a long; null on any
  * zip_with null path. */
case class DotScaledExpr(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val r = VectorKernels.dotScaled(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData], scale)
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("dotBoxed")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      java.lang.Long $boxed = graft.pipeline.VectorKernels.dotScaled(
        ${l.isNull} ? null : ${l.value},
        ${r.isNull} ? null : ${r.value}, $scale);
      boolean ${ev.isNull} = $boxed == null;
      long ${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
      """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `argmin_cell_l2(svec, cents)`: the nearest codeword's label by
  * scaled squared-L2 distance, ties to the smallest label; null on
  * null svec / empty cents. The PQ-residual encode kernel. */
case class CellArgminL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val r = VectorKernels.argminCellL2(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
    if (r == null) null else r.intValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("cellL2Boxed")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      java.lang.Integer $boxed = graft.pipeline.VectorKernels.argminCellL2(
        ${l.isNull} ? null : ${l.value},
        ${r.isNull} ? null : ${r.value});
      boolean ${ev.isNull} = $boxed == null;
      int ${ev.value} = ${ev.isNull} ? -1 : $boxed.intValue();
      """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `plane_bucket(unit)`: the packed sign bits of `nPlanes` hyperplane
  * projections — 0 (not null) on degenerate input. */
case class PlaneBucketExpr(child: Expression, nPlanes: Int, dims: Int,
    offset: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    VectorKernels.planeBucket(
      child.eval(input).asInstanceOf[ArrayData], nPlanes, dims, offset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = graft.pipeline.VectorKernels.planeBucket(
        ${c.isNull} ? null : ${c.value}, $nPlanes, $dims, $offset);
      """, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `plane_project(unit)`: all `outDims` JL projections as 1e12-scaled
  * longs in one traversal; null on any zip_with null path. */
case class PlaneProjectExpr(child: Expression, outDims: Int, dims: Int,
    offset: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any =
    VectorKernels.planeProject(
      child.eval(input).asInstanceOf[ArrayData], outDims, dims, offset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val arr = ctx.freshName("projArr")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
        graft.pipeline.VectorKernels.planeProject(
          ${c.isNull} ? null : ${c.value}, $outDims, $dims, $offset);
      boolean ${ev.isNull} = $arr == null;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $arr;
      """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `argmax_cell(unit, cents)`: the nearest centroid's label by scaled
  * dot, ties to the smallest label; null on null unit / empty cents. */
case class CellArgmaxExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val r = VectorKernels.argmaxCell(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
    if (r == null) null else r.intValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("cellBoxed")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      java.lang.Integer $boxed = graft.pipeline.VectorKernels.argmaxCell(
        ${l.isNull} ? null : ${l.value},
        ${r.isNull} ? null : ${r.value});
      boolean ${ev.isNull} = $boxed == null;
      int ${ev.value} = ${ev.isNull} ? -1 : $boxed.intValue();
      """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
