package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
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
