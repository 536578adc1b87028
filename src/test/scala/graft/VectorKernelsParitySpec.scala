package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

/** The one-pass [[graft.pipeline.VectorKernels]] expressions must be
  * value-exact against the zip_with/aggregate column forms they
  * replaced — including zip_with's null-padding conventions (null
  * arrays, length mismatches, null elements) and the bucket's
  * fall-to-zero behavior. */
class VectorKernelsParitySpec extends SparkSpec {

  private def vecs(rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])]) = {
    val spark0 = spark
    import spark0.implicits._
    rows.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
  }

  test("dotExact kernel ≡ column form on random unit-ish vectors and null edges") {
    val rnd = new Random(11)
    def v(n: Int): Seq[java.lang.Double] =
      Seq.fill(n)(java.lang.Double.valueOf(rnd.nextDouble() * 2 - 1))
    val rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] =
      (1 to 50).map(_ => (v(64), v(64))) ++ Seq(
        (v(64), null),                        // null side
        (null, null),
        (v(8), v(4)),                         // length mismatch -> null
        (Seq.empty, Seq.empty),               // empty -> 0.0
        (v(3).updated(1, null: java.lang.Double), v(3))) // null element
    val df = vecs(rows)
    val got = df.select(col("id"),
      Similarity.dotExact(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    val want = df.select(col("id"),
      Similarity.dotExactColumns(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("plane project kernel ≡ column form incl. null paths -> null array") {
    val rnd = new Random(17)
    def v(n: Int): Seq[java.lang.Double] =
      Seq.fill(n)(java.lang.Double.valueOf(rnd.nextDouble() * 2 - 1))
    val rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] =
      (1 to 40).map(_ => (v(64), v(64))) ++ Seq(
        (null, v(64)),                         // null -> null
        (v(10), v(64)),                        // wrong dims -> null
        (v(64).updated(7, null: java.lang.Double), v(64))) // null elem -> null
    val df = vecs(rows)
    for (outDims <- Seq(4, 16, 32)) {
      val got = df.select(col("id"),
        Similarity.rpScaled(col("a"), outDims, 64).as("p")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      val want = df.select(col("id"),
        Similarity.rpScaledColumns(col("a"), outDims, 64).as("p")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      assert(got.toSeq == want.toSeq, s"outDims=$outDims")
    }
  }

  test("plane bucket kernel ≡ column form incl. degenerate inputs -> 0") {
    val rnd = new Random(13)
    def v(n: Int): Seq[java.lang.Double] =
      Seq.fill(n)(java.lang.Double.valueOf(rnd.nextDouble() * 2 - 1))
    val rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] =
      (1 to 40).map(_ => (v(64), v(64))) ++ Seq(
        (null, v(64)),                         // null -> bucket 0
        (v(10), v(64)),                        // wrong dims -> bucket 0
        (v(64).updated(7, null: java.lang.Double), v(64))) // null element -> 0
    val df = vecs(rows)
    for ((planes, off) <- Seq((8, 0), (16, 0), (4, 8))) {
      val got = df.select(col("id"),
        Similarity.bucketExpr(col("a"), planes, 64, off).as("bk")).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val want = df.select(col("id"),
        Similarity.bucketExprColumns(col("a"), planes, 64, off).as("bk"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(got.toSeq == want.toSeq, s"planes=$planes offset=$off")
    }
  }
}
