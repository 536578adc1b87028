package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

/** The one-pass [[graft.pipeline.NormalizeKernel]] must be bit-exact
  * against the decimal-norm column form — the unit vectors feed every
  * cosine in the similarity layer, so a single differing bit would
  * shift oracle-gated rankings. */
class NormalizeParitySpec extends SparkSpec {

  test("kernel ≡ column form on random float vectors (incl. tiny/huge/negative)") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new Random(21)
    def v(n: Int): Seq[java.lang.Float] = Seq.fill(n)(
      java.lang.Float.valueOf((rnd.nextGaussian() *
        math.pow(10, rnd.nextInt(7) - 3)).toFloat))
    val rows: Seq[Seq[java.lang.Float]] =
      (1 to 80).map(_ => v(64)) ++ (1 to 10).map(_ => v(7)) ++ Seq(
        Seq.empty,
        null,
        v(5).updated(2, null: java.lang.Float),
        // decimal-overflow parity (ADVICE r6): element square >= 1e20
        // nulls the (38,18) cast; sum of squares >= 1e20 nulls the
        // accumulator re-cast; NaN/Infinity null the double->decimal
        // cast — all four must match the column form's all-null output
        Seq(java.lang.Float.valueOf(2e10f), java.lang.Float.valueOf(1f)),
        Seq(java.lang.Float.valueOf(9e9f), java.lang.Float.valueOf(9e9f),
          java.lang.Float.valueOf(-3f)),
        Seq(java.lang.Float.valueOf(Float.NaN), java.lang.Float.valueOf(1f)),
        Seq(java.lang.Float.valueOf(Float.PositiveInfinity),
          java.lang.Float.valueOf(2f)),
        // just under the cap: 9.9e9^2 ≈ 9.8e19 < 1e20 stays finite
        Seq(java.lang.Float.valueOf(9.9e9f)))
    val df = rows.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "emb")
    def rowsOf(c: org.apache.spark.sql.Column) =
      df.select(col("id"), c.as("u")).orderBy("id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[Any](1).toList))
    // ANSI off for the column form: under Spark 4's default ANSI mode
    // the decimal-overflow rows THROW in the cast; the kernel keeps the
    // permissive overflow->null semantics (a pathological embedding
    // must null-poison its own row, not kill a 1000-executor job), so
    // parity is pinned against the permissive column form
    val (got, want) = try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      (rowsOf(Similarity.normalized(col("emb"))),
        rowsOf(Similarity.normalizedColumns(col("emb"))))
    } finally spark.conf.unset("spark.sql.ansi.enabled")
    // compare raw bits, not just ==: NaN != NaN under ==
    def bits(x: Any): Any = x match {
      case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d)
      case other => other
    }
    assert(got.map { case (i, l) =>
      i -> (if (l == null) null else l.map(bits)) }.toSeq ==
      want.map { case (i, l) =>
        i -> (if (l == null) null else l.map(bits)) }.toSeq)
  }

  test("kernel ≡ column form on the real embeddings table end to end") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = emb.select(col("vec_id"),
      Similarity.normalized(col("embedding")).as("u"))
      .orderBy("vec_id").collect().map(_.toString)
    val want = emb.select(col("vec_id"),
      Similarity.normalizedColumns(col("embedding")).as("u"))
      .orderBy("vec_id").collect().map(_.toString)
    assert(got.toSeq == want.toSeq)
  }
}
