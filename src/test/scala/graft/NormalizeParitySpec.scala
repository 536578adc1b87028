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
        v(5).updated(2, null: java.lang.Float))
    val df = rows.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "emb")
    def rowsOf(c: org.apache.spark.sql.Column) =
      df.select(col("id"), c.as("u")).orderBy("id").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[Any](1).toList))
    val got = rowsOf(Similarity.normalized(col("emb")))
    val want = rowsOf(Similarity.normalizedColumns(col("emb")))
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
