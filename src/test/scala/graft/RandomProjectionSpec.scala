package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.pipeline.Similarity

/** Johnson–Lindenstrauss random projection semantics: unbiased
  * distance preservation (the 1/12 plane-entry variance is corrected
  * for), nested plane sets across output dimensionalities, and
  * recall-audit invariants. */
class RandomProjectionSpec extends SparkSpec {

  private def fixture(n: Int, seed: Int = 41) = {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new Random(seed)
    (0 until n).map { i =>
      (i.toLong, i % 4, Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "label", "embedding")
  }

  test("distortion ratio is unbiased: mean ≈ 1 over sample pairs, " +
    "every projected gap positive for distinct vectors") {
    val d = Similarity.rpDistortion(fixture(40), (0L until 20L).toSeq, 16)
      .collect()
    assert(d.length == 20 * 19 / 2)
    val ratios = d.map(_.getAs[Double]("ratio"))
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"JL concentration blown: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"biased estimator: mean=$mean")
    assert(d.forall(_.getAs[Double]("d2_proj") > 0.0))
  }

  test("plane sets nest: the 16-d projection is the first 16 " +
    "components of the 32-d one (before the √outDims divisor)") {
    val f = fixture(10)
    val u = Similarity.normalized(col("embedding"))
    val rows = f.select(col("vec_id"),
        Similarity.rpScaled(u, 16).as("p16"),
        Similarity.rpScaled(u, 32).as("p32"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2).take(16))
    }
  }

  test("rpRecall: one column per compression level, recalls in [0,1], " +
    "deterministic across runs") {
    val f = fixture(60)
    val r1 = Similarity.rpRecall(f, Seq(0L, 1L, 2L), 5, Seq(16, 32))
      .orderBy("query_id").collect()
    val r2 = Similarity.rpRecall(f, Seq(0L, 1L, 2L), 5, Seq(16, 32))
      .orderBy("query_id").collect()
    assert(r1.toSeq == r2.toSeq)
    assert(r1.length == 3)
    assert(r1.head.schema.fieldNames.toSeq ==
      Seq("query_id", "rp16_recall", "rp32_recall"))
    r1.foreach { r =>
      Seq("rp16_recall", "rp32_recall").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0)
      }
    }
  }

  test("randomProject: outDims components, engine-deterministic, and " +
    "projected dots estimate cosines on a separated fixture") {
    val spark0 = spark
    import spark0.implicits._
    // two tight clusters far apart: projected dot must keep
    // within-cluster pairs above cross-cluster pairs
    val rnd = new Random(7)
    def jitter(base: Array[Float]): Seq[Float] =
      base.map(x => x + rnd.nextFloat() * 0.02f).toSeq
    val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val b = a.map(x => -x)
    val f = ((0 until 5).map(i => (i.toLong, 0, jitter(a))) ++
      (5 until 10).map(i => (i.toLong, 1, jitter(b))))
      .toDF("vec_id", "label", "embedding")
    val rp = Similarity.randomProject(f, 16).collect()
    assert(rp.forall(_.getSeq[Double](2).length == 16))
    val byId = rp.map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    def pdot(x: Seq[Double], y: Seq[Double]): Double =
      x.zip(y).map { case (p, q) => p * q }.sum
    val within = pdot(byId(0L), byId(1L))
    val cross = pdot(byId(0L), byId(5L))
    assert(within > 0.5 && cross < -0.5,
      s"projected geometry lost: within=$within cross=$cross")
  }
}
