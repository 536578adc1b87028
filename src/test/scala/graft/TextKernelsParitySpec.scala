package graft

import graft.pipeline.TextAnalysis
import scala.util.Random

/** The per-document repetition kernel must be value-exact against the
  * explode-and-aggregate form it replaced (which is also the DuckDB
  * oracle's formulation) — same gram construction, same HALF_UP
  * rounding, same drop rules for null and too-short texts. */
class TextKernelsParitySpec extends SparkSpec {

  private def compare(texts: Seq[String]): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).toSeq
    assert(rows(TextAnalysis.repetitionSignals(df)) ==
      rows(TextAnalysis.repetitionSignalsColumns(df)))
  }

  test("kernel ≡ aggregation form on a small-vocab random corpus (heavy repeats)") {
    val rnd = new Random(41)
    val vocab = Seq("a", "b", "c", "the", "")
    compare((1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(50))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")))
  }

  test("kernel ≡ aggregation form on degenerate docs (short, null, spaces)") {
    compare(Seq("", "one", "a b", "a b c", "a  b  c", null,
      "x x x x x x x x", "a b a b a b"))
  }
}
