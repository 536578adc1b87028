package graft

import graft.pipeline.Bpe
import scala.util.Random

/** The memoized BPE count kernel ([[graft.pipeline.BpeCountExpr]]) must
  * be value-exact against the expression-tree form it replaced (nested
  * codegen'd replaces — which is also the DuckDB oracle's unrolled-CTE
  * formulation): same pre-tokenizer, same Ġ space mapping, same
  * rank-ordered left-to-right merge rewrites. */
class BpeKernelParitySpec extends SparkSpec {

  private def compare(texts: Seq[String], merges: Seq[String]): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(rows(Bpe.encode(df, merges)) == rows(Bpe.encodeExpand(df, merges)))
  }

  private val trainedish = Seq("t h", "th e", "i n", "a n", "e r",
    "Ġ t", "Ġt h", "o n", "e s", "Ġ a", "an d", "Ġa n", "o r", "r e",
    "e n", "a t", "Ġth e", "i s", "e d", "in g")

  test("kernel ≡ expression tree on random English-ish text") {
    val rnd = new Random(43)
    val vocab = Seq("the", "and", "then", "other", "ingest", "we",
      "12", "3.14", "it's", "can't", "hello,", "world!", "a")
    compare((1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(40)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")),
      trainedish)
  }

  test("kernel ≡ expression tree on degenerate docs (empty, null, " +
    "newlines, non-BMP, repeated merges)") {
    compare(Seq("", "   ", null, "a\nb\nc", "the the the the",
      "😀 emoji 😀 text", "ĠĠ literal marks",
      "mixed 123 456 punct!!! ...", "ththththth"), trainedish)
  }

  test("encodeTokens == the driver-side fold's split symbols, and " +
    "sums to the count kernel") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "low lower newest widest low"),
      (2L, "the quick brown fox, 123 can't!"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.encodeTokens(docs, trainedish).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val re = graft.pipeline.TextAnalysis.BpeSplitRe.r
    docs.collect().foreach { r =>
      val expect = re.findAllIn(r.getString(1)).toSeq.flatMap { t =>
        trainedish.foldLeft(Bpe.initialSym(t))(Bpe.applyMerge)
          .split(" ").toSeq
      }
      assert(got(r.getLong(0)) == expect)
    }
    val counts = Bpe.encode(docs, trainedish).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    got.foreach { case (id, toks) => assert(toks.length.toLong == counts(id)) }
  }

  test("kernel ≡ expression tree under the entry surface's trained merges") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "low lower newest widest low"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "newest newest newest widest widest lowest"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, nMerges = 8, vocabCap = 50)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    compare(docs.orderBy("doc_id").collect()
      .map(r => r.getString(1)).toSeq, merges)
  }

  test("trained models ride Broadcast stubs: a production-scale merge " +
    "list adds ~nothing to the serialized expression tree") {
    import org.apache.spark.sql.graft.ColumnBridge
    def ser(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close()
      bos.size()
    }
    // 50k merges ≈ what a real tokenizer ships; as a literal Seq field
    // this was multi-MB in every stage's task binary
    val merges = (0 until 50000).map(i => s"tok${i} en${i % 97}").toArray
    assert(ser(merges) > 500000, "the model itself IS multi-hundred-KB")
    val bc = spark.sparkContext.broadcast(merges)
    val expr = graft.pipeline.BpeCountExpr(
      ColumnBridge.expression(org.apache.spark.sql.functions.col("text")),
      bc)
    val exprSize = ser(expr)
    assert(exprSize < 65536,
      s"expression tree must carry a stub, got $exprSize bytes")
    // and the stub still resolves: kernel output matches a literal run
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "tok1 en1 zzz")).toDF("doc_id", "text")
    val viaBc = Bpe.encode(docs, merges.toSeq).collect().head
    assert(viaBc.getLong(1) == 5L) // pretokens counted under the model
  }
}
