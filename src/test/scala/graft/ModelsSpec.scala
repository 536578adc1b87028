package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Bpe, Models, Similarity, TextAnalysis, Unigram}

/** Trained-artifact persistence: for every model kind, the reloaded
  * artifact applies bit-identically to a fresh train→apply, the
  * manifest's config hash (params + corpus fingerprint) gates reuse,
  * and a changed corpus forces a retrain instead of serving stale
  * predictions. */
class ModelsSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_models_spec").toString

  private def mtimes(root: String): Map[String, Long] = {
    val p = java.nio.file.Paths.get(root)
    if (!Files.exists(p)) return Map.empty
    val s = Files.walk(p)
    try s.iterator().asScala.filter(Files.isRegularFile(_))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis)
      .toMap
    finally s.close()
  }

  private def docsDf(n: Int = 40, salt: String = ""): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    (0 until n).map { i =>
      val lang = if (i % 2 == 0) "aa" else "zz"
      val text = if (i % 2 == 0) s"alpha bravo charlie delta $salt$i"
        else s"zulu xray quebec juliett $salt$i"
      (i.toLong, text, lang)
    }.toDF("doc_id", "text", "lang")
  }

  private def embDf(n: Int = 60): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, (i % 4).toLong,
        Array.fill(64)((rnd.nextInt(2000) - 1000) / 997.0f))
    }.toDF("vec_id", "label", "embedding")
  }

  test("langid: save→load→apply == train→apply, loadOrTrain reuses " +
    "the artifact, corpus change forces retrain") {
    val docs = docsDf()
    val root = tmpDir() + "/langid"
    val trained = TextAnalysis.langIdModel(docs)
    Models.saveLangId(spark, root, trained, Map("buckets" ->
      trained.buckets.toString))
    val loaded = Models.loadLangId(spark, root)
    assert(loaded.buckets == trained.buckets)
    assert(loaded.langs == trained.langs)
    assert(loaded.lnb == trained.lnb)
    assert(loaded.lcFlat.toSeq == trained.lcFlat.toSeq)
    assert(loaded.seen.toSeq == trained.seen.toSeq)
    val fresh = TextAnalysis.langIdApply(docs, trained)
      .collect().map(_.toSeq).toSet
    val reloaded = TextAnalysis.langIdApply(docs, loaded)
      .collect().map(_.toSeq).toSet
    assert(reloaded == fresh)

    // loadOrTrain: first call trains + saves, second call must NOT
    // rewrite the artifact (identical data files afterwards)
    val root2 = tmpDir() + "/langid_lot"
    val m1 = Models.loadOrTrainLangId(docs, root2)
    val t1 = mtimes(root2)
    assert(t1.nonEmpty)
    val m2 = Models.loadOrTrainLangId(docs, root2)
    assert(mtimes(root2) == t1, "second loadOrTrain rewrote the artifact")
    assert(m2.langs == m1.langs && m2.lcFlat.toSeq == m1.lcFlat.toSeq)
    // corpus change → fingerprint mismatch → retrain (files rewritten)
    val m3 = Models.loadOrTrainLangId(docsDf(salt = "CHANGED"), root2)
    assert(mtimes(root2) != t1, "changed corpus did not retrain")
    assert(m3.langs == m1.langs) // same label set, different counts
  }

  test("bpe merges: rank order survives the round-trip and encode " +
    "under the reloaded list matches train→encode") {
    val docs = docsDf()
    val root = tmpDir() + "/bpe"
    val merges = Bpe.trainMergeList(docs)
    Models.saveBpe(spark, root, merges, Map("n_merges" -> "x"))
    assert(Models.loadBpe(spark, root) == merges)
    val viaArtifact = Bpe.encode(docs, Models.loadBpe(spark, root))
      .collect().map(_.toSeq).toSet
    assert(viaArtifact ==
      Bpe.encode(docs, merges).collect().map(_.toSeq).toSet)
    // loadOrTrain round-trips to the identical list
    val root2 = tmpDir() + "/bpe_lot"
    assert(Models.loadOrTrainBpe(docs, root2) == merges)
    assert(Models.loadOrTrainBpe(docs, root2) == merges)
  }

  test("unigram vocab: (piece, usage, cost) order survives and the " +
    "reloaded model encodes identically") {
    val docs = docsDf()
    val root = tmpDir() + "/unigram"
    val model = Unigram.trainModel(docs)
    Models.saveUnigram(spark, root, model, Map.empty)
    assert(Models.loadUnigram(spark, root) == model)
    val viaArtifact =
      Unigram.encode(docs, Models.loadUnigram(spark, root))
        .collect().map(_.toSeq).toSet
    assert(viaArtifact ==
      Unigram.encode(docs, model).collect().map(_.toSeq).toSet)
    assert(Models.loadOrTrainUnigram(docs, tmpDir() + "/uni_lot") == model)
  }

  test("ivf centroids + pq codebooks: parquet round-trip is exact " +
    "(assignment/codes identical) and loadOrTrain reuses") {
    val emb = embDf()
    val rootI = tmpDir() + "/ivf"
    val cents = Similarity.ivfCentroidsRefined(emb, 1)
    Models.saveIvfCentroids(cents, rootI, Map("iters" -> "1"))
    val assignFresh = Similarity.ivfAssign(emb, cents)
      .select("vec_id", "cell").collect().map(_.toSeq).toSet
    val assignLoaded =
      Similarity.ivfAssign(emb, Models.loadIvfCentroids(spark, rootI))
        .select("vec_id", "cell").collect().map(_.toSeq).toSet
    assert(assignLoaded == assignFresh)
    val rootI2 = tmpDir() + "/ivf_lot"
    val c1 = Models.loadOrTrainIvfCentroids(emb, rootI2, 1)
      .collect().map(_.toSeq).toSet
    val t1 = mtimes(rootI2)
    val c2 = Models.loadOrTrainIvfCentroids(emb, rootI2, 1)
      .collect().map(_.toSeq).toSet
    assert(c2 == c1 && mtimes(rootI2) == t1)
    // different iters → different config hash → retrain
    Models.loadOrTrainIvfCentroids(emb, rootI2, 0)
    assert(mtimes(rootI2) != t1)

    val rootP = tmpDir() + "/pq"
    val cb = Similarity.pqCodebooksRefined(emb, 8, 1)
    Models.savePqCodebooks(cb, rootP, Map("m" -> "8"))
    val codesFresh = Similarity.pqEncode(emb, cb, 8)
      .select("vec_id", "codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    val codesLoaded =
      Similarity.pqEncode(emb, Models.loadPqCodebooks(spark, rootP), 8)
        .select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    assert(codesLoaded == codesFresh)
    val pq1 = Models.loadOrTrainPqCodebooks(emb, tmpDir() + "/pq_lot", 8, 1)
      .collect().map(_.toSeq).toSet
    assert(pq1 == cb.collect().map(_.toSeq).toSet)
  }

  test("manifest integrity: kind mismatch and format mismatch refuse " +
    "to load; missing manifest means no match") {
    val docs = docsDf()
    val root = tmpDir() + "/wrongkind"
    Models.saveBpe(spark, root, Seq("a b"), Map.empty)
    intercept[IllegalArgumentException] {
      Models.loadUnigram(spark, root)
    }
    assert(!Models.matches(spark, tmpDir() + "/absent", "bpe_merges",
      Map.empty))
    // config hash covers params AND corpus fingerprint
    val h1 = Models.configHash("k", Map("a" -> "1", "b" -> "2"))
    assert(h1 == Models.configHash("k", Map("b" -> "2", "a" -> "1")))
    assert(h1 != Models.configHash("k", Map("a" -> "1", "b" -> "3")))
    assert(h1 != Models.configHash("k2", Map("a" -> "1", "b" -> "2")))
    val f1 = Models.corpusFingerprint(docs, Seq("doc_id", "text"))
    assert(f1 == Models.corpusFingerprint(docs, Seq("doc_id", "text")))
    assert(f1 != Models.corpusFingerprint(
      docs.withColumn("text", concat(col("text"), lit("x"))),
      Seq("doc_id", "text")))
  }

  test("data checksum: a tampered data file fails load and reads as " +
    "no-match (loadOrTrain re-trains instead of serving planted rows)") {
    val root = tmpDir() + "/ck"
    val cfg = Map("z" -> "1")
    Models.saveBpe(spark, root, Seq("a b", "b c"), cfg)
    assert(Models.matches(spark, root, "bpe_merges", cfg))
    // plant: replace a data file's bytes, keep the manifest
    val data = java.nio.file.Paths.get(root, "data")
    val part = Files.list(data).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.write(part, "planted".getBytes)
    assert(!Models.matches(spark, root, "bpe_merges", cfg),
      "tampered data must not match")
    intercept[IllegalArgumentException] {
      Models.loadBpe(spark, root)
    }
  }

  test("list + prune: keep-latest-N per kind deletes older hash dirs " +
    "and leaves other kinds alone") {
    val root = tmpDir()
    // three bpe artifacts (distinct configs → distinct dirs), one
    // unigram; stamp strictly increasing mtimes
    for (i <- 0 until 3) {
      val p = s"$root/bpe_$i"
      Models.saveBpe(spark, p, Seq(s"a b$i"), Map("i" -> i.toString))
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(p, "manifest.json"),
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 1000))
    }
    Models.saveUnigram(spark, s"$root/uni", Seq(("a", 1L, 2L)), Map.empty)
    val listed = Models.listArtifacts(spark, root)
    assert(listed.map(_._2).sorted ==
      Seq("bpe_merges", "bpe_merges", "bpe_merges", "unigram_vocab"))
    val deleted = Models.prune(spark, root, keepPerKind = 1)
    // the two OLDEST bpe dirs go; newest bpe + the unigram stay
    assert(deleted.toSet == Set(s"$root/bpe_0", s"$root/bpe_1")
      .map(p => new org.apache.hadoop.fs.Path(p).toString) ||
      deleted.map(p => p.split("/").last).toSet == Set("bpe_0", "bpe_1"))
    val after = Models.listArtifacts(spark, root)
    assert(after.map(_._2).sorted == Seq("bpe_merges", "unigram_vocab"))
    assert(after.exists(_._1.endsWith("bpe_2")))
    // surviving artifact still loads
    assert(Models.loadBpe(spark, s"$root/bpe_2") == Seq("a b2"))
  }

  test("prune groups by (corpus dir, kind): pruning from the shared " +
    "base never lets one corpus's churn delete another corpus's only " +
    "artifact (r17 ADVICE)") {
    val base = tmpDir()
    // corpus A churned twice; corpus B has exactly one artifact, OLDER
    // than everything in A — kind-only grouping would delete it
    for (i <- 0 until 2) {
      val p = s"$base/corpusA/bpe_$i"
      Models.saveBpe(spark, p, Seq(s"a b$i"), Map("i" -> i.toString))
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(p, "manifest.json"),
        java.nio.file.attribute.FileTime.fromMillis(2000000L + i * 1000))
    }
    Models.saveBpe(spark, s"$base/corpusB/bpe_only", Seq("x y"), Map.empty)
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$base/corpusB/bpe_only", "manifest.json"),
      java.nio.file.attribute.FileTime.fromMillis(1000000L))

    val deleted = Models.prune(spark, base, keepPerKind = 1)
    assert(deleted.map(_.split("/").last) == Seq("bpe_0"), s"deleted: $deleted")
    // corpus B's lone (oldest overall) artifact survived and loads
    assert(Models.loadBpe(spark, s"$base/corpusB/bpe_only") == Seq("x y"))
    assert(Models.loadBpe(spark, s"$base/corpusA/bpe_1") == Seq("a b1"))
  }
}
