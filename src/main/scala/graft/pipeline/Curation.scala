package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * per-source caps, deterministic split assignment, and sequence
  * packing. All pure Catalyst column/window expressions — codegen'd,
  * reproducible in the DuckDB oracle, and shaped so every shuffle is a
  * bounded hash partition (no global sorts, no driver state).
  */
object Curation {

  /** Cap the number of documents kept per source/domain — the standard
    * anti-dominance guard in web-corpus curation (one crawl-happy domain
    * must not become 40% of the corpus). Deterministic: keeps the
    * `maxPerSource` lowest `orderCol` values per source.
    *
    * Scale shape: one hash shuffle on `source` + a bounded row_number —
    * no global sort. A pathologically hot source is exactly the case the
    * cap exists for; AQE skew-split handles the transient partition.
    */
  def sourceCap(docs: DataFrame, maxPerSource: Int,
      orderCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col(orderCol))
    docs.withColumn("source_rank", row_number().over(w))
      .filter(col("source_rank") <= maxPerSource)
  }

  /** Deterministic train/val/test assignment by content-independent
    * hash of the document id: u = first-8-hex-chars(md5("split:" ++ id))
    * / 2^32 — uniform in [0,1), stable across runs and machines, and
    * reproducible in any engine with md5 (the salt keeps the stream
    * independent of other md5-derived keys in this pipeline).
    *
    * Scale shape: narrow one-pass projection, no shuffle at all.
    */
  def splitAssign(docs: DataFrame, trainFrac: Double = 0.9,
      valFrac: Double = 0.05, idCol: String = "doc_id"): DataFrame = {
    val u = conv(substring(md5(concat(lit("split:"),
      col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    docs.withColumn("split_u", round(u, 8))
      .withColumn("split",
        when(u < trainFrac, "train")
          .when(u < trainFrac + valFrac, "val")
          .otherwise("test"))
  }

  /** Concat-and-chunk sequence packing: documents are concatenated in
    * `orderCol` order within a (lang, shard) group and sliced into
    * fixed-`budget`-token training sequences; each document is assigned
    * the chunk index and offset where its first token lands. This is
    * the packing layout LLM data loaders use (concatenate, then split
    * every `budget` tokens) — computing it ahead of time makes the
    * loader a pure seek.
    *
    * Sharding is part of the contract, not an optimization: packing
    * needs a total order, and a single global order would serialize the
    * window. `nShards` bounds each group so the per-group running sum
    * parallelizes (at 100 TB, shard ≈ input file); the shuffle is one
    * hash exchange on (lang, shard).
    */
  def packSequences(docs: DataFrame, budget: Int, nShards: Int = 8,
      orderCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col(orderCol))
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("shard", pmod(col(orderCol), lit(nShards)))
      // exclusive running sum = first-token position in the shard stream
      .withColumn("start_tok",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk", (col("start_tok") / budget).cast("long"))
      .withColumn("chunk_offset", col("start_tok") % budget)
      .select(col(orderCol), col("lang"), col("shard"), col("n_tokens"),
        col("start_tok"), col("chunk"), col("chunk_offset"))
  }

  /** Segment-level dedup (the CCNet/RefinedWeb "line dedup" pass,
    * generalized to fixed `segWords`-word segments since the corpus has
    * no newlines): a segment repeated anywhere in the corpus survives
    * only at its first occurrence — ordered by (doc_id, seg_idx) — and
    * every other copy is cut out of its document's text. This is the
    * boilerplate-removal step that exact whole-document dedup misses
    * (headers, navigation chrome, license blocks pasted into otherwise
    * distinct pages).
    *
    * Scale shape: segmentation is a narrow per-row transform (no
    * explode-then-groupBy back to the same key); the only wide stages
    * are one hash exchange on md5(segment) to find first occurrences
    * and one on doc_id to reassemble — the minimum for a global
    * first-wins rule. Nothing is quadratic in corpus size and no state
    * lives on the driver.
    *
    * Output: (doc_id, n_segments, n_kept, text_deduped). */
  def segmentDedup(docs: DataFrame, segWords: Int = 10): DataFrame = {
    // per-doc segment array computed inside one projection — the
    // one-pass SegmentsKernel (the slice-per-segment column form is
    // O(words²/segWords): Slice copies the whole word array per
    // segment; the r17 heavy-tail probe measured it unbounded on
    // million-word docs). segmentsColumns keeps the column form as
    // the executable parity spec.
    val segs = segmented(docs, segWords)
      .withColumn("seg_hash", md5(col("seg")))
    // global first occurrence per segment hash: min (doc_id, seg_idx).
    // A groupBy + join, NOT min().over(partitionBy(seg_hash)): the
    // window form puts every occurrence of a hot segment (empty lines,
    // boilerplate headers — the common case line dedup exists for) in
    // ONE task and AQE cannot split window partitions, while the
    // aggregate gets map-side partial aggregation (hot keys collapse to
    // one row per map task) and the probe join gets AQE skew-splitting.
    val firsts = segs.groupBy("seg_hash")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first_at"))
    val kept = segs
      .join(firsts, "seg_hash")
      .withColumn("kept",
        col("first_at.doc_id") === col("doc_id") &&
          col("first_at.seg_idx") === col("seg_idx"))
    kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_segments"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
      // reassemble surviving segments in seg_idx order
      array_join(expr(
        "transform(sort_array(collect_list(CASE WHEN kept THEN " +
          "struct(seg_idx, seg) END)), x -> x.seg)"), " ")
        .as("text_deduped"))
  }

  /** (doc_id, seg_idx, seg) via the one-pass kernel. */
  private[graft] def segmented(docs: DataFrame, segWords: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    docs
      .withColumn("segs", ColumnBridge.column(SegmentsExpr(
        ColumnBridge.expression(col("text")), segWords)))
      .select(col("doc_id"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
  }

  /** The slice-per-segment column form of [[segmented]] — the DuckDB
    * oracle's formulation, retained as the kernel's executable parity
    * spec (NEVER use on long documents: quadratic, see kernel doc). */
  private[graft] def segmentedColumns(docs: DataFrame,
      segWords: Int): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("segs", expr(
        s"transform(sequence(0, cast(ceil(size(words) / ${segWords}.0) " +
          s"as int) - 1), i -> array_join(slice(words, i * $segWords + 1, " +
          s"$segWords), ' '))"))
      .select(col("doc_id"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))

  /** Temperature-based mixture sampling (the Gopher/LLaMA data-mixing
    * rule): resample sources toward weights ∝ count^alpha, so alpha = 1
    * preserves the natural mix and alpha → 0 flattens it toward uniform.
    * Each source's keep-rate is min(1, total·frac·w_s / n_s); documents
    * are kept by a deterministic md5-derived uniform in [0,1) — the
    * same sample on every run, machine, and engine (the property that
    * makes a 100 TB sampling job resumable and auditable).
    *
    * Scale shape: per-source counts are one aggregation over a
    * two-column projection; the rates relation has one row per source
    * and broadcast-joins back; the keep test is a narrow codegen'd
    * filter. No global sort, no driver-side randomness.
    *
    * `byCol` chooses the mixture dimension: `source` (the default) for
    * provenance rebalancing, `lang` for the multilingual-corpus
    * rebalancing rule (up-sample low-resource languages toward
    * uniform) — any low-cardinality column works, the plan shape is
    * identical.
    *
    * Output: input columns + (n_source, keep_rate, sample_u) for kept
    * rows only. */
  /** The end-to-end curation recipe as ONE relation — the funnel a
    * training-data pipeline actually runs, with the per-stage counts
    * that make its attrition auditable (the C4/Gopher reporting
    * convention): corpus (the benchmark slice `doc_id % 10 == 0` held
    * out) → Gopher quality rules → exact dedup (min doc_id per
    * content hash) → cross-document SUBSTRING dedup (Lee et al.
    * duplicated-span removal; docs losing half or more of their
    * tokens drop, survivors carry their CLEANED text downstream) →
    * MinHash-LSH near-dup dedup → CROSS-CORPUS near-dup against the
    * benchmark slice (whole-document form of eval hygiene: survivors
    * that near-dup a benchmark doc drop) → benchmark decontamination
    * (the finer shingle-level form: docs sharing ≥ half their
    * shingles with the benchmark drop — compared in INTEGER
    * arithmetic, 2·hits < shingles, so no cross-engine rounding
    * boundary exists). Each stage runs on the previous stage's
    * survivors, exactly like the production ordering (quality first:
    * it is the cheap narrow pass; pair generation only sees what
    * survived it). Output: one row (n_corpus, n_quality, n_exact,
    * n_substring, n_neardup, n_crosscorpus, n_clean). */
  def curationFunnel(docs: DataFrame): DataFrame = {
    // every stage feeds BOTH the next stage and its own count branch —
    // uncached, each of the five count aggregations re-executed its
    // whole upstream chain (measured 19 s at sf0.1; the pair stage ran
    // twice, the Gopher kernel four times). The stage caches make the
    // funnel one forward pass plus cache-local counts.
    //
    // r22 (guide §1.2.1 — remove passes and barriers): ONE cached
    // corpus relation carrying the Gopher verdict as a column replaces
    // the corpus+qdocs cache pair (half the cache memory, one fewer
    // materialization), and the per-stage counts fuse into ONE action
    // at the end (below) instead of seven sequential count() barriers.
    val corpus = TextAnalysis.gopherKeepFlagged(
      docs.filter(col("doc_id") % 10 =!= 0), "_q", 20, 100000).cache()
    val bench = docs.filter(col("doc_id") % 10 === 0)
    // quality is a pure per-row predicate over the cached corpus — the
    // flag was computed once in the cached pass
    val qdocs = corpus.filter(col("_q")).drop("_q")
    // exact dedup (keep the min doc_id per content hash) as ONE window
    // pass: the former groupBy(md5) + join-back-on-doc_id shape paid a
    // second exchange and a join probe of the full corpus; the window
    // clusters on the content hash once and keeps rows in-partition
    // (doc_id is unique, so doc_id == min-over-hash-group IS the
    // min-per-group membership test)
    val hw = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text")))
    val edocs = qdocs
      .withColumn("_mind", min(col("doc_id")).over(hw))
      .filter(col("doc_id") === col("_mind")).drop("_mind").cache()
    // substring stage: duplicated-span removal across the exact-dedup
    // survivors (one gram-hash exchange); a doc losing half or more of
    // its tokens drops, the rest continue with their CLEANED text —
    // the downstream near-dup/decontam stages see what training would
    val sdocs = Dedup.substringDedup(edocs)
      .filter(col("n_removed") * 2 < col("n_tokens"))
      .select(col("doc_id"), col("text_clean").as("text"))
      .cache()
    // shingles are a narrow kernel pass over an already-cached
    // relation, so each consumer re-derives them from ITS OWN input:
    // the pair stage shingles sdocs, decontamination shingles the
    // cross-corpus survivors directly (shingling them is shuffle-free;
    // the former shared-relation form paid a full exploded-shingle
    // join on doc_id to reuse edocs' shingles, and materializing the
    // shared relation measured ~1.5 s slower at sf0.1)
    val esh = Dedup.shingles(sdocs)
      .select(col("doc_id"), col("shingles"))
    // ONE cached banded relation serves both LSH consumers: the
    // within-corpus pair stage (capped over the full population) and
    // the cross-corpus new side (re-capped within the survivors) —
    // without it each stage re-runs the shingle+minhash kernel
    val banded0 = Dedup.bandedFromShingles(esh).cache()
    val ndocs = Dedup.dedupedCorpus(sdocs,
      Dedup.minhashPairsFromBanded(banded0)).cache()
    // cross-corpus stage: near-dup survivors that LSH-match a
    // benchmark document (est_jaccard >= 0.5) drop — the whole-doc
    // eval-hygiene pass; the banded benchmark side is bounded (10% of
    // the corpus here; a precomputed bucketed table at 100 TB)
    val ccHits = Dedup.crossCorpusNearDupsFromBanded(
        banded0.join(ndocs.select("doc_id"), "doc_id"),
        Dedup.bandedReference(bench))
      .select(col("new_id").as("doc_id")).distinct()
    val cdocs = ndocs.join(ccHits, Seq("doc_id"), "left_anti").cache()
    val clean = TextAnalysis.contaminationFromShingles(
        Dedup.shingles(cdocs).select(col("doc_id"), col("shingles")), bench)
      .filter(col("n_contaminated") * 2 < col("n_shingles"))
      .select("doc_id")
    // eager, like the components machinery it already contains: the
    // result is ONE row of counts, so compute it now and RELEASE the
    // stage caches instead of pinning six corpus-scale relations for
    // the rest of the session.
    //
    // r22: the seven counts run as ONE action over a union of tagged
    // single-row aggregates — the former seven sequential count()
    // calls were seven scheduler barriers (each a full cluster sync at
    // scale even though six of them only scanned a cache); under one
    // action AQE materializes the independent count branches
    // concurrently, and the yet-unmaterialized tail stages (ndocs /
    // cdocs caches, the decontamination pass) overlap with them.
    def tagged(k: Int, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(k).as("k"), col("n"))
    val countByK = Seq(tagged(0, corpus), tagged(1, qdocs),
        tagged(2, edocs), tagged(3, sdocs), tagged(4, ndocs),
        tagged(5, cdocs), tagged(6, clean))
      .reduce(_ union _)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val counts = (countByK(0), countByK(1), countByK(2), countByK(3),
      countByK(4), countByK(5), countByK(6))
    Seq(corpus, edocs, sdocs, banded0, ndocs, cdocs)
      .foreach { df => df.unpersist(); () }
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(counts)
      .toDF("n_corpus", "n_quality", "n_exact", "n_substring",
        "n_neardup", "n_crosscorpus", "n_clean")
  }

  /** Cluster-balanced sampling — the temperature mixture rule applied
    * to EMBEDDING-SPACE clusters instead of provenance labels (topic
    * rebalancing: web corpora over-represent a few dense topics, and
    * no metadata column says so; resampling cluster counts toward
    * n_c^alpha evens topic coverage without hand labels). Cells come
    * from the deterministic IVF coarse quantizer
    * ([[Similarity.ivfCentroids]] seed + [[Similarity.ivfAssign]]'s
    * broadcast-argmax narrow map — the exact machinery the ANN family
    * already oracle-pins), so the full pass is: one tiny centroid
    * aggregation, a narrow assignment map, a per-cell count, a
    * broadcast rates join, and a deterministic md5 keep test. No
    * global sort, no driver-side randomness — the same auditable
    * resumable-sampling posture as [[temperatureSample]].
    *
    * Output (kept rows): (vec_id, cell, n_cell, keep_rate, sample_u). */
  def clusterSample(embeddings: DataFrame, alpha: Double = 0.5,
      targetFrac: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // the quantizer is tiny (|labels| rows) but its derivation is a
    // corpus aggregation — collect it ONCE to a local relation so the
    // two consumers of `assigned` (counts, rates join) re-run only the
    // narrow argmax map, not the centroid explode+groupBy
    // r22: the centroid aggregation and both argmax passes are narrow
    // kernels over the scan — a one-split test scan serialized them on
    // one core (job log: 0.69 s + 0.98 s single-task stages); spread is
    // a no-op once the scan has real splits
    val emb = Spread.spread(embeddings, col("vec_id"))
    val cents = Similarity.toLocal(Similarity.ivfCentroids(emb))
    val assigned = Similarity.ivfAssign(emb, cents)
      .select(col("vec_id"), col("cell"))
    val counts = assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_cell"))
    // identical decimal-exact normalizer discipline as temperatureSample
    val rates = counts
      .withColumn("wgt", round(pow(col("n_cell").cast("double"),
        lit(alpha)), 6).cast(org.apache.spark.sql.types.DecimalType(38, 6)))
      .withColumn("keep_rate", least(lit(1.0),
        lit(targetFrac) *
          sum("n_cell").over(Window.partitionBy()).cast("double") *
          col("wgt").cast("double") /
          sum("wgt").over(Window.partitionBy()).cast("double") /
          col("n_cell").cast("double")))
      .select("cell", "n_cell", "keep_rate")
    val u = conv(substring(md5(concat(lit("csample:"),
      col("vec_id").cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    assigned.join(broadcast(rates), "cell")
      .withColumn("sample_u", round(u, 8))
      .filter(col("sample_u") < round(col("keep_rate"), 8))
      .select(col("vec_id"), col("cell"), col("n_cell"),
        col("keep_rate"), col("sample_u"))
  }

  def temperatureSample(docs: DataFrame, alpha: Double = 0.5,
      targetFrac: Double = 0.5, byCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val counts = docs.groupBy(byCol)
      .agg(count(lit(1)).as("n_source"))
    // w_s = n^alpha / Σ n^alpha over a one-row-per-source relation (the
    // window total is |sources| rows — thousands at worst, and the
    // single-partition window only ever sees that tiny relation).
    // Weights are rounded and summed as DECIMAL so the normalizer is
    // independent of partition merge order — a raw double Σ pow() can
    // differ in the last ulp between runs/engines and flip sampling
    // decisions at the keep-rate boundary.
    val rates = counts
      .withColumn("wgt", round(pow(col("n_source").cast("double"),
        lit(alpha)), 6).cast(org.apache.spark.sql.types.DecimalType(38, 6)))
      .withColumn("keep_rate", least(lit(1.0),
        lit(targetFrac) *
          sum("n_source").over(Window.partitionBy()).cast("double") *
          col("wgt").cast("double") /
          sum("wgt").over(Window.partitionBy()).cast("double") /
          col("n_source").cast("double")))
      .select(byCol, "n_source", "keep_rate")
    val u = conv(substring(md5(concat(lit("sample:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    docs.join(broadcast(rates), byCol)
      .withColumn("sample_u", round(u, 8))
      .filter(col("sample_u") < round(col("keep_rate"), 8))
  }

  /** Token-budget mixture planner — the table every LLM training run
    * is budgeted from (GPT-3 Table 2.2, LLaMA Table 1): given a target
    * token budget, temperature-weight the available sources
    * (w_s ∝ tokens_s^alpha, the [[temperatureSample]] rule in TOKEN
    * units) and cap each source at `maxEpochs` passes over its data —
    * the standard guard against a tiny high-weight source being
    * repeated into memorization. Single-pass waterfilling: capped
    * slack is reported as `unspent`, not redistributed (published
    * mixture tables do the same; rerun with a larger alpha or budget
    * to spend it).
    *
    * Returns ONE auditable row per source: (byCol, n_docs, tok_avail,
    * weight, alloc_tokens, epochs, unspent). Scale shape: a per-doc
    * narrow projection (the whitespace token count — swap in BPE
    * counts via `tokCol` for tokenizer-exact budgets), one partial
    * aggregation to |sources| rows, and window math over that tiny
    * relation only. Weights are rounded-DECIMAL-summed like
    * [[temperatureSample]] so the normalizer is partition-order
    * independent. */
  def mixturePlan(docs: DataFrame, budgetTokens: Long,
      alpha: Double = 0.5, maxEpochs: Double = 1.0,
      byCol: String = "source",
      tokCol: Column = size(split(col("text"), " ")).cast("long"))
      : DataFrame = {
    require(budgetTokens > 0 && maxEpochs > 0,
      s"need budget > 0 and maxEpochs > 0; got $budgetTokens, $maxEpochs")
    val avail = docs
      .select(col(byCol), tokCol.as("toks"))
      .groupBy(byCol)
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tok_avail"))
    avail
      .withColumn("wgt", round(pow(col("tok_avail").cast("double"),
        lit(alpha)), 6).cast(org.apache.spark.sql.types.DecimalType(38, 6)))
      .withColumn("weight", round(col("wgt").cast("double") /
        sum("wgt").over(Window.partitionBy()).cast("double"), 6))
      .withColumn("alloc_tokens", floor(least(
        lit(budgetTokens.toDouble) * col("wgt").cast("double") /
          sum("wgt").over(Window.partitionBy()).cast("double"),
        lit(maxEpochs) * col("tok_avail").cast("double"))).cast("long"))
      .withColumn("epochs", round(col("alloc_tokens").cast("double") /
        col("tok_avail").cast("double"), 6))
      .withColumn("unspent", lit(budgetTokens) -
        sum("alloc_tokens").over(Window.partitionBy()))
      .select(byCol, "n_docs", "tok_avail", "weight", "alloc_tokens",
        "epochs", "unspent")
  }
}
