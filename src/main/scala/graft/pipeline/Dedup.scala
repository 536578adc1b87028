package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  * Designed shuffle-first: every variant reduces to a single hash
  * exchange on a bucket key (content hash, LSH band bucket, or blocking
  * key), so at 100 TB the cost is one shuffle of (key, doc_id) pairs —
  * never an all-pairs comparison. Hashes are md5-derived so the DuckDB
  * oracle reproduces every signature bit-for-bit.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id as
    * canonical. One shuffle on md5(text). */
  def exact(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .groupBy("content_hash")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Streaming exact dedup: keep the FIRST arrival of each content
    * hash inside the watermark horizon — the incremental form of
    * [[exact]] for a continuously ingested corpus. State is keyed by
    * md5(text) and evicted once the watermark passes `horizon` behind
    * the newest data, so state size is bounded by the dedup window, not
    * the corpus (at 100 TB of history an unbounded exact-dedup state is
    * its own storage system — bound it and let the periodic batch
    * [[exact]] pass own the long tail).
    *
    * `eventTimeCol` must be a timestamp column on the stream. */
  def streamingExact(docs: DataFrame, eventTimeCol: String,
      horizon: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Word-shingle column: w-gram shingles of the whitespace-tokenized
    * text (the MinHash input). */
  def shingles(docs: DataFrame, w: Int = 3): DataFrame = {
    // hot path: one-pass ShingleKernel (the column form re-slices and
    // joins per gram in interpreted lambdas); shinglesColumns is the
    // spec it is parity-pinned to
    import org.apache.spark.sql.graft.ColumnBridge
    docs.withColumn("shingles", ColumnBridge.column(
      ShinglesExpr(ColumnBridge.expression(col("text")), w)))
  }

  private[graft] def shinglesColumns(docs: DataFrame, w: Int = 3): DataFrame =
    docs.withColumn("words", split(col("text"), " "))
      .withColumn("shingles",
        expr(s"array_distinct(transform(sequence(0, greatest(size(words)-$w, 0)), " +
          s"i -> concat_ws(' ', slice(words, i+1, $w))))"))
      .drop("words")

  /** MinHash permutation modulus (prime) and the per-seed affine
    * coefficients, md5-derived on the driver and embedded as literals —
    * reproducible on any engine, and each shingle is md5-hashed exactly
    * ONCE (hashing per (seed, shingle) was the dominant minhash cost). */
  val MinhashP = 2147483647L
  def minhashCoeff(i: Int): (Long, Long) = {
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          .substring(0, 15), 16)
    }
    (h(s"a_$i") % (MinhashP - 1) + 1, h(s"b_$i") % MinhashP)
  }

  /** MinHash signature as ONE narrow pass per document — no explode, no
    * join, no shuffle: shingles are md5-hashed to 60-bit ints once (a
    * separate projection, so the hash array is computed once and reused
    * by all k permutations), then permutation i takes
    * min((a_i·h + b_i) mod P) — pure codegen'd long arithmetic.
    * Output: (doc_id, sig array<long>). */
  def minhashSignature(docs: DataFrame, k: Int = 16, w: Int = 3): DataFrame =
    minhashSignatureFromShingles(shingles(docs, w), k)

  /** Signature from a pre-shingled relation (doc_id, shingles) — lets a
    * caller that also needs the shingles downstream (exact-Jaccard
    * verification) share one tokenize+shingle pass instead of scanning
    * the corpus twice. */
  def minhashSignatureFromShingles(shingled: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    shingled.select(col("doc_id"),
      ColumnBridge.column(MinhashSigExpr(
        ColumnBridge.expression(col("shingles")), k)).as("sig"))
  }

  /** The column-expression spec of the same signature — k+1 interpreted
    * higher-order lambdas; kept as the executable reference the
    * MinhashParitySpec pins [[MinhashSigExpr]] against (it is also,
    * modulo syntax, the DuckDB oracle's formulation). */
  private[graft] def minhashSignatureFromShinglesColumns(
      shingled: DataFrame, k: Int): DataFrame = {
    val perms = (0 until k).map { i =>
      val (a, b) = minhashCoeff(i)
      s"array_min(transform(hs, h -> (h * ${a}L + ${b}L) % ${MinhashP}L))"
    }.mkString("array(", ", ", ")")
    shingled
      .withColumn("hs", expr("transform(shingles, s -> " +
        s"CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % ${MinhashP}L)"))
      .select(col("doc_id"), expr(perms).as("sig"))
  }

  /** LSH banding of a signature: b bands of r = k/b rows; bucket id =
    * md5 of the band's slice. Docs sharing any (band, bucket) are
    * candidates. One row per (doc, band). */
  /** THE band/bucket derivation, as one explodable expression over a
    * `sig` column — every consumer (batch [[lshBands]], the streaming
    * within-stream family, the streaming cross-corpus filter) banding
    * through this single formula is what makes their (band, bucket)
    * keys join-compatible; a fork here would silently empty those
    * joins. */
  private[graft] def bandExplodeExpr(k: Int, bands: Int): Column = {
    require(bands >= 1 && k % bands == 0,
      s"bands ($bands) must divide the signature size ($k): r = k/bands = 0 " +
        "would put every doc in one bucket (all-pairs blowup), and a " +
        "non-divisor silently ignores trailing signature elements")
    val r = k / bands
    explode(expr(s"transform(sequence(0, ${bands - 1}), " +
      s"b -> named_struct('band', b, 'bucket', " +
      s"md5(concat_ws(',', transform(slice(sig, b*$r+1, $r), " +
      "x -> cast(x as string))))))"))
  }

  /** Estimated Jaccard of two k-element signatures (fraction of equal
    * elements) — shared by every pair producer so batch, cross-corpus,
    * and oracle agreement formulas cannot drift. */
  private[graft] def sigAgreement(aSig: String, bSig: String,
      k: Int): Column =
    (expr(s"size(filter(zip_with($aSig, $bSig, (x, y) -> x = y), p -> p))")
      .cast("double") / k)

  def lshBands(sig: DataFrame, k: Int, bands: Int): DataFrame =
    sig.select(col("doc_id"), col("sig"),
        bandExplodeExpr(k, bands).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))

  /** Drop (band, bucket) groups larger than `maxBucket` — the hot-bucket
    * guard every LSH consumer shares ([[Caps.cap]]: one cheap aggregate
    * on the narrow banded relation, engaged drops logged). */
  private def capBands(banded: DataFrame, maxBucket: Int): DataFrame =
    Caps.cap(banded, Seq("band", "bucket"), maxBucket, "minhash_lsh")

  /** Distinct colliding (doc_a < doc_b) pairs from a banded relation —
    * the one candidate-generation self-join all LSH paths share. */
  private def collidingPairs(banded: DataFrame): DataFrame = {
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs: band the signature, bucket-join on
    * (band, band-hash), then estimate Jaccard as the fraction of equal
    * signature elements. Only bucket-colliding pairs are compared — the
    * scale path. `maxBucket` drops pathological hot buckets (boilerplate
    * docs) that would go quadratic; capped by default
    * ([[Caps.DefaultMaxBucket]], drops logged) — pass `Int.MaxValue` to
    * keep everything. */
  def minhashPairs(docs: DataFrame, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, w: Int = 3,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame =
    minhashPairsFromShingles(shingles(docs, w), k, bands, threshold,
      maxBucket)

  /** [[minhashPairs]] from a pre-shingled relation — lets a caller that
    * needs the shingles for OTHER stages too (the curation funnel's
    * decontamination) share one tokenize+shingle pass. */
  def minhashPairsFromShingles(shingled: DataFrame, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame =
    minhashPairsFromBanded(
      bandedFromShingles(shingled, k, bands), k, threshold, maxBucket)

  /** The UNCAPPED banded relation (doc_id, sig, band, bucket) from a
    * pre-shingled corpus — the shared upstream the curation funnel
    * caches ONCE and reuses for both the within-corpus pair stage and
    * the cross-corpus stage. Capping stays per-consumer (each cap is a
    * population property of ITS candidate set: the within-pair cap
    * counts the whole corpus, the cross-corpus new side re-caps within
    * its own survivor slice). */
  def bandedFromShingles(shingled: DataFrame, k: Int = 16,
      bands: Int = 4): DataFrame =
    lshBands(minhashSignatureFromShingles(shingled, k), k, bands)

  /** [[minhashPairsFromShingles]] from a pre-banded (uncapped)
    * relation. */
  def minhashPairsFromBanded(banded0: DataFrame, k: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame = {
    val capped = capBands(banded0, maxBucket)
    val a = capped.as("a")
    val b = capped.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        sigAgreement("a.sig", "b.sig", k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** Cross-corpus near-dup pairs — dedup an INCOMING batch against an
    * existing REFERENCE corpus, the production shape for continuous
    * ingestion (a new crawl must not re-add near-copies of what the
    * training set already holds, and eval sets are deduped against
    * train the same way — Lee et al. 2022). MinHash signatures on both
    * sides under the SAME driver-derived permutation literals, LSH
    * bands on both sides, then a new×ref equi-join on (band, bucket) —
    * never all-pairs. Each side is hot-bucket-capped INDEPENDENTLY
    * (bounding pair fan-out per bucket at maxBucket² and keeping the
    * cap a per-side aggregate; mirrored per-side in the oracle).
    *
    * At 100 TB the reference side is the big one, and its banded
    * relation is a pure function of the corpus — a production system
    * precomputes it once (bucketed by (band, bucket)) and reuses it
    * every batch via [[crossCorpusNearDupsAgainstBanded]]; only the
    * incoming batch pays signature work per run.
    *
    * Output: (new_id, ref_id, est_jaccard ≥ threshold), distinct. */
  def crossCorpusNearDups(newDocs: DataFrame, refDocs: DataFrame,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5, w: Int = 3,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame =
    crossCorpusNearDupsAgainstBanded(newDocs,
      bandedReference(refDocs, k, bands, w, maxBucket),
      k, bands, threshold, w, maxBucket)

  /** The reference side's capped banded relation (doc_id, sig, band,
    * bucket) — a pure function of the corpus, precomputed once per
    * release and reused by every batch ([[crossCorpusNearDupsAgainstBanded]])
    * and by the streaming filter (graft.streaming.StreamingCrossCorpus). */
  def bandedReference(refDocs: DataFrame, k: Int = 16, bands: Int = 4,
      w: Int = 3, maxBucket: Int = Caps.DefaultMaxBucket): DataFrame =
    Caps.cap(lshBands(minhashSignature(refDocs, k, w), k, bands),
      Seq("band", "bucket"), maxBucket, "crosscorpus_lsh_ref")

  /** [[crossCorpusNearDups]] against a PRECOMPUTED (and already
    * capped) reference banded relation (doc_id, sig, band, bucket). */
  def crossCorpusNearDupsAgainstBanded(newDocs: DataFrame,
      refBanded: DataFrame, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, w: Int = 3,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame =
    crossCorpusNearDupsFromBanded(
      lshBands(minhashSignature(newDocs, k, w), k, bands),
      refBanded, k, threshold, maxBucket)

  /** [[crossCorpusNearDupsAgainstBanded]] with a PRE-BANDED (uncapped)
    * new side — lets the curation funnel reuse its cached banded
    * relation instead of re-shingling the survivors; the new-side cap
    * is applied here, within exactly this slice. */
  def crossCorpusNearDupsFromBanded(newBanded0: DataFrame,
      refBanded: DataFrame, k: Int = 16, threshold: Double = 0.5,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame = {
    val newBanded = Caps.cap(newBanded0,
      Seq("band", "bucket"), maxBucket, "crosscorpus_lsh_new")
    newBanded.as("n").join(refBanded.as("r"),
        col("n.band") === col("r.band") &&
          col("n.bucket") === col("r.bucket"))
      .select(col("n.doc_id").as("new_id"), col("r.doc_id").as("ref_id"),
        sigAgreement("n.sig", "r.sig", k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** The batch-filter form: incoming docs that are NOT near-dups of the
    * reference corpus — an anti-join against the (small) matched-id
    * set, so the batch streams through broadcast-ably. */
  def filterAgainstCorpus(newDocs: DataFrame, refDocs: DataFrame,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5, w: Int = 3,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame =
    newDocs.join(
      crossCorpusNearDups(newDocs, refDocs, k, bands, threshold, w,
        maxBucket).select(col("new_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Winnowing span-overlap pairs: documents sharing ≥ `minShared`
    * winnowed fingerprints ([[TextAnalysis.winnow]] — Schleimer et al.
    * 2003). MinHash estimates whole-document similarity; winnowing
    * overlap catches PARTIAL verbatim overlap (a copied paragraph
    * inside otherwise-different documents): any shared substring of
    * ≥ k+w-1 chars guarantees ≥ 1 shared fingerprint. Same scale shape
    * as the LSH family — explode to (fp, doc), one hash exchange on
    * fp, within-fingerprint join only, hot fingerprints (boilerplate)
    * capped by default with observed drops. */
  /** Default cap on DOCS PER FINGERPRINT for winnow overlap — tighter
    * than the LSH [[Caps.DefaultMaxBucket]] on purpose. A fingerprint
    * shared by this many documents is template/boilerplate: winnowing's
    * setting (Schleimer et al. 2003) is partial copies among
    * mostly-DISTINCT documents, while whole-corpus near-dup clusters
    * are the minhash family's job — and pair fan-out per fingerprint
    * is quadratic in its doc count, so a loose cap turns a 100-way
    * duplicated corpus into billions of pre-aggregation evidence rows
    * (measured: the 1000-cap ran out of heap on the 100x probe).
    * Mirrored in the DuckDB oracle so Spark and oracle agree at every
    * scale factor. */
  val WinnowMaxFpDocs = 64

  def winnowOverlapPairs(docs: DataFrame, k: Int = 20, w: Int = 8,
      minShared: Int = 3,
      maxBucket: Int = WinnowMaxFpDocs): DataFrame = {
    val fps = TextAnalysis.winnow(docs, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    // (r22: pinning the fp exchange at the configured width — the
    // emissionSpread move — was prototyped and REVERTED: the heavy
    // 2-task pair-explosion stage is bound by a couple of hot
    // fingerprints, i.e. single-key skew that a wider hash exchange
    // cannot split (guide §2.5), so the pin only added task overhead.)
    val capped = Caps.cap(fps, Seq("fp"), maxBucket, "winnow_fp")
    // pair generation happens INSIDE each fingerprint's partition: the
    // cap's count-window already hash-partitioned on fp, so collecting
    // the (deduped — winnow emits distinct fps per doc) member list
    // adds NO exchange, and the a<b pairs come from two CHAINED
    // generators over the sorted list instead of a self-join's
    // build+probe over the same exchange. The two-step explode streams
    // pairs row-by-row — a single flatten(transform) pair array per fp
    // (up to maxBucket²/2 structs materialized at once) was the 100x
    // probe's heap killer.
    capped.groupBy("fp")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "doc_a")))
      .select(col("doc_a"), explode(
        slice(col("ds"), col("i") + lit(2), size(col("ds")) - col("i") - lit(1)))
        .as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** LSH candidate pairs (no similarity filter): the blocking stage that
    * exact verification passes consume. */
  def lshCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4,
      w: Int = 3, maxBucket: Int = Caps.DefaultMaxBucket): DataFrame =
    collidingPairs(capBands(
      lshBands(minhashSignature(docs, k, w), k, bands)
        .select("doc_id", "band", "bucket"), maxBucket))

  /** Exact n-gram Jaccard over a candidate-pair relation (doc_a, doc_b)
    * — the verification pass after LSH candidate generation. Joining the
    * shingle sets onto the (small) candidate relation keeps the work
    * linear in candidates, never all-pairs. */
  def exactJaccard(docs: DataFrame, candidates: DataFrame, w: Int = 3,
      threshold: Double = 0.3): DataFrame =
    exactJaccardFromShingles(
      shingles(docs, w).select(col("doc_id"), col("shingles")),
      candidates, threshold)

  /** Verification pass, PPJoin-hardened (r16): each doc's distinct
    * shingles become SORTED 60-bit md5 hashes ([[NgramHashSortExpr]] —
    * the minhash digest without the mod-P fold, so 2^60 keys keep
    * per-pair collision odds ~1e-14 and the jaccard doubles equal the
    * string-set form bit-for-bit), the candidate joins ship long
    * arrays ~3x narrower than the shingle strings, and the per-pair
    * intersect is a merge-walk with the PPJoin length/prefix/positional
    * early-exits ([[NgramInterExpr]] returns -1 exactly when the pair
    * provably lands below `threshold`); union = na + nb − inter, so
    * array_union's per-pair allocation is gone. The retained
    * array_intersect/array_union column form
    * ([[exactJaccardFromShinglesColumns]]) is the executable spec
    * (PipelineSpec pins equality on randomized corpora), and, modulo
    * syntax, the DuckDB oracle's formulation. */
  private def exactJaccardFromShingles(sh: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val hsh = sh.select(col("doc_id"), ColumnBridge.column(
      NgramHashSortExpr(ColumnBridge.expression(col("shingles"))))
      .as("hsh"))
    candidates
      .join(hsh.select(col("doc_id").as("doc_a"), col("hsh").as("hs_a")), "doc_a")
      .join(hsh.select(col("doc_id").as("doc_b"), col("hsh").as("hs_b")), "doc_b")
      .withColumn("inter", ColumnBridge.column(NgramInterExpr(
        ColumnBridge.expression(col("hs_a")),
        ColumnBridge.expression(col("hs_b")), threshold)))
      .filter(col("inter") >= 0)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The array_intersect / array_union column form of
    * [[exactJaccardFromShingles]] — the DuckDB oracle's formulation,
    * kept as the kernel path's executable parity spec. */
  private[graft] def exactJaccardFromShinglesColumns(sh: DataFrame,
      candidates: DataFrame, threshold: Double): DataFrame =
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** n-gram Jaccard near-dup pairs at scale: LSH blocking → exact
    * verification. (A lang/label blocking key would leave one block
    * O(n²) at scale; LSH buckets stay small by construction.) The
    * shingle relation feeds BOTH the signature and the verification
    * pass, so it is computed once and cached — at cluster scale swap
    * cache() for persist(DISK_ONLY) or recompute if memory is tight.
    *
    * r16 shape — GROUP pair synthesis instead of the self-join +
    * corpus-scale `distinct()` + two wide verification joins the r15
    * form paid (the winnowOverlapPairs posture, band-aware):
    *
    *   1. each doc carries a packed 2·bands cell array (120 md5 bits
    *      per band's bucket, -1 for hot-capped bands —
    *      [[LshCellsExpr]]) and its sorted 60-bit hashed shingle set
    *      ([[NgramHashSortExpr]]);
    *   2. ONE exchange groups the capped banded relation by (band,
    *      bucket); inside each group, chained posexplodes stream the
    *      j > i member pairs as row VIEWS (never a pair-array
    *      materialization — the winnow heap lesson);
    *   3. `first_shared_band(cells_a, cells_b) == band` keeps exactly
    *      one copy of every colliding pair — deduplication becomes a
    *      per-pair 8-step compare instead of hashing the ~5x-banded
    *      pair stream through a distinct();
    *   4. [[NgramInterExpr]] merge-walks the two sorted hash sets with
    *      the PPJoin length/prefix/positional early-exits, and
    *      union = na + nb − inter.
    *
    * Value-identical to the retained join form
    * ([[ngramJaccardPairsJoin]], PipelineSpec randomized parity);
    * bounded by the hot-bucket cap (≤ maxBucket members per group), so
    * no task ever sees more than cap² pair slots.
    *
    * r17 payload bound: each group member inlines at most `maxInline`
    * hashes (plus its TRUE set size), so an aggregation row is
    * ≤ maxBucket · maxInline · 8 B no matter how long the documents
    * are. [[NgramJaccardKernel.interBounded]] resolves pairs exactly
    * when both sets fit; the rare pairs a truncated prefix cannot
    * decide (at least one book-length member whose PPJoin prefix
    * overruns the inline cap) re-verify against the full hash sets
    * via a narrow doc_id join restricted to the over-cap documents —
    * output identical, heap bounded. */
  def ngramJaccardPairs(docs: DataFrame, w: Int = 3, threshold: Double = 0.3,
      k: Int = 16, bands: Int = 8,
      maxBucket: Int = Caps.DefaultMaxBucket,
      maxInline: Int = Caps.DefaultMaxInlineHashes): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(maxInline > 0, s"maxInline ($maxInline) must be positive")
    // NOT cached: the signature and hash-set consumers each re-derive
    // shingles as a narrow kernel pass over the scan (~2 s of an 11 s
    // query at the 100x probe) — caching would pin a corpus-scale
    // relation past the query's lifetime (the CacheDisciplineSpec
    // contract), and at 100 TB the cache is impossible anyway
    val sh = shingles(docs, w).select(col("doc_id"), col("shingles"))
    val hshFull = sh.select(col("doc_id"), ColumnBridge.column(
      NgramHashSortExpr(ColumnBridge.expression(col("shingles"))))
      .as("hsh"))
    // group members carry the true size + a bounded inline prefix
    val hsh = hshFull.select(col("doc_id"), size(col("hsh")).as("n"),
      slice(col("hsh"), 1, maxInline).as("hs"))
    val banded = lshBands(minhashSignatureFromShingles(sh, k), k, bands)
      .select("doc_id", "band", "bucket")
    val capped = capBands(banded, maxBucket)
      .select(col("doc_id"), col("band").cast("int").as("band"),
        expr("cast(conv(substring(bucket, 1, 15), 16, 10) as bigint)")
          .as("hi"),
        expr("cast(conv(substring(bucket, 16, 15), 16, 10) as bigint)")
          .as("lo"))
    val cells = capped.groupBy("doc_id")
      .agg(collect_list(struct(col("band"), col("hi"), col("lo"))).as("cl"))
      .select(col("doc_id"), ColumnBridge.column(LshCellsExpr(
        ColumnBridge.expression(col("cl")), bands)).as("cells"))
    val grp = capped
      .join(cells, "doc_id")
      .join(hsh, "doc_id")
      .groupBy("band", "hi", "lo")
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("cells"), col("n"), col("hs")))).as("ms"))
      .filter(size(col("ms")) >= 2)
    val pairs = grp
      .select(col("band"), col("ms"),
        posexplode(col("ms")).as(Seq("i", "ma")))
      .select(col("band"), col("i"), col("ma"),
        posexplode(col("ms")).as(Seq("j", "mb")))
      .filter(col("j") > col("i") && ColumnBridge.column(
        FirstSharedBandExpr(
          ColumnBridge.expression(col("ma.cells")),
          ColumnBridge.expression(col("mb.cells")))) === col("band"))
      .withColumn("inter0", ColumnBridge.column(NgramInterBoundedExpr(
        ColumnBridge.expression(col("ma.hs")),
        ColumnBridge.expression(col("mb.hs")),
        ColumnBridge.expression(col("ma.n")),
        ColumnBridge.expression(col("mb.n")), threshold)))
      .filter(col("inter0") >= 0 || col("inter0") === -2)
      // inline prefixes ride past the group only for -2 rows, so the
      // (dominant) exact rows stay narrow through the tail joins
      .select(col("ma.doc_id").as("doc_a"), col("mb.doc_id").as("doc_b"),
        col("inter0"), col("ma.n").as("n_a"), col("mb.n").as("n_b"),
        when(col("inter0") === -2, col("ma.hs")).as("hs_a"),
        when(col("inter0") === -2, col("mb.hs")).as("hs_b"))
    // tail re-verify: a truncated prefix could not decide (-2). Only a
    // doc LONGER than the inline cap can force this, so the re-join
    // relation is the corpus's heavy tail, not the corpus; a small
    // side's inline prefix IS its full set (n ≤ maxInline ⇒ complete).
    // The length(text) pre-filter is a cheap NECESSARY condition
    // (distinct word-shingles ≤ words+1 ≤ chars+2-w), pushed to the
    // scan so the tail leg's shingle+hashsort kernel never touches
    // short documents. Left-joined in the SAME pass as the exact rows
    // (probe-only for them) — the expensive group-synthesis subtree
    // runs exactly once.
    val bigHsh = shingles(docs.where(length(col("text")) >= maxInline), w)
      .select(col("doc_id"), ColumnBridge.column(
        NgramHashSortExpr(ColumnBridge.expression(col("shingles"))))
        .as("hsh"))
      .filter(size(col("hsh")) > maxInline)
    // aliased (not pre-renamed) joins keep the two tail subtrees
    // canonically identical, so ReuseExchange builds the broadcast once
    pairs
      .join(bigHsh.as("ta"), col("doc_a") === col("ta.doc_id"), "left")
      .join(bigHsh.as("tb"), col("doc_b") === col("tb.doc_id"), "left")
      .withColumn("inter",
        when(col("inter0") >= 0, col("inter0"))
          .otherwise(ColumnBridge.column(NgramInterExpr(
            ColumnBridge.expression(coalesce(col("ta.hsh"), col("hs_a"))),
            ColumnBridge.expression(coalesce(col("tb.hsh"), col("hs_b"))),
            threshold))))
      .filter(col("inter") >= 0)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The r15 self-join + distinct + verification-join form of
    * [[ngramJaccardPairs]] — kept as its executable parity spec
    * (PipelineSpec pins equality on randomized corpora; modulo syntax
    * this is also the DuckDB oracle's formulation). */
  private[graft] def ngramJaccardPairsJoin(docs: DataFrame, w: Int = 3,
      threshold: Double = 0.3, k: Int = 16, bands: Int = 8,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame = {
    val sh = shingles(docs, w).select(col("doc_id"), col("shingles"))
    val banded = lshBands(minhashSignatureFromShingles(sh, k), k, bands)
      .select("doc_id", "band", "bucket")
    exactJaccardFromShinglesColumns(sh,
      collidingPairs(capBands(banded, maxBucket)), threshold)
  }

  /** Connected components over a near-dup pair relation (doc_a, doc_b):
    * the step that turns pairwise similarity into actual dedup groups —
    * component id = min doc_id in the component, which doubles as the
    * canonical (kept) document.
    *
    * Distributed min-label propagation: each iteration every member
    * takes the min of its own and its neighbors' labels — one
    * shuffle-join per iteration, converging in O(component diameter)
    * rounds. Near-dup components are short chains in practice
    * (similarity is near-transitive), so a handful of rounds closes
    * them; `maxIter` bounds pathological chains. Only docs that appear
    * in a pair are labeled (singletons are already unique).
    *
    * Small-graph fast path: when the edge relation fits
    * `unionFindMaxEdges` (default 2^20 ≈ 16 MB of id pairs — the same
    * order as Spark's own broadcast-join threshold), a driver-side
    * union-find replaces the iterative job chain: near-dup edges are
    * tiny relative to the corpus (LSH blocking bounds them), so at any
    * scale where the loop would hurt, the edges usually still fit.
    * Set `unionFindMaxEdges = 0` to force the distributed loop. */
  def nearDupComponents(pairs: DataFrame, maxIter: Int = 20,
      unionFindMaxEdges: Long = 1L << 20): DataFrame = {
    // the fast path needs integral ids (union-by-min compares longs);
    // other id types take the type-agnostic distributed loop
    val idType = pairs.schema("doc_a").dataType
    val integralIds = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType
    if (integralIds && unionFindMaxEdges > 0) {
      // r21: probe-collect the pairs directly — ONE job runs the whole
      // (expensive LSH) upstream exactly once, replacing the former
      // cache + union-both-directions + distinct + count + collect
      // chain (4 scheduler barriers). Pairs are distinct a<b rows at
      // every call site, so directed edges = 2·|pairs| and the bound
      // carries over as maxEdges/2; union(a,b) is symmetric, so the
      // mirrored direction never needed materializing.
      val spark = pairs.sparkSession
      import spark.implicits._
      val cap = (unionFindMaxEdges / 2).toInt
      // ONE job for the probe: Spark's incremental `take` (limit +
      // collect) otherwise scans 1, then 4, then 16… result partitions
      // as separate job waves before concluding the relation is small —
      // pure barrier cost when the upstream (the LSH pair pipeline) has
      // already fully run for the first wave's shuffle. r22: the
      // override rides a CLONED session (SessionBridge) instead of
      // mutating the shared session conf around the collect — no other
      // query in the session can ever observe it.
      val probe = org.apache.spark.sql.graft.SessionBridge.collectWithConf(
        pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
          .limit(cap + 1),
        "spark.sql.limit.initialNumPartitions" -> "100000")
      if (probe.length <= cap) {
        val es = probe.map(r => (r.getLong(0), r.getLong(1)))
        // union-by-min with path compression: the root of each set is
        // its minimum id, which is exactly the component label the
        // distributed loop converges to
        val parent = scala.collection.mutable.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        for ((a, b) <- es) {
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        // preserve the caller's id type so both paths agree on schema
        return parent.keysIterator.map(k => (k, find(k))).toSeq.sorted
          .toDF("doc_id", "component")
          .select(col("doc_id").cast(idType), col("component").cast(idType))
      }
      // over the bound: fall through to the distributed loop (the probe
      // is discarded; the loop re-reads the pair relation with its own
      // caching — the rare heavy-graph case pays one extra upstream run)
    }
    // the pair relation feeds both directions of the edge union — cache
    // it so an expensive upstream (the LSH pipeline) runs once, and
    // release it as soon as the edge relation is materialized
    val p = pairs.cache()
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().cache()
    edges.count()
    p.unpersist()
    // labels is referenced twice each iteration (union + join), so the
    // un-truncated logical plan would double per round and Catalyst
    // analysis would dominate on deep components. cache() each round
    // with a deterministic unpersist of the superseded generation keeps
    // executor storage at one live copy; a localCheckpoint every 8
    // rounds bounds the plan at 2^8 of a 3-node base (unpersist is a
    // no-op on the checkpointed generations, which the context cleaner
    // frees once unreferenced)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("component", col("doc_id")).localCheckpoint()
    // the cached generation currently pinned in executor storage (None
    // on checkpoint rounds — the context cleaner frees those)
    var pinned: Option[DataFrame] = None
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("doc_id"))
        .select(edges("src").as("doc_id"), col("component"),
          lit(null).cast("long").as("prev"))
      // thread each node's previous label through the min-aggregation
      // (every node has exactly ONE labels row, so max(prev) is that
      // label): the convergence verdict then comes out of the same
      // materializing action — one job per round, not a second
      // join-the-generations pass over the whole label relation
      val base = labels
        .select(col("doc_id"), col("component"), col("component").as("prev"))
        .union(neighborMin)
        .groupBy("doc_id")
        .agg(min("component").as("component"), max("prev").as("prev"))
      val checkpointRound = (i + 1) % 8 == 0
      val updated = if (checkpointRound) base.localCheckpoint() else base.cache()
      val changed = updated
        .agg(coalesce(max(col("component") =!= col("prev")), lit(false)))
        .first().getBoolean(0)
      pinned.foreach(_.unpersist())
      pinned = if (checkpointRound) None else Some(updated)
      labels = updated.drop("prev")
      converged = !changed
      i += 1
    }
    if (!converged) {
      pinned.foreach(_.unpersist())
      edges.unpersist()
      // silently emitting non-minimal components would under-merge the
      // dedup clusters (and silently keep duplicate documents) — fail
      // loudly so the caller raises maxIter for unusually deep chains
      throw new IllegalStateException(
        s"nearDupComponents: min-label propagation still changing after " +
          s"$maxIter iterations — components deeper than maxIter rounds; " +
          "raise maxIter")
    }
    edges.unpersist()
    labels
  }

  /** The deduplicated corpus: drop every near-dup cluster member except
    * its canonical (min doc_id) representative. Anti-join against the
    * small non-canonical id set — the corpus side streams through one
    * broadcast-able join, the end-to-end "actually dedup the data"
    * step LSH pairs + components exist to feed. */
  def dedupedCorpus(docs: DataFrame, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val drop = nearDupComponents(pairs, maxIter)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Semantic (embedding-space) dedup — the SemDeDup shape (Abbas et
    * al. 2023: drop all but one member of each embedding-cosine
    * near-dup cluster): connected components over
    * [[embeddingNearDups]]' capped banded-LSH pairs, keeping the
    * minimum vec_id per component. The survivors relation is what a
    * training pipeline joins its documents against. Same scale posture
    * as the textual dedup family: pair generation is banded + capped,
    * components are the bounded union-find/min-label machinery. */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.4,
      bands: Int = 4, planesPerBand: Int = 6, dims: Int = 64,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame = {
    val pairs = embeddingNearDups(embeddings, threshold, bands,
        planesPerBand, dims, maxBucket)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val drop = nearDupComponents(pairs)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("vec_id"))
    embeddings.join(drop, Seq("vec_id"), "left_anti")
      .select("vec_id", "label")
  }

  /** SimHash fingerprint from token counts: per-token md5-derived bits,
    * weighted-majority per bit position. Near-dups = fingerprints within
    * a small Hamming distance; pairs found by exact-match on fingerprint
    * blocks (bits/16 × 16-bit block index). Default 64-bit. */
  def simhash(docs: DataFrame, bits: Int = 64): DataFrame =
    if (bits == 64) {
      // hot path: per-document kernel, zero exchanges (the fingerprint
      // is a pure function of the text; the aggregation spec below
      // shuffles every (doc, token) twice) — parity-pinned in
      // MinhashParitySpec, drop-on-null-text via the 0-or-1 inline
      import org.apache.spark.sql.graft.ColumnBridge
      docs.select(col("doc_id"), inline(ColumnBridge.column(
        SimhashExpr(ColumnBridge.expression(col("text"))))))
    } else simhashColumns(docs, bits)

  private[graft] def simhashColumns(docs: DataFrame, bits: Int = 64): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      // token hash: one md5 per distinct (doc, token) — materialized as
      // its own column so CollapseProject keeps the digest evaluated
      // once (two inline md5(tok) calls doubled the hash work and cost
      // +62% on the sf0.1 bench). Bits 0..59 of the fingerprint come
      // from h1 (first 15 hex chars → 60-bit long), bits 60..63 from h2
      // (next 15 chars) so all 64 bits are independent.
      .withColumn("hex", md5(col("tok")))
      .withColumn("h1", conv(substring(col("hex"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("hex"), 16, 15), 16, 10).cast("long"))
    val bitCols = (0 until bits).map { b =>
      val h = if (b < 60) shiftright(col("h1"), b) else shiftright(col("h2"), b - 60)
      sum(when(h.bitwiseAND(1) === 1, col("cnt")).otherwise(-col("cnt"))).as(s"b$b")
    }
    val agg = toks.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    // pack sign bits; bit 63 via signed min-long to stay in Long range
    val fp = (0 until bits).map { b =>
      val w = if (b == 63) Long.MinValue else 1L << b
      when(col(s"b$b") > 0, lit(w)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs with pigeonhole blocking
    * (reference: the dedup role of streams.clj-style fingerprinting;
    * blocking per Manku/Jain/Sarma's simhash-dedup construction): split
    * the 64-bit fingerprint into `maxHamming + 1` bit blocks — any two
    * fingerprints within Hamming distance `maxHamming` must agree on at
    * least one block EXACTLY, so candidates come from an equi-join on
    * (block index, block value), never an all-pairs scan. Verification
    * on candidates only: hamming = bit_count(fp_a XOR fp_b), pure
    * codegen'd long arithmetic. `maxBucket` drops pathological hot
    * blocks (e.g. the all-zeros block of boilerplate-heavy corpora)
    * exactly like the MinHash-LSH paths — capped by default
    * ([[Caps.DefaultMaxBucket]], drops logged), `Int.MaxValue` opts
    * out. One shuffle on (blk, v); the self-join stays linear in
    * candidates at 100 TB. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming ($maxHamming) must be in [0, 64)")
    val nBlocks = maxHamming + 1
    // exact partition of the 64 bits into nBlocks NON-empty blocks
    // (the first 64 % nBlocks get the ceil width): a uniform ceil
    // width would give zero-width blocks for maxHamming >= 32, whose
    // constant-0 values silently degrade the equi-join to all-pairs
    val base = 64 / nBlocks
    val extra = 64 % nBlocks
    val widths = (0 until nBlocks).map(i => if (i < extra) base + 1 else base)
    val shifts = widths.scanLeft(0)(_ + _)
    val blocks = (0 until nBlocks).map { i =>
      val shift = shifts(i)
      val width = widths(i)
      // arithmetic >> then mask == logical shift for the kept bits
      // (width <= 64 - shift by construction) — identical in DuckDB
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(i).as("blk"),
        shiftright(col("simhash"), shift).bitwiseAND(lit(mask)).as("v"))
    }
    val blocked = simhash(docs, 64)
      .select(col("doc_id"), col("simhash"),
        explode(array(blocks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.blk"), col("b.v"))
    val capped = Caps.cap(blocked, Seq("blk", "v"), maxBucket, "simhash")
    val a = capped.as("a")
    val b = capped.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs with banded (multi-probe)
    * random-hyperplane blocking: `bands` independent bucket tables of
    * `planesPerBand` sign bits each; a pair is a candidate if ANY band's
    * buckets collide (OR-ing bands is what buys recall — one 16-bit
    * table keeps < 10% of true cos≥0.9 pairs), then exact cosine on
    * candidates only. A label/category blocking key would be quadratic
    * in the biggest label at scale; banded buckets stay small by
    * construction. */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.4,
      bands: Int = 4, planesPerBand: Int = 6, dims: Int = 64,
      maxBucket: Int = Caps.DefaultMaxBucket): DataFrame = {
    // candidates + cached units from the shared banded-LSH machinery
    // (Similarity.bandedCandUnits — one implementation for dedup and
    // ANN); undirected a<b pairing for the dedup relation
    val (cand, units) = Similarity.bandedCandUnits(embeddings, bands,
      planesPerBand, dims, maxBucket, directed = false, "vec_a", "vec_b")
    cand
      .join(units.select(col("vec_id").as("vec_a"), col("unit").as("unit_a")), "vec_a")
      .join(units.select(col("vec_id").as("vec_b"), col("unit").as("unit_b")), "vec_b")
      // cheap codegen'd double dot prunes; the decimal-exact cosine
      // (engine/order-independent) only runs on survivors
      .filter(Similarity.dot(col("unit_a"), col("unit_b")) >=
        threshold - Similarity.CosineEps)
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.dotExact(col("unit_a"), col("unit_b")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // --------------------------------------------------------------------
  // Exact substring dedup (Lee et al. 2021, "Deduplicating Training
  // Data Makes Language Models Better")
  // --------------------------------------------------------------------

  /** Position encoding shared with the oracle: token positions are
    * < 1e6 per document, so (doc_id, p) totally orders as one long —
    * the canonical (kept) occurrence of a duplicated gram is the one
    * minimizing this key, on both engines with plain MIN. Documents at
    * or beyond 1e6 tokens would alias across doc_ids and mis-select
    * canonicals — segment such documents first ([[Curation]]'s
    * packing/segment machinery); typical web documents sit orders of
    * magnitude under the bound. */
  val SubstringPosBase = 1000000L

  /** Exact duplicated-substring removal, the suffix-array dedup of
    * Lee et al. 2021 re-expressed for Spark: a substring of ≥ minLen
    * tokens duplicated anywhere in the corpus is exactly a run of
    * duplicated minLen-grams, so instead of materializing a suffix
    * array (a global sort of every suffix — the thing that does NOT
    * shard), we:
    *
    *  1. emit every minLen-token gram as (doc_id, pos, md5) — a narrow
    *     per-doc pass, the distributed analog of suffix ordering with
    *     boundary overlap handled by construction (grams, unlike
    *     partition-sharded suffixes, never straddle a shard edge);
    *  2. ONE hash exchange on the gram hash: occurrence count + the
    *     canonical (minimum (doc_id, pos)) occurrence per gram;
    *  3. every NON-canonical occurrence of a duplicated gram marks its
    *     minLen token positions for removal (the paper's "drop all but
    *     one copy"). The canonical occurrence of each gram keeps its
    *     text EXCEPT where overlapped by some other gram's
    *     non-canonical occurrence — in particular a self-overlapping
    *     run of one repeated token ("a a a … a") keeps only its
    *     un-overlapped prefix, not a full minLen window (the byte-range
    *     removal in the paper's tooling has the same overlap property);
    *     both engines compute this identically;
    *  4. a narrow per-doc pass drops marked tokens and re-joins the
    *     survivors.
    *
    * At 100 TB the cost is one shuffle of (hash, doc_id, pos) rows —
    * the same exchange shape as [[exact]]/minhash banding — plus a
    * doc-keyed aggregation of the (far smaller) duplicated-occurrence
    * relation; the corpus itself never sorts or reshuffles. Output per
    * document: token counts, removed-token count, and the cleaned
    * text, all engine-reproducible (md5 grams, integer position
    * arithmetic). */
  def substringDedup(docs: DataFrame, minLen: Int = 8): DataFrame = {
    val toks = docs.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("w"))
    val grams = toks.filter(size(col("w")) >= minLen)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - minLen + 1)).as("p"))
      .select(col("doc_id"), col("p"),
        md5(concat_ws(" ", slice(col("w"), col("p"), lit(minLen)))).as("h"))
    // occurrence count + canonical-occurrence key per gram hash via ONE
    // window pass: the former groupBy(h) + join-back shape exchanged the
    // full gram relation twice and paid a |grams| × |distinct h| join
    // (most grams are unique, so both sides are corpus-scale); the
    // window clusters on h once and reads cnt/mink in-partition
    val hw = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val dupOcc = grams
      .withColumn("k", col("doc_id") * SubstringPosBase + col("p"))
      .withColumn("cnt", count(lit(1)).over(hw))
      .filter(col("cnt") >= 2)
      .withColumn("mink", min(col("k")).over(hw))
      .filter(col("k") =!= col("mink"))
      .select(col("doc_id"), col("p"))
    val perDoc = dupOcc.groupBy("doc_id")
      .agg(sort_array(collect_list(col("p"))).as("qs"))
    val L = lit(minLen)
    // docs with NO duplicated span (the common case) skip reconstruction
    // entirely: split-on-space + rejoin-with-space is lossless, so the
    // original text IS text_clean — no per-token HOF work for them. Dup
    // docs build the removed-position SET then one array_except —
    // O(n + L·|qs|) per doc; the per-token `exists` scan was O(n·|qs|)
    // interpreted lambda work and dominated the funnel's substring stage.
    toks.join(perDoc, Seq("doc_id"), "left")
      .withColumn("rm", array_distinct(flatten(
        transform(col("qs"), q => sequence(q, q + L - 1)))))
      .withColumn("kept", when(col("qs").isNull, lit(null))
        .otherwise(array_except(sequence(lit(1), size(col("w"))), col("rm"))))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        when(col("qs").isNull, lit(0L))
          .otherwise(size(col("w")) - size(col("kept"))).cast("long")
          .as("n_removed"),
        // null text coalesces to "" like the reconstruction branch
        // (concat_ws over nulls) and the oracle's COALESCE(..., '')
        when(col("qs").isNull, coalesce(col("text"), lit("")))
          .otherwise(concat_ws(" ",
            transform(col("kept"), i => element_at(col("w"), i))))
          .as("text_clean"))
  }
}
