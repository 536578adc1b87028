package graft

import graft.model.EventView
import graft.pipeline.{Dedup, Similarity, TextAnalysis}
import graft.EntryShared.skewBoiler

/** DuckDB oracle SQL for every [[SparkEntry.queries]] entry — the
  * driver's correctness gate (same conventions: identical column
  * names/aliases, deterministic ORDER BY, DECIMAL for anything
  * summed). */
private[graft] object EntryOracle {
  /** Shared DuckDB prefix (see EventView.oracleCte). */
  val cte = EventView.oracleCte
  /** [[cte]] plus the derived description of [[withDerivedDesc]]. */
  val descCte = EventView.oracleCteWith(
    "CASE WHEN event_id % 5 = 0 THEN NULL " +
      "ELSE 'd&<>' || CAST(event_id AS VARCHAR) END AS description")
  /** DuckDB replica of [[foldBatches]]: per-(host, 5-event batch)
    * ordered value lists for the product/quotient fold oracles. */
  val foldCte =
    s"$cte, f AS (SELECT host, time_s, event_id, metric, " +
      "row_number() OVER (PARTITION BY host ORDER BY time_s, event_id) AS ord " +
      "FROM ev WHERE metric IS NOT NULL), " +
      "v AS (SELECT host, (ord - 1) // 5 AS batch_id, time_s, event_id, " +
      "CAST(CAST(FLOOR(ABS(metric)) AS BIGINT) % 7 - 3 AS DOUBLE) AS vi FROM f), " +
      "g AS (SELECT host, batch_id, list(vi ORDER BY time_s, event_id) AS ms FROM v GROUP BY 1, 2)"
  /** DuckDB snapshot-of-latest CTE built on `ev`. */
  val snapCte =
    s"""$cte, snap AS (SELECT *, row_number() OVER (PARTITION BY host, service
       | ORDER BY time_s DESC, event_id DESC) AS rn FROM ev)"""
      .stripMargin.replace("\n", "")
  /** DuckDB shingles CTE on `documents` (w=3, matching Dedup.shingles). */
  val shCte =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      | sh AS (SELECT doc_id, list_distinct(list_transform(
      |   generate_series(0, GREATEST(len(words)-3, 0)),
      |   i -> array_to_string(words[i+1:i+3], ' '))) AS shingles FROM s)"""
      .stripMargin.replace("\n", "")
  /** DuckDB replica of TextAnalysis.winnow (k=20, w=8): stride-1 char
    * 20-gram hashes (the MinHash md5-prefix-mod-P scheme), minimum per
    * 8-window, distinct + sorted — exposes `f(doc_id, fps)`. */
  val winnowCte: String = {
    val P = graft.pipeline.Dedup.MinhashP
    "WITH g AS (SELECT doc_id, list_transform(" +
      "generate_series(0, GREATEST(length(text)-20, 0)), " +
      s"i -> CAST(('0x'||substr(md5(substr(text, i+1, 20)),1,15)) AS BIGINT) % $P) AS hs " +
      "FROM documents), " +
      "f AS (SELECT doc_id, list_sort(list_distinct(list_transform(" +
      "generate_series(0, GREATEST(len(hs)-8, 0)), " +
      "s -> list_min(hs[s+1:s+8])))) AS fps FROM g)"
  }

  /** DuckDB unit-normalized embeddings CTE (matches Similarity.normalized). */
  val unitCte =
    """WITH e AS (SELECT vec_id, label,
      |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv FROM embeddings),
      | nn AS (SELECT vec_id, label, dv, sqrt(CAST(list_sum(list_transform(dv,
      |   x -> CAST(x*x AS DECIMAL(38,18)))) AS DOUBLE)) AS nrm FROM e),
      | u AS (SELECT vec_id, label, dv, list_transform(dv, x -> x/nrm) AS unit FROM nn)"""
      .stripMargin.replace("\n", "")
  val stopList =
    TextAnalysis.stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  /** DuckDB replica of Dedup.minhashSignature: same driver-derived
    * affine coefficients, same one-md5-per-shingle scheme. Relies on a
    * CTE exposing `hs` (see [[hsCte]]). */
  def minhashSigSql(k: Int): String = {
    val P = Dedup.MinhashP
    (0 until k).map { i =>
      val (a, b) = Dedup.minhashCoeff(i)
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $P))"
    }.mkString("[", ", ", "]")
  }
  val hsCte =
    s", hh AS (SELECT doc_id, shingles, list_transform(shingles, s -> " +
      s"CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % ${Dedup.MinhashP}) AS hs FROM sh)"

  /** DuckDB IVF chain on top of [[unitCte]]: label centroids →
    * nearest-cell assignment → nprobe=3 probes → per-query ranked
    * cosine (`ivf_rk`). Shared by the IVF search query and the recall
    * probe. */
  private lazy val ivfChain: String =
    "cd AS (SELECT label, unnest(unit) AS v, unnest(generate_series(0, len(unit)-1)) AS dim FROM u), " +
      "cc AS (SELECT label, dim, CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS c FROM cd GROUP BY 1, 2), " +
      "cent AS (SELECT label, list(c ORDER BY dim) AS cvec FROM cc GROUP BY label), " +
      "asg0 AS (SELECT u.vec_id, u.unit, c.label, list_sum(list_transform(list_zip(u.unit, c.cvec), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS score FROM u CROSS JOIN cent c), " +
      "asg AS (SELECT vec_id, unit, label AS cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, label) AS rn FROM asg0) WHERE rn = 1), " +
      "q AS (SELECT vec_id AS query_id, unit AS qunit FROM asg WHERE vec_id IN (0,1,2,3,4)), " +
      "pr0 AS (SELECT q.query_id, q.qunit, c.label, list_sum(list_transform(list_zip(q.qunit, c.cvec), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS score FROM q CROSS JOIN cent c), " +
      "pr AS (SELECT query_id, qunit, label AS cell FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, label) AS rn FROM pr0) WHERE rn <= 3), " +
      "sc AS (SELECT pr.query_id, asg.vec_id, round(CAST(list_sum(list_transform(list_zip(asg.unit, pr.qunit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine FROM pr JOIN asg ON pr.cell = asg.cell AND asg.vec_id <> pr.query_id), " +
      "ivf_rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM sc)"

  /** DuckDB PQ chain on top of [[unitCte]] (m = 8 subspaces of 8 dims,
    * label-seeded codebooks): per-(sub,label) decimal-mean codewords →
    * per-(vec,sub) argmax encode → per-query LUT → ADC scores as
    * scaled-long sums — the exact integers `Similarity.pqTopK`
    * computes. */
  private lazy val pqChain: String =
    "pd AS (SELECT vec_id, label, unnest(unit) AS v, unnest(generate_series(0, len(unit)-1)) AS dim FROM u), " +
      "ps AS (SELECT vec_id, label, v, dim, CAST(dim // 8 AS INT) AS sub FROM pd), " +
      "pcc AS (SELECT sub, label, dim, CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS c FROM ps GROUP BY 1, 2, 3), " +
      "pcb AS (SELECT sub, label, list(c ORDER BY dim) AS cvec FROM pcc GROUP BY 1, 2), " +
      "psv AS (SELECT vec_id, sub, list(v ORDER BY dim) AS svec FROM ps GROUP BY 1, 2), " +
      "pen0 AS (SELECT psv.vec_id, psv.sub, cb.label, list_sum(list_transform(list_zip(psv.svec, cb.cvec), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS score FROM psv JOIN pcb cb ON psv.sub = cb.sub), " +
      "pen AS (SELECT vec_id, sub, label AS code FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY score DESC, label) AS rn FROM pen0) WHERE rn = 1), " +
      "pq AS (SELECT vec_id AS query_id, unit AS qunit FROM u WHERE vec_id IN (0,1,2,3,4)), " +
      "pqd AS (SELECT query_id, unnest(qunit) AS v, unnest(generate_series(0, len(qunit)-1)) AS dim FROM pq), " +
      "pqs AS (SELECT query_id, CAST(dim // 8 AS INT) AS sub, list(v ORDER BY dim) AS qsvec FROM pqd GROUP BY 1, 2), " +
      "plut AS (SELECT pqs.query_id, pqs.sub, cb.label, list_sum(list_transform(list_zip(pqs.qsvec, cb.cvec), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS d FROM pqs JOIN pcb cb ON pqs.sub = cb.sub), " +
      "psc AS (SELECT l.query_id, pen.vec_id, round(CAST(SUM(l.d) AS DOUBLE)/1e16, 6) AS adc FROM pen JOIN plut l ON pen.sub = l.sub AND pen.code = l.label WHERE pen.vec_id <> l.query_id GROUP BY 1, 2), " +
      "pq_rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS rk FROM psc)"

  /** One unrolled Lloyd round on top of [[pqChain]]: re-mean each
    * codeword over its `pen`-assigned members (decimal-exact, global
    * dim order — identical values to Spark's subdim order), empty
    * codewords keep their seed position, then re-encode against the
    * refined books. */
  private lazy val pqRefChain: String =
    "rnc AS (SELECT ps.sub, pen.code, ps.dim, CAST(SUM(CAST(ps.v AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS c FROM ps JOIN pen ON ps.vec_id = pen.vec_id AND ps.sub = pen.sub GROUP BY 1, 2, 3), " +
      "rcb0 AS (SELECT sub, code AS label, list(c ORDER BY dim) AS cvec FROM rnc GROUP BY 1, 2), " +
      "rcb AS (SELECT p.sub, p.label, COALESCE(r.cvec, p.cvec) AS cvec FROM pcb p LEFT JOIN rcb0 r ON p.sub = r.sub AND p.label = r.label), " +
      "ren0 AS (SELECT psv.vec_id, psv.sub, cb.label, list_sum(list_transform(list_zip(psv.svec, cb.cvec), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS score FROM psv JOIN rcb cb ON psv.sub = cb.sub), " +
      "ren AS (SELECT vec_id, sub, label AS code FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY score DESC, label) AS rn FROM ren0) WHERE rn = 1)"

  /** DuckDB IVF×PQ chain (IVFADC) on top of [[ivfChain]]'s `cent`,
    * `asg`, `q`: residuals (unit − centroid[cell]) → per-(vec, sub)
    * residual subvectors → data-point seeds (vec_id < 16) → ONE Lloyd
    * round of min-scaled-L2 assignment + decimal re-mean (empty
    * codewords hold) → final encode → nprobe=3 probes carrying the
    * scaled q·c_cell term → per-query LUT → ADC over probed cells only:
    * adc = (q·c_cell + Σ_s LUT[sub][code]) / 1e16 — the exact longs
    * `Similarity.ivfPqTopK` computes. */
  private lazy val ivfPqChain: String =
    "ipr AS (SELECT asg.vec_id, asg.cell, list_transform(list_zip(asg.unit, c.cvec), z -> z[1]-z[2]) AS rvec FROM asg JOIN cent c ON asg.cell = c.label), " +
      "iprs AS (SELECT vec_id, cell, s.sub, list_slice(rvec, s.sub*8+1, s.sub*8+8) AS svec FROM ipr, (SELECT unnest(generate_series(0, 7)) AS sub) s), " +
      "iseed AS (SELECT sub, CAST(vec_id AS INT) AS label, svec AS cvec FROM iprs WHERE vec_id < 16), " +
      "ias0 AS (SELECT iprs.vec_id, iprs.sub, s.label, list_sum(list_transform(list_zip(iprs.svec, s.cvec), z -> CAST(FLOOR((z[1]-z[2])*(z[1]-z[2])*1e12) AS BIGINT))) AS d FROM iprs JOIN iseed s ON iprs.sub = s.sub), " +
      "ias AS (SELECT vec_id, sub, label AS code FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, label) AS rn FROM ias0) WHERE rn = 1), " +
      "irm AS (SELECT iprs.sub, ias.code, sd.sd, CAST(SUM(CAST(list_extract(iprs.svec, sd.sd+1) AS DECIMAL(38,18))) AS DOUBLE)/count(*) AS c FROM iprs JOIN ias ON iprs.vec_id = ias.vec_id AND iprs.sub = ias.sub, (SELECT unnest(generate_series(0, 7)) AS sd) sd GROUP BY 1, 2, 3), " +
      "ircb0 AS (SELECT sub, code AS label, list(c ORDER BY sd) AS cvec FROM irm GROUP BY 1, 2), " +
      "ircb AS (SELECT s.sub, s.label, COALESCE(r.cvec, s.cvec) AS cvec FROM iseed s LEFT JOIN ircb0 r ON s.sub = r.sub AND s.label = r.label), " +
      "ien0 AS (SELECT iprs.vec_id, iprs.sub, cb.label, list_sum(list_transform(list_zip(iprs.svec, cb.cvec), z -> CAST(FLOOR((z[1]-z[2])*(z[1]-z[2])*1e12) AS BIGINT))) AS d FROM iprs JOIN ircb cb ON iprs.sub = cb.sub), " +
      "ien AS (SELECT vec_id, sub, label AS code FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, label) AS rn FROM ien0) WHERE rn = 1), " +
      "ipp0 AS (SELECT q.query_id, q.qunit, c.label, list_sum(list_transform(list_zip(q.qunit, c.cvec), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS score FROM q CROSS JOIN cent c), " +
      "ipp AS (SELECT query_id, qunit, label AS cell, score FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, label) AS rn FROM ipp0) WHERE rn <= 3), " +
      "ilut AS (SELECT q.query_id, cb.sub, cb.label, list_sum(list_transform(list_zip(list_slice(q.qunit, cb.sub*8+1, cb.sub*8+8), cb.cvec), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS d FROM q CROSS JOIN ircb cb), " +
      "isc AS (SELECT ipp.query_id, asg.vec_id, round(CAST(ipp.score + SUM(l.d) AS DOUBLE)/1e16, 6) AS adc FROM ipp JOIN asg ON asg.cell = ipp.cell AND asg.vec_id <> ipp.query_id JOIN ien ON ien.vec_id = asg.vec_id JOIN ilut l ON l.query_id = ipp.query_id AND l.sub = ien.sub AND l.label = ien.code GROUP BY ipp.query_id, asg.vec_id, ipp.score), " +
      "ivfpq_rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS rk FROM isc)"

  /** Shared DuckDB chain on [[unitCte]]: banded hyperplane buckets →
    * capped → colliding pairs with exact cosine (`j`) — the base of
    * the embedding near-dup pair query and the SemDeDup components. */
  private lazy val embNearDupChain: String = {
    val banded = (0 until 4).map(b =>
      s"SELECT vec_id, $b AS band, ${bucketSql(6, "dv", b * 6)} AS bucket FROM u")
      .mkString(" UNION ALL ")
    s"banded0 AS ($banded), " +
      s"okb AS (SELECT band, bucket FROM banded0 GROUP BY band, bucket HAVING count(*) <= ${pipeline.Caps.DefaultMaxBucket}), " +
      "banded AS (SELECT banded0.* FROM banded0 JOIN okb USING (band, bucket)), " +
      "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id), " +
      "j AS (SELECT vec_a, vec_b, round(CAST(list_sum(list_transform(list_zip(ua.unit, ub.unit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine " +
      "FROM cand JOIN u ua ON cand.vec_a = ua.vec_id JOIN u ub ON cand.vec_b = ub.vec_id)"
  }

  /** Shared DuckDB chain: minhash signatures → 4-band LSH buckets →
    * colliding pairs with estimated Jaccard (k=16, w=3) — the base of
    * both the pair query and the component clustering. The default
    * hot-bucket cap ([[graft.pipeline.Caps.DefaultMaxBucket]]) is
    * mirrored (`okb`/`bk`) so Spark and oracle agree at EVERY scale
    * factor, not just ones where no bucket exceeds the cap. */
  /** The BPE rewrite formula — textually identical semantics to
    * `Bpe.applyMerge` (padded double-space replace, undouble, trim). */
  private def bpeApplySql(sym: String, pr: String): String =
    s"trim(replace(replace(' ' || replace($sym, ' ', '  ') || ' ', " +
      s"' ' || replace($pr, ' ', '  ') || ' ', " +
      s"' ' || replace($pr, ' ', '') || ' '), '  ', ' '))"

  /** Unrolled BPE training chain: v0 = top-`cap` word frequencies with
    * char-spaced symbols (spaces Ġ-mapped, chr(288)); each round b_i
    * picks argmax pair by (weighted count desc, pair asc) and v_i
    * applies it — exactly `Bpe.trainOnVocab`'s driver loop, unrolled
    * to `n` fixed rounds of SQL. */
  private lazy val bpeRe = graft.pipeline.TextAnalysis.BpeSplitRe
    .replace("'", "''")
  private def bpeCtes(n: Int, cap: Int): String = {
    // MATERIALIZED: without it DuckDB inlines each CTE reference, and
    // v_i -> (v_{i-1}, b_i -> v_{i-1}) doubles the expansion per round
    // — 2^n scans of the parquet by round n
    val base = "v0 AS MATERIALIZED (SELECT word, freq, " +
      "array_to_string(regexp_extract_all(replace(word, ' ', chr(288)), '(?s).'), ' ') AS sym " +
      s"FROM (SELECT tok AS word, count(*) AS freq FROM " +
      s"(SELECT unnest(regexp_extract_all(text, '$bpeRe')) AS tok FROM documents) " +
      s"GROUP BY tok ORDER BY freq DESC, word LIMIT $cap))"
    val steps = (1 to n).map { i =>
      s"b$i AS MATERIALIZED (SELECT pr, cnt FROM (SELECT pr, sum(freq) AS cnt FROM v${i - 1} " +
        "CROSS JOIN unnest(list_transform(generate_series(1, len(string_split(sym, ' ')) - 1), " +
        "i -> string_split(sym, ' ')[i] || ' ' || string_split(sym, ' ')[i + 1])) AS tt(pr) " +
        "GROUP BY pr) ORDER BY cnt DESC, pr LIMIT 1), " +
        s"v$i AS MATERIALIZED (SELECT word, freq, ${bpeApplySql("sym", "pr")} AS sym " +
        s"FROM v${i - 1} CROSS JOIN b$i)"
    }
    (base +: steps).mkString(", ")
  }

  /** Per-side minhash banded CTE chain (suffix-tagged, hot-bucket cap
    * applied WITHIN the side) rooted on a filtered documents slice —
    * the cross-corpus oracle builds one per side, mirroring
    * [[graft.pipeline.Dedup.crossCorpusNearDups]]' per-side caps. */
  private def sideBandedCtes(sfx: String, where: String): String =
    s"s$sfx AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE $where), " +
      s"sh$sfx AS (SELECT doc_id, list_distinct(list_transform(generate_series(0, GREATEST(len(words)-3, 0)), i -> array_to_string(words[i+1:i+3], ' '))) AS shingles FROM s$sfx), " +
      s"hh$sfx AS (SELECT doc_id, list_transform(shingles, s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % ${Dedup.MinhashP}) AS hs FROM sh$sfx), " +
      s"sg$sfx AS (SELECT doc_id, ${minhashSigSql(16)} AS sig FROM hh$sfx), " +
      s"banded$sfx AS (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band FROM sg$sfx), " +
      s"bk0$sfx AS (SELECT doc_id, sig, band, md5(array_to_string(list_transform(sig[band*4+1:band*4+4], x -> CAST(x AS VARCHAR)), ',')) AS bucket FROM banded$sfx), " +
      s"okb$sfx AS (SELECT band, bucket FROM bk0$sfx GROUP BY band, bucket HAVING count(*) <= ${pipeline.Caps.DefaultMaxBucket}), " +
      s"bk$sfx AS (SELECT bk0$sfx.* FROM bk0$sfx JOIN okb$sfx USING (band, bucket))"

  /** The full BPE encode chain SHARED by the count and token oracles:
    * [[bpeCtes]] training + e0 (per-doc initial symbols) + e1..eN
    * (one merge application per round) — ONE construction so the two
    * oracles' token semantics cannot drift. */
  private def bpeEncChain(n: Int, cap: Int): String = {
    val enc = (1 to n).map { i =>
      s"e$i AS MATERIALIZED (SELECT doc_id, list_transform(syms, " +
        s"s -> ${bpeApplySql("s", "pr")}) AS syms " +
        s"FROM e${i - 1} CROSS JOIN b$i)"
    }.mkString(", ")
    s"WITH ${bpeCtes(n, cap)}, " +
      "e0 AS MATERIALIZED (SELECT doc_id, list_transform(" +
      s"regexp_extract_all(text, '$bpeRe'), " +
      "t -> trim(regexp_replace(replace(t, ' ', chr(288)), '(?s)(.)', '\\1 ', 'g'))) AS syms " +
      s"FROM documents), $enc"
  }

  /** Unrolled Unigram-LM mirror of [[graft.pipeline.Unigram]]: the
    * forward Viterbi DP as MaxWordLen chained CTE levels (b_i = min
    * over the ≤MaxPieceLen spans ending at i of b_j + packed piece
    * cost), reused by the train chain (over the vocab words) and the
    * encode chain (over the documents' distinct pre-tokens). */
  private def unigramDpLevels(pfx: String): String = {
    val n = pipeline.Unigram.MaxWordLen
    val pl = pipeline.Unigram.MaxPieceLen
    (1 to n).map { i =>
      val cases = (math.max(0, i - pl) until i)
        .map(j => s"WHEN $j THEN d.b$j").mkString(" ")
      s"${pfx}d$i AS MATERIALIZED (SELECT d.*, " +
        s"(SELECT min((CASE s.j $cases END) + s.pc) FROM ${pfx}sp s " +
        s"WHERE s.word = d.word AND s.i = $i) AS b$i " +
        s"FROM ${pfx}d${i - 1} d)"
    }.mkString(", ")
  }

  /** Span-cost CTEs shared by the unigram train and encode DPs: every
    * (word, i, j) span with its packed cost — trained pieces pay
    * cost·64+1, unknown single chars the UnkCost fallback, unknown
    * multi-char spans a finite INF that can never win (a single-char
    * path always exists). `vocabCte` supplies (piece, cost). */
  private def unigramSpanCtes(pfx: String, wordsCte: String,
      vocabCte: String): String = {
    val pl = pipeline.Unigram.MaxPieceLen
    val unk = pipeline.Unigram.UnkCost * 64 + 1
    val inf = Long.MaxValue / 4
    s"${pfx}sp1 AS (SELECT word, unnest(generate_series(1, CAST(len(word) AS BIGINT))) AS i FROM $wordsCte), " +
      s"${pfx}sp2 AS (SELECT word, i, unnest(generate_series(greatest(i - $pl, 0), i - 1)) AS j FROM ${pfx}sp1), " +
      s"${pfx}sp AS MATERIALIZED (SELECT s.word, s.i, s.j, " +
      s"COALESCE(c.cost * 64 + 1, CASE WHEN s.i - s.j = 1 THEN $unk ELSE $inf END) AS pc " +
      s"FROM (SELECT word, i, j, substr(word, CAST(j + 1 AS INT), CAST(i - j AS INT)) AS piece FROM ${pfx}sp2) s " +
      s"LEFT JOIN $vocabCte c USING (piece))"
  }

  /** The full unigram TRAINING chain (ends at `uc1`: piece, usage,
    * cost): seed substring counts over the top-VocabCap pre-tokens,
    * initial fixed-point −log2 costs, ONE hard-EM Viterbi round
    * (forward DP + MaxWordLen-level backtrace with the explicit
    * (value asc, j asc) = smallest-split tie-break), prune to singles
    * + top-TargetMultis used pieces, rescore on usage — every step
    * the integer arithmetic graft.pipeline.Unigram.trainOnWords runs
    * on the driver. */
  private lazy val unigramTrainCtes: String = {
    import pipeline.Unigram.{MaxWordLen, SeedMultis, TargetMultis, VocabCap}
    def l2d(x: String) = pipeline.TextAnalysis.log2FixedDuck(x)
    val btCase = (0 until MaxWordLen)
      .map(j => s"WHEN $j THEN d.b$j").mkString(" ")
    val backtrace = (1 to MaxWordLen).map { k =>
      s"ubt$k AS MATERIALIZED (SELECT word, freq, j AS pos, piece FROM (" +
        s"SELECT t.word, t.freq, s.j, substr(t.word, CAST(s.j + 1 AS INT), CAST(t.pos - s.j AS INT)) AS piece, " +
        s"row_number() OVER (PARTITION BY t.word ORDER BY ((CASE s.j $btCase END) + s.pc) ASC, s.j ASC) AS rk " +
        s"FROM ubt${k - 1} t JOIN usp s ON s.word = t.word AND s.i = t.pos " +
        s"JOIN ud$MaxWordLen d ON d.word = t.word WHERE t.pos > 0) WHERE rk = 1)"
    }.mkString(", ")
    val btUnion = (1 to MaxWordLen)
      .map(k => s"SELECT piece, freq FROM ubt$k").mkString(" UNION ALL ")
    s"uw AS MATERIALIZED (SELECT word, freq FROM (SELECT replace(word, ' ', chr(288)) AS word, freq FROM " +
      s"(SELECT tok AS word, count(*) AS freq FROM (SELECT unnest(regexp_extract_all(text, '$bpeRe')) AS tok FROM documents) " +
      s"GROUP BY tok ORDER BY freq DESC, word LIMIT $VocabCap)) WHERE len(word) BETWEEN 1 AND $MaxWordLen), " +
      // seed: all 1..MaxPieceLen-char substrings, frequency-weighted
      s"us1 AS (SELECT word, freq, unnest(generate_series(1, CAST(len(word) AS BIGINT))) AS i FROM uw), " +
      s"us2 AS (SELECT word, freq, i, unnest(generate_series(1, least(${pipeline.Unigram.MaxPieceLen}, CAST(len(word) AS BIGINT) - i + 1))) AS l FROM us1), " +
      "usd AS MATERIALIZED (SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, CAST(sum(freq) AS BIGINT) AS cnt FROM us2 GROUP BY 1), " +
      "usg AS (SELECT piece, cnt FROM usd WHERE len(piece) = 1), " +
      s"umu AS MATERIALIZED (SELECT piece, cnt FROM usd WHERE len(piece) >= 2 ORDER BY cnt DESC, piece LIMIT $SeedMultis), " +
      "uv0 AS (SELECT piece, cnt FROM usg UNION ALL SELECT piece, cnt FROM umu), " +
      "ut0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t0, CAST(count(*) AS BIGINT) AS v0 FROM uv0), " +
      s"uc0 AS MATERIALIZED (SELECT piece, ${l2d("ut0.t0 + ut0.v0")} - ${l2d("uv0.cnt + 1")} AS cost FROM uv0 CROSS JOIN ut0), " +
      unigramSpanCtes("u", "uw", "uc0") + ", " +
      "ud0 AS (SELECT word, freq, CAST(0 AS BIGINT) AS b0 FROM uw), " +
      unigramDpLevels("u") + ", " +
      "ubt0 AS (SELECT word, freq, CAST(len(word) AS BIGINT) AS pos FROM uw), " +
      backtrace + ", " +
      s"uus AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS usage FROM ($btUnion) GROUP BY 1), " +
      s"umk AS (SELECT m.piece FROM umu m JOIN uus u USING (piece) WHERE u.usage >= 1 ORDER BY u.usage DESC, m.piece LIMIT $TargetMultis), " +
      "uv1 AS (SELECT piece FROM usg UNION ALL SELECT piece FROM umk), " +
      "uu1 AS (SELECT v.piece, COALESCE(u.usage, 0) AS usage FROM uv1 v LEFT JOIN uus u USING (piece)), " +
      "ut1 AS (SELECT CAST(sum(usage) AS BIGINT) AS t1, CAST(count(*) AS BIGINT) AS v1 FROM uu1), " +
      s"uc1 AS MATERIALIZED (SELECT piece, usage, ${l2d("ut1.t1 + ut1.v1")} - ${l2d("uu1.usage + 1")} AS cost FROM uu1 CROSS JOIN ut1)"
  }

  /** The unigram ENCODE chain (appended after [[unigramTrainCtes]];
    * ends at `ueagg`: doc_id, n_pretokens, n_unigram_tokens,
    * total_cost): the same DP over the documents' distinct Ġ-mapped
    * pre-tokens under the final `uc1` costs; words longer than
    * MaxWordLen take the one-token-per-char UnkCost fallback. */
  private lazy val unigramEncodeCtes: String = {
    val n = pipeline.Unigram.MaxWordLen
    val unkC = pipeline.Unigram.UnkCost
    val lenCase = (1 to n).map(i => s"WHEN $i THEN b$i").mkString(" ")
    s"uew AS MATERIALIZED (SELECT doc_id, replace(tok, ' ', chr(288)) AS word, CAST(count(*) AS BIGINT) AS cnt " +
      s"FROM (SELECT doc_id, unnest(regexp_extract_all(text, '$bpeRe')) AS tok FROM documents) GROUP BY 1, 2), " +
      s"uewd AS (SELECT DISTINCT word FROM uew WHERE len(word) <= $n), " +
      unigramSpanCtes("ue", "uewd", "uc1") + ", " +
      "ued0 AS (SELECT word, CAST(0 AS BIGINT) AS b0 FROM uewd), " +
      unigramDpLevels("ue") + ", " +
      s"uefin AS (SELECT word, CASE CAST(len(word) AS INT) $lenCase END AS packed FROM ued$n), " +
      s"uewt AS (SELECT e.doc_id, e.cnt, CASE WHEN len(e.word) > $n THEN CAST(len(e.word) AS BIGINT) ELSE f.packed % 64 END AS ntok, " +
      s"CASE WHEN len(e.word) > $n THEN CAST(len(e.word) AS BIGINT) * $unkC ELSE f.packed // 64 END AS wcost " +
      "FROM uew e LEFT JOIN uefin f USING (word)), " +
      "ueagg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_pretokens, CAST(sum(cnt * ntok) AS BIGINT) AS n_unigram_tokens, " +
      "CAST(sum(cnt * wcost) AS BIGINT) AS total_cost FROM uewt GROUP BY 1)"
  }

  /** The unigram TOKEN chain (appended after [[unigramEncodeCtes]];
    * ends at `uetd`: doc_id, n_unigram_tokens, tokens_str): the encode
    * DP's backtrace (same (value asc, j asc) smallest-split rule as
    * training), pieces re-assembled left-to-right per word, then per
    * document in pre-token order on the unit separator; over-long
    * words take the one-token-per-char fallback. */
  private lazy val unigramTokensCtes: String = {
    import pipeline.Unigram.MaxWordLen
    val btCase = (0 until MaxWordLen)
      .map(j => s"WHEN $j THEN d.b$j").mkString(" ")
    val backtrace = (1 to MaxWordLen).map { k =>
      s"uebt$k AS MATERIALIZED (SELECT word, j AS pos, piece FROM (" +
        s"SELECT t.word, s.j, substr(t.word, CAST(s.j + 1 AS INT), CAST(t.pos - s.j AS INT)) AS piece, " +
        s"row_number() OVER (PARTITION BY t.word ORDER BY ((CASE s.j $btCase END) + s.pc) ASC, s.j ASC) AS rk " +
        s"FROM uebt${k - 1} t JOIN uesp s ON s.word = t.word AND s.i = t.pos " +
        s"JOIN ued$MaxWordLen d ON d.word = t.word WHERE t.pos > 0) WHERE rk = 1)"
    }.mkString(", ")
    val btUnion = (1 to MaxWordLen)
      .map(k => s"SELECT word, pos, piece FROM uebt$k").mkString(" UNION ALL ")
    s"uebt0 AS (SELECT word, CAST(len(word) AS BIGINT) AS pos FROM uewd), " +
      backtrace + ", " +
      s"uetk AS (SELECT word, string_agg(piece, chr(31) ORDER BY pos) AS tokstr, " +
      s"CAST(count(*) AS BIGINT) AS ntokw FROM ($btUnion) GROUP BY word), " +
      "uetp AS (SELECT doc_id, p AS pos, replace(toks[p], ' ', chr(288)) AS word FROM " +
      s"(SELECT doc_id, regexp_extract_all(text, '$bpeRe') AS toks FROM documents) " +
      "CROSS JOIN unnest(generate_series(1, len(toks))) AS u(p)), " +
      s"uetw AS (SELECT doc_id, pos, CASE WHEN len(word) > $MaxWordLen THEN " +
      "array_to_string(list_transform(generate_series(1, CAST(len(word) AS BIGINT)), i -> substr(word, CAST(i AS INT), 1)), chr(31)) " +
      "ELSE tk.tokstr END AS wtok, " +
      s"CASE WHEN len(word) > $MaxWordLen THEN CAST(len(word) AS BIGINT) ELSE tk.ntokw END AS ntok " +
      "FROM uetp LEFT JOIN uetk tk USING (word)), " +
      "uetd AS (SELECT doc_id, CAST(sum(ntok) AS BIGINT) AS n_unigram_tokens, " +
      "string_agg(wtok, chr(31) ORDER BY pos) AS tokens_str FROM uetw GROUP BY doc_id)"
  }

  private lazy val minhashPairsCte: String =
    s"$shCte$hsCte, sg AS (SELECT doc_id, ${minhashSigSql(16)} AS sig FROM hh), " +
      "banded AS (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band FROM sg), " +
      "bk0 AS (SELECT doc_id, sig, band, md5(array_to_string(list_transform(sig[band*4+1:band*4+4], x -> CAST(x AS VARCHAR)), ',')) AS bucket FROM banded), " +
      s"okb AS (SELECT band, bucket FROM bk0 GROUP BY band, bucket HAVING count(*) <= ${pipeline.Caps.DefaultMaxBucket}), " +
      "bk AS (SELECT bk0.* FROM bk0 JOIN okb USING (band, bucket)), " +
      "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(len(list_filter(list_zip(a.sig, b.sig), z -> z[1] = z[2])) AS DOUBLE) / 16 AS est_jaccard " +
      "FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"

  /** DuckDB replica of Similarity.bucketExpr: the same driver-computed
    * hyperplane constants are embedded as list literals on both sides
    * (Double.toString round-trips, and every constant is an exact
    * multiple of 1e-5, so the parsed doubles are identical). */
  def bucketSql(planes: Int, src: String = "dv",
      planeOffset: Int = 0): String =
    (0 until planes).map { p =>
      val arr = Array.tabulate(64)(d =>
        Similarity.planeComponent(planeOffset + p, d)).mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip($src, CAST($arr AS DOUBLE[]))," +
        s" z -> CAST(FLOOR(z[1]*z[2]*1e12) AS BIGINT))) >= 0" +
        s" THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** DuckDB replica of Similarity.randomProject's j-th component: the
    * same md5-derived plane at RpPlaneOffset, the same scaled-long sum,
    * divided by the one shared `1e12·√outDims` literal. */
  def rpProjSql(j: Int, outDims: Int, src: String = "unit"): String = {
    val arr = Array.tabulate(64)(d =>
      Similarity.planeComponent(Similarity.RpPlaneOffset + j, d))
      .mkString("[", ",", "]")
    s"(CAST(list_sum(list_transform(list_zip($src, CAST($arr AS DOUBLE[])), " +
      s"z -> CAST(FLOOR(z[1]*z[2]*1e12) AS BIGINT))) AS DOUBLE) / " +
      s"${Similarity.rpDivisor(outDims)})"
  }

  /** Projected corpus on top of [[unitCte]]: (vec_id, label, unit,
    * one rp DOUBLE[n] column per n in outDimsList). */
  def rpCte(outDimsList: Int*): String =
    s", rp AS (SELECT vec_id, label, unit, " +
      outDimsList.map(n =>
        (0 until n).map(rpProjSql(_, n)).mkString("[", ", ", "]") +
          s" AS rp$n").mkString(", ") +
      " FROM u)"

  val simhashCte: String = {
    val bitSums = (0 until 64).map { b =>
      val h = if (b < 60) s"(h1 >> $b)" else s"(h2 >> ${b - 60})"
      s"SUM(CASE WHEN $h & 1 = 1 THEN cnt ELSE -cnt END) AS b$b"
    }.mkString(", ")
    val pack = (0 until 64).map { b =>
      val w = if (b == 63) "(-9223372036854775807 - 1)" else s"CAST(${1L << b} AS BIGINT)"
      s"CASE WHEN b$b > 0 THEN $w ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    "WITH toks AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt, " +
      "CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) AS h1, " +
      "CAST(('0x'||substr(md5(tok),16,15)) AS BIGINT) AS h2 " +
      "FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents) " +
      s"GROUP BY doc_id, tok, h1, h2), agg AS (SELECT doc_id, $bitSums " +
      s"FROM toks GROUP BY doc_id), fp AS (SELECT doc_id, $pack AS simhash " +
      "FROM agg)"
  }

  val simhashSql: String =
    s"$simhashCte SELECT doc_id, simhash FROM fp ORDER BY doc_id"

  /** Pigeonhole blocking mirror of Dedup.simhashPairs: 4 blocks of 16
    * bits for maxHamming = 3; DuckDB's arithmetic >> then mask keeps
    * the same bits as Spark's shiftright+mask. The default hot-block
    * cap is mirrored (`okblk`/`blocks`) to match Spark at every scale. */
  val simhashPairsSql: String =
    s"$simhashCte, blocks0 AS (SELECT doc_id, simhash, i AS blk, " +
      "(simhash >> (i*16)) & 65535 AS v FROM fp " +
      "CROSS JOIN (SELECT unnest(range(4)) AS i)), " +
      s"okblk AS (SELECT blk, v FROM blocks0 GROUP BY blk, v HAVING count(*) <= ${pipeline.Caps.DefaultMaxBucket}), " +
      "blocks AS (SELECT blocks0.* FROM blocks0 JOIN okblk USING (blk, v)) " +
      "SELECT * FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming " +
      "FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.v = b.v " +
      "AND a.doc_id < b.doc_id) " +
      "WHERE hamming <= 3 ORDER BY doc_a, doc_b"


  /** Mirror of TextAnalysis.langIdNgram's trained Naive-Bayes chain:
    * hashed char-3-gram features, add-one-smoothed counts per
    * (lang, bucket), fixed-point-log2 scores, argmax with the explicit
    * (score DESC, lang DESC) tie-break. Ends at CTE `lidp` keyed
    * (doc_id, lang, score, rk); rk = 1 is the prediction. MATERIALIZED
    * because `lg` feeds four branches (default inlining doubles the
    * expansion per reference). */
  private val langIdNgramChain: String = {
    val b = pipeline.TextAnalysis.LangIdBuckets
    def l2(x: String) = pipeline.TextAnalysis.log2FixedDuck(x)
    s"lgd AS MATERIALIZED (SELECT doc_id, lang, unnest(generate_series(1, len(text) - 2)) AS i, text FROM documents WHERE len(text) >= 3), " +
      s"lg AS MATERIALIZED (SELECT doc_id, lang, CAST(('0x'||substr(md5('lid:'||substr(text, i, 3)),1,15)) AS BIGINT) % $b AS b FROM lgd), " +
      "lidtc AS (SELECT lang, b, count(*) AS c FROM lg WHERE lang IS NOT NULL GROUP BY 1, 2), " +
      s"lidnl AS (SELECT lang, count(*) + $b AS nbt FROM lg WHERE lang IS NOT NULL GROUP BY 1), " +
      "lidbs AS (SELECT DISTINCT b FROM lg WHERE lang IS NOT NULL), " +
      s"lidgrid AS (SELECT lidnl.lang, lidbs.b, ${l2("COALESCE(lidtc.c, 0) + 1")} AS lc, ${l2("lidnl.nbt")} AS lnb " +
      "FROM lidnl CROSS JOIN lidbs LEFT JOIN lidtc ON lidtc.lang = lidnl.lang AND lidtc.b = lidbs.b), " +
      "lidsc AS (SELECT g.doc_id, gr.lang, CAST(SUM(gr.lc) AS BIGINT) - count(*) * max(gr.lnb) AS score " +
      "FROM lg g JOIN lidgrid gr USING (b) GROUP BY 1, 2), " +
      "lidp AS (SELECT doc_id, lang, score, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rk FROM lidsc)"
  }

  private val base: Map[String, String] = Map(
    "q_where" -> s"$cte SELECT event_id, host, service, metric FROM ev WHERE metric > 100 AND service = 'purchase' ORDER BY event_id",
    "q_over_under" -> s"$cte SELECT event_id, metric FROM ev WHERE metric > 50 AND metric < 150 ORDER BY event_id",
    "q_tagged_any" -> s"$cte SELECT event_id, service, metric FROM ev WHERE list_has_any(tags, ['big']) ORDER BY event_id",
    "q_tagged_all" -> s"$cte SELECT event_id, metric FROM ev WHERE list_has_all(tags, ['purchase','big']) ORDER BY event_id",
    "q_expired" -> s"$cte SELECT event_id, host, service, time_s, ttl FROM ev WHERE state = 'expired' OR (ttl IS NOT NULL AND 1706620000 - time_s > ttl) ORDER BY event_id",
    "q_split" -> s"$cte SELECT event_id, CASE WHEN metric > 150 THEN 'high' WHEN metric > 50 THEN 'mid' ELSE 'low' END AS route FROM ev ORDER BY event_id",
    "q_splitp" -> s"$cte SELECT event_id, CASE WHEN state = 'critical' THEN 'page' WHEN state = 'warning' THEN 'notify' ELSE 'ignore' END AS route FROM ev ORDER BY event_id",
    "q_dual" -> s"$cte SELECT event_id, 'expired' AS state FROM ev WHERE NOT coalesce(metric > 50, false) ORDER BY event_id",
    "q_match" -> s"$cte SELECT event_id, service FROM ev WHERE regexp_matches(service, 'purchase|signup') ORDER BY event_id",
    "q_project_fields" -> s"$cte SELECT event_id, 'evt' AS description, metric * CAST(0.5 AS DOUBLE) AS metric FROM ev ORDER BY event_id",
    "q_default" -> s"$cte SELECT event_id, coalesce(state, 'ok') AS state, 'dc1' AS site FROM ev ORDER BY event_id",
    "q_tag_untag" -> s"$cte SELECT event_id, array_to_string(list_sort(list_distinct(list_filter(list_concat(tags, ['x']), t -> t <> 'big'))), ',') AS tags FROM ev ORDER BY event_id",
    "q_smap" -> s"$cte, m AS (SELECT event_id, metric / CAST(10 AS DOUBLE) AS metric FROM ev) SELECT event_id, metric FROM m WHERE metric > 10 ORDER BY event_id",
    "q_smapcat" -> s"$cte SELECT event_id, unnest(tags) AS tag FROM ev ORDER BY event_id, tag",
    "q_adjust" -> s"$cte SELECT event_id, service || '!' AS service FROM ev ORDER BY event_id",
    // sflatten is vector->rows: the group/flatten roundtrip is identity
    "q_sflatten" -> s"$cte SELECT event_id, service, metric FROM ev ORDER BY event_id",
    // no event in the derived view carries line-protocol specials, so
    // the escape regexes are identity here (escaping itself is golden-
    // tested in SinksExtraSpec); doubles render identically
    "q_influx_lines" -> (s"$cte SELECT event_id, service || ',host=' || host || " +
      "' value=' || CAST(CAST(metric AS DOUBLE) AS VARCHAR) || ' ' || " +
      "CAST(time_s * 1000000000 AS VARCHAR) AS line FROM ev WHERE metric IS NOT NULL ORDER BY event_id"),
    "q_influx2_line" -> (s"$cte SELECT event_id, service || " +
      "(CASE WHEN host IS NOT NULL AND host <> '' THEN ',host=' || host ELSE '' END) || " +
      "' value=' || CAST(CAST(metric AS DOUBLE) AS VARCHAR) || ' ' || " +
      "CAST(time_s * 1000 AS VARCHAR) AS line FROM ev WHERE metric IS NOT NULL ORDER BY event_id"),
    // JSON wire codec round-trips every field losslessly
    "q_json_roundtrip" -> (s"$cte SELECT event_id, host, service, state, metric, " +
      "COALESCE(array_to_string(tags, ','), '') AS tags, time_s, ttl FROM ev ORDER BY event_id"),
    "q_query_search" -> s"$snapCte SELECT event_id, host, service, state, metric, time_s FROM snap WHERE rn = 1 AND (state = 'critical' OR (metric > 120 AND list_contains(tags, 'big'))) ORDER BY event_id",
    "q_query_sql" -> s"$snapCte SELECT event_id, host, service, state, metric, time_s FROM snap WHERE rn = 1 AND (state = 'critical' OR (metric > 120 AND list_contains(tags, 'big'))) ORDER BY event_id",
    "q_query_attrs" -> (EventView.oracleCteWith(
      "CAST(json_extract_string(props, '$.k') AS DOUBLE) AS kval") +
      ", snap AS (SELECT *, row_number() OVER (PARTITION BY host, service ORDER BY time_s DESC, event_id DESC) AS rn FROM ev) " +
      "SELECT event_id, host, service, metric FROM snap WHERE rn = 1 AND kval > 50 AND metric < 100 ORDER BY event_id"),
    "q_index_snapshot" -> s"$snapCte SELECT event_id, host, service, state, metric, time_s FROM snap WHERE rn = 1 ORDER BY host, service",
    "q_index_expired" -> s"$snapCte SELECT host, service, 'expired' AS state, CAST(1706620000 AS BIGINT) AS time_s FROM snap WHERE rn = 1 AND (state = 'expired' OR (ttl IS NOT NULL AND 1706620000 - time_s > ttl)) ORDER BY host, service",
    "q_coalesce" -> s"$snapCte SELECT service, host, time_s, event_id, metric, state FROM snap WHERE rn = 1 ORDER BY service, host",
    "q_coalesce_fold" -> s"$snapCte SELECT service, count(*) AS n_hosts, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / count(metric) AS mean_latest FROM snap WHERE rn = 1 GROUP BY service ORDER BY service",
    "q_project_quotient" -> (s"$cte, hosts AS (SELECT DISTINCT host FROM ev), " +
      "r AS (SELECT host, service, metric, row_number() OVER (PARTITION BY host, service ORDER BY time_s DESC, event_id DESC) AS rn FROM ev WHERE service IN ('purchase', 'error')) " +
      "SELECT hosts.host, a.metric AS metric_a, b.metric AS metric_b, round(a.metric / b.metric, 6) AS quotient FROM hosts " +
      "LEFT JOIN (SELECT host, metric FROM r WHERE rn = 1 AND service = 'purchase') a ON hosts.host = a.host " +
      "LEFT JOIN (SELECT host, metric FROM r WHERE rn = 1 AND service = 'error') b ON hosts.host = b.host ORDER BY hosts.host"),
    "q_fixed_offset_window" -> s"$cte SELECT service, time_s - time_s % 3600 AS window_start, count(*) AS n_events, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_metric FROM ev GROUP BY 1, 2 ORDER BY 1, 2",
    "q_fixed_event_window" -> (s"$cte, r AS (SELECT *, (row_number() OVER (PARTITION BY host ORDER BY time_s, event_id) - 1) // 5 AS batch_id FROM ev) " +
      "SELECT host, batch_id, count(*) AS n_events, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_metric, max(time_s) AS last_time FROM r GROUP BY host, batch_id ORDER BY host, batch_id"),
    "q_moving_event_window" -> (s"$cte SELECT event_id, CAST(SUM(CAST(metric AS DECIMAL(18,6))) OVER w AS DOUBLE) AS moving_sum, count(*) OVER w AS moving_n FROM ev " +
      "WINDOW w AS (PARTITION BY host ORDER BY time_s, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "q_moving_time_window" -> (s"$cte SELECT event_id, CAST(SUM(CAST(metric AS DECIMAL(18,6))) OVER w AS DOUBLE) AS window_sum, count(*) OVER w AS window_n FROM ev " +
      "WINDOW w AS (PARTITION BY host ORDER BY time_s RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) ORDER BY event_id"),
    "q_fixed_time_window" -> (s"$cte, t AS (SELECT *, min(time_s) OVER (PARTITION BY host) AS t0 FROM ev) " +
      "SELECT host, (time_s - t0) // 7200 AS window_id, count(*) AS n_events, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_metric, min(time_s) AS window_min_time " +
      "FROM t GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_rate" -> s"$cte SELECT service, time_s - time_s % 3600 AS window_start, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / CAST(3600 AS DOUBLE) AS rate FROM ev GROUP BY 1, 2 ORDER BY 1, 2",
    // mirrors Windows.rateExpiring: observed buckets + zero-fill while
    // the carried ttl decays, fill ends at min(next bucket, ttl lapse);
    // DuckDB least() skips NULLs exactly like Spark's
    "q_rate_expiring" -> (s"$cte, obs AS (SELECT service, time_s - time_s % 60 AS window_start, " +
      "CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_metric, " +
      "arg_max(ttl, time_s * 10000000 + event_id) AS carry_ttl FROM ev GROUP BY 1, 2), " +
      "wn AS (SELECT *, lead(window_start) OVER (PARTITION BY service ORDER BY window_start) AS next_ws FROM obs), " +
      "fills AS (SELECT service, window_start AS ows, carry_ttl, unnest(generate_series(window_start + 60, " +
      "least(coalesce(next_ws - 60, window_start + (CAST(ceil(carry_ttl / CAST(60 AS DOUBLE)) AS BIGINT) - 1) * 60), " +
      "coalesce(window_start + (CAST(ceil(carry_ttl / CAST(60 AS DOUBLE)) AS BIGINT) - 1) * 60, next_ws - 60)), 60)) AS window_start FROM wn), " +
      "un AS (SELECT service, window_start, sum_metric / CAST(60 AS DOUBLE) AS rate, carry_ttl AS ttl FROM obs " +
      "UNION ALL SELECT service, window_start, CAST(0 AS DOUBLE) AS rate, carry_ttl - (window_start - ows) AS ttl FROM fills) " +
      "SELECT service, window_start, rate, ttl, window_start + 60 AS time_s FROM un ORDER BY service, time_s"),
    "q_percentiles" -> (s"$cte, b AS (SELECT service, time_s - time_s % 86400 AS window_start, list(metric ORDER BY metric) AS ms FROM ev GROUP BY 1, 2), " +
      "p AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS point) " +
      "SELECT service || ' ' || CAST(point AS VARCHAR) AS service_pt, window_start, point, ms[CAST(LEAST(FLOOR(point * len(ms)), len(ms) - 1) AS INT) + 1] AS metric " +
      "FROM b, p ORDER BY service_pt, window_start"),
    "q_instrument" -> (s"$cte, e2 AS (SELECT service, time_s, CAST(floor(metric * CAST(1000000 AS DOUBLE)) AS BIGINT) AS latns FROM ev WHERE metric IS NOT NULL), " +
      "b AS (SELECT service, time_s - time_s % 86400 AS window_start, count(*) AS n, list(latns ORDER BY latns) AS ls FROM e2 GROUP BY 1, 2), " +
      "q AS (SELECT unnest([CAST(0.0 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE), CAST(0.99 AS DOUBLE), CAST(0.999 AS DOUBLE)]) AS q), " +
      "r AS (SELECT 'riemann ' || service || ' rate' AS service_out, window_start, n / CAST(86400 AS DOUBLE) AS metric FROM b), " +
      "l AS (SELECT 'riemann ' || service || ' latency ' || CAST(q AS VARCHAR) AS service_out, window_start, " +
      "ls[CAST(LEAST(FLOOR(q * len(ls)), len(ls) - 1) AS INT) + 1] * CAST(0.000001 AS DOUBLE) AS metric FROM b, q) " +
      "SELECT * FROM r UNION ALL SELECT * FROM l ORDER BY service_out, window_start"),
    "q_apdex" -> (s"$cte SELECT service, time_s - time_s % 86400 AS window_start, " +
      "(CAST(SUM(CASE WHEN metric <= 50 THEN 1 ELSE 0 END) AS BIGINT) + CAST(SUM(CASE WHEN metric > 50 AND metric <= 150 THEN 1 ELSE 0 END) AS BIGINT) / CAST(2.0 AS DOUBLE)) / count(*) AS apdex " +
      "FROM ev WHERE NOT coalesce(state = 'expired', false) GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_ddt" -> (s"$cte, l AS (SELECT event_id, time_s, metric, lag(metric) OVER w AS prev_metric, lag(time_s) OVER w AS prev_time FROM ev " +
      "WINDOW w AS (PARTITION BY host ORDER BY time_s, event_id)) " +
      "SELECT event_id, (metric - prev_metric) / (time_s - prev_time) AS ddt FROM l WHERE prev_time IS NOT NULL AND time_s <> prev_time ORDER BY event_id"),
    "q_counter" -> (s"$cte, seg AS (SELECT *, SUM(CASE WHEN list_contains(tags, 'big') THEN 1 ELSE 0 END) OVER (PARTITION BY host ORDER BY time_s, event_id ROWS UNBOUNDED PRECEDING) AS segment FROM ev) " +
      "SELECT event_id, CAST(COALESCE(SUM(CAST(metric AS DECIMAL(18,6))) OVER (PARTITION BY host, segment ORDER BY time_s, event_id ROWS UNBOUNDED PRECEDING), 0) AS DOUBLE) AS running_sum FROM seg ORDER BY event_id"),
    "q_sum_over_time" -> (s"$cte SELECT event_id, CAST(SUM(CAST(metric AS DECIMAL(18,6))) OVER (PARTITION BY host ORDER BY time_s, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum FROM ev WHERE metric IS NOT NULL ORDER BY event_id"),
    "q_mean_over_time" -> (s"$cte SELECT event_id, CAST(SUM(CAST(metric AS DECIMAL(18,6))) OVER (PARTITION BY host ORDER BY time_s, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) / (count(*) OVER (PARTITION BY host ORDER BY time_s, event_id ROWS UNBOUNDED PRECEDING)) AS running_mean FROM ev WHERE metric IS NOT NULL ORDER BY event_id"),
    "q_ewma_timeless" -> (s"$cte, o AS (SELECT host, metric, row_number() OVER (PARTITION BY host ORDER BY time_s, event_id) AS idx, count(*) OVER (PARTITION BY host) AS n FROM ev WHERE metric IS NOT NULL) " +
      "SELECT host, round(CAST(SUM(CAST(CAST(0.3 AS DOUBLE) * pow(CAST(0.7 AS DOUBLE), n - idx) * metric AS DECIMAL(38,18))) AS DOUBLE), 4) AS ewma FROM o GROUP BY host ORDER BY host"),
    "q_ewma" -> {
      // embed the exact Scala-computed decay constants; Double.toString
      // round-trips, so DuckDB parses the identical double
      val r = math.pow(2.0, -1.0 / 3600.0)
      s"$cte, o AS (SELECT host, metric, time_s, max(time_s) OVER (PARTITION BY host) AS t_max FROM ev WHERE metric IS NOT NULL) " +
        s"SELECT host, round(CAST(SUM(CAST(CAST(${1 - r} AS DOUBLE) * metric * pow(CAST($r AS DOUBLE), t_max - time_s) AS DECIMAL(38,18))) AS DOUBLE), 4) AS ewma FROM o GROUP BY host ORDER BY host"
    },
    "q_top_k" -> s"$cte SELECT host, service, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS total_metric FROM ev GROUP BY 1, 2 ORDER BY total_metric DESC, host, service LIMIT 5",
    "q_throttle" -> (s"$cte, r AS (SELECT *, row_number() OVER (PARTITION BY host, time_s - time_s % 3600 ORDER BY time_s, event_id) AS rnk FROM ev) " +
      "SELECT event_id FROM r WHERE rnk <= 2 ORDER BY event_id"),
    "q_rollup" -> (s"$cte, r AS (SELECT *, time_s - time_s % 3600 AS window_start, row_number() OVER (PARTITION BY service, time_s - time_s % 3600 ORDER BY time_s, event_id) AS rnk FROM ev) " +
      "SELECT service, window_start, CAST(SUM(CASE WHEN rnk <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS passed, CAST(SUM(CASE WHEN rnk > 2 THEN 1 ELSE 0 END) AS BIGINT) AS rolled, " +
      "COALESCE(array_to_string(list_transform(list(metric ORDER BY time_s, event_id) FILTER (WHERE rnk > 2), x -> CAST(CAST(FLOOR(x * CAST(1e6 AS DOUBLE)) AS BIGINT) AS VARCHAR)), ','), '') AS rolled_metrics FROM r GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_ddt_real" -> (s"$cte, r AS (SELECT host, time_s - time_s % 3600 AS window_start, metric, row_number() OVER (PARTITION BY host, time_s - time_s % 3600 ORDER BY time_s DESC, event_id DESC) AS rn FROM ev), " +
      "s AS (SELECT host, window_start, metric AS sample FROM r WHERE rn = 1), " +
      "l AS (SELECT host, window_start, sample, lag(sample) OVER w AS prev_sample, lag(window_start) OVER w AS prev_start FROM s WINDOW w AS (PARTITION BY host ORDER BY window_start)) " +
      "SELECT host, window_start, sample, (sample - prev_sample) / (window_start - prev_start) AS ddt FROM l WHERE prev_start IS NOT NULL ORDER BY host, window_start"),
    "q_changed" -> (s"$cte, l AS (SELECT event_id, state, lag(state) OVER (PARTITION BY host ORDER BY time_s, event_id) AS prev_value FROM ev) " +
      "SELECT event_id, state, prev_value FROM l WHERE state IS DISTINCT FROM prev_value ORDER BY event_id"),
    "q_runs" -> (s"$cte, c AS (SELECT *, CASE WHEN state IS NOT DISTINCT FROM lag(state) OVER (PARTITION BY host ORDER BY time_s, event_id) THEN 0 ELSE 1 END AS chg FROM ev), " +
      "g AS (SELECT *, SUM(chg) OVER (PARTITION BY host ORDER BY time_s, event_id ROWS UNBOUNDED PRECEDING) AS segment FROM c), " +
      "rl AS (SELECT *, row_number() OVER (PARTITION BY host, segment ORDER BY time_s, event_id) AS run_len FROM g) " +
      "SELECT event_id FROM rl WHERE run_len >= 2 ORDER BY event_id"),
    "q_stable" -> (s"$cte, c AS (SELECT *, CASE WHEN state IS NOT DISTINCT FROM lag(state) OVER (PARTITION BY host ORDER BY time_s, event_id) THEN 0 ELSE 1 END AS chg FROM ev), " +
      "g AS (SELECT *, SUM(chg) OVER (PARTITION BY host ORDER BY time_s, event_id ROWS UNBOUNDED PRECEDING) AS segment FROM c), " +
      "ss AS (SELECT *, min(time_s) OVER (PARTITION BY host, segment) AS segment_start, max(time_s) OVER (PARTITION BY host, segment) AS segment_last FROM g) " +
      "SELECT event_id FROM ss WHERE segment_last - segment_start >= 7200 ORDER BY event_id"),
    "q_predict_linear" -> (s"$cte, x AS (SELECT host, metric, time_s, CAST(time_s - min(time_s) OVER (PARTITION BY host) AS DECIMAL(38,6)) AS xv FROM ev WHERE metric IS NOT NULL), " +
      "m AS (SELECT host, CAST(count(*) AS DOUBLE) AS n, CAST(SUM(xv) AS DOUBLE) AS sx, CAST(SUM(CAST(metric AS DECIMAL(38,6))) AS DOUBLE) AS sy, CAST(SUM(xv * CAST(metric AS DECIMAL(38,6))) AS DOUBLE) AS sxy, CAST(SUM(xv * xv) AS DOUBLE) AS sxx, max(time_s) AS last_time, CAST(max(xv) AS DOUBLE) AS x_last FROM x GROUP BY host), " +
      "sl AS (SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM m) " +
      "SELECT host, last_time, round((sy - slope * sx) / n + slope * (x_last + 3600), 4) AS predicted FROM sl ORDER BY host"),
    "q_clock_skew" -> (s"$cte, latest AS (SELECT host, max(time_s) AS host_time FROM ev GROUP BY host), " +
      "med AS (SELECT quantile_cont(host_time, 0.5) AS median_time FROM latest) " +
      "SELECT host, host_time, round(host_time - median_time, 1) AS skew_s FROM latest, med ORDER BY host"),
    "q_fold_interval" -> (s"$cte SELECT service, time_s - time_s % 86400 AS window_start, " +
      "CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_m, " +
      "CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / count(metric) AS mean_m, " +
      "min(metric) AS min_m, max(metric) AS max_m, " +
      "sqrt(CAST(SUM(CAST(metric AS DECIMAL(18,6)) * CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(metric) AS DOUBLE) - (CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(metric) AS DOUBLE)) * (CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(metric) AS DOUBLE))) AS sd_m, " +
      "count(*) AS n FROM ev GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_batch" -> (s"$cte, r AS (SELECT *, time_s - time_s % 3600 AS window_start, (row_number() OVER (PARTITION BY host, time_s - time_s % 3600 ORDER BY time_s, event_id) - 1) // 3 AS batch_seq FROM ev) " +
      "SELECT host, window_start, batch_seq, count(*) AS n_events, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_metric, max(time_s) AS flush_time FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    "q_fill_in" -> (s"$cte, obs AS (SELECT service, time_s - time_s % 3600 AS window_start, count(*) AS n_events, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_metric FROM ev GROUP BY 1, 2), " +
      "spans AS (SELECT service, min(window_start) AS w0, max(window_start) AS w1 FROM obs GROUP BY service), " +
      "al AS (SELECT service, unnest(generate_series(w0, w1, 3600)) AS window_start FROM spans) " +
      "SELECT al.service, al.window_start, coalesce(obs.n_events, 0) AS n_events, CASE WHEN coalesce(obs.n_events, 0) > 0 THEN obs.sum_metric ELSE CAST(0 AS DOUBLE) END AS sum_metric FROM al LEFT JOIN obs ON al.service = obs.service AND al.window_start = obs.window_start ORDER BY 1, 2"),
    "q_fill_in_last" -> (s"$cte, obs AS (SELECT service, time_s - time_s % 3600 AS window_start, count(*) AS n_events, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_metric FROM ev GROUP BY 1, 2), " +
      "spans AS (SELECT service, min(window_start) AS w0, max(window_start) AS w1 FROM obs GROUP BY service), " +
      "al AS (SELECT service, unnest(generate_series(w0, w1, 3600)) AS window_start FROM spans), " +
      "j AS (SELECT al.service, al.window_start, coalesce(obs.n_events, 0) AS n_events, CASE WHEN coalesce(obs.n_events, 0) > 0 THEN obs.sum_metric ELSE CAST(0 AS DOUBLE) END AS sum_metric FROM al LEFT JOIN obs ON al.service = obs.service AND al.window_start = obs.window_start) " +
      "SELECT service, window_start, n_events, CASE WHEN n_events > 0 THEN sum_metric ELSE last_value(CASE WHEN n_events > 0 THEN sum_metric END IGNORE NULLS) OVER (PARTITION BY service ORDER BY window_start ROWS UNBOUNDED PRECEDING) END AS sum_metric FROM j ORDER BY 1, 2"),
    "q_interpolate" -> (s"$cte, obs AS (SELECT host, window_start, n_events, obs_metric, obs_state FROM (" +
      "SELECT host, time_s - time_s % 3600 AS window_start, " +
      "count(*) OVER (PARTITION BY host, time_s - time_s % 3600) AS n_events, " +
      "metric AS obs_metric, state AS obs_state, " +
      "row_number() OVER (PARTITION BY host, time_s - time_s % 3600 ORDER BY time_s DESC, event_id DESC) AS rn FROM ev) WHERE rn = 1), " +
      "spans AS (SELECT host, min(window_start) AS w0, max(window_start) AS w1 FROM obs GROUP BY host), " +
      "al AS (SELECT host, unnest(generate_series(w0, w1, 3600)) AS window_start FROM spans), " +
      "j AS (SELECT al.host, al.window_start, obs.n_events, " +
      "last_value(CASE WHEN obs.n_events IS NOT NULL THEN struct_pack(m := obs.obs_metric, st := obs.obs_state) END IGNORE NULLS) " +
      "OVER (PARTITION BY al.host ORDER BY al.window_start ROWS UNBOUNDED PRECEDING) AS carry " +
      "FROM al LEFT JOIN obs ON al.host = obs.host AND al.window_start = obs.window_start) " +
      "SELECT host, window_start, struct_extract(carry, 'm') AS metric, struct_extract(carry, 'st') AS state, coalesce(n_events, 0) AS n_events " +
      "FROM j WHERE n_events IS NOT NULL OR struct_extract(carry, 'st') IS DISTINCT FROM 'expired' ORDER BY 1, 2"),
    // z-score anomalies: the exact-moment fragments from the fold
    // surface (DECIMAL(18,6) sums), identical division trees, rounded
    // z compared to the threshold after rounding on both sides
    "q_zscore_anomaly" -> (s"$cte, zs AS (SELECT service, " +
      "CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / count(metric) AS mu, " +
      "sqrt(CAST(SUM(CAST(metric AS DECIMAL(18,6)) * CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(metric) AS DOUBLE) - (CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(metric) AS DOUBLE)) * (CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(metric) AS DOUBLE))) AS sigma " +
      "FROM ev WHERE metric IS NOT NULL GROUP BY 1), " +
      "zz AS (SELECT e.event_id, e.service, e.metric, round(zs.mu, 4) AS mu, round(zs.sigma, 4) AS sigma, " +
      "round((e.metric - zs.mu) / zs.sigma, 4) AS z " +
      "FROM ev e JOIN zs USING (service) WHERE e.metric IS NOT NULL AND zs.sigma > 0) " +
      "SELECT event_id, service, metric, mu, sigma, z FROM zz " +
      s"WHERE abs(z) >= CAST(2.5 AS DOUBLE) ORDER BY event_id"),
    // as-of join: the same union + running last_value(IGNORE NULLS)
    // pass; right rows reduced per (host, time) to the max-event_id
    // purchase (the lexicographic-struct pick, event_id unique)
    "q_asof_join" -> (s"$cte, ajl AS (SELECT event_id, host, time_s FROM ev WHERE service = 'error'), " +
      "ajr AS (SELECT host, time_s, max(event_id) AS rid FROM ev WHERE service = 'purchase' GROUP BY 1, 2), " +
      "ajr2 AS (SELECT r.host, r.time_s, r.rid, e.metric FROM ajr r JOIN ev e ON e.event_id = r.rid), " +
      "aju AS (SELECT host, time_s, 1 AS side, CAST(NULL AS BIGINT) AS rid, CAST(NULL AS DOUBLE) AS rmetric, event_id FROM ajl " +
      "UNION ALL SELECT host, time_s, 0, rid, metric, NULL FROM ajr2), " +
      "ajw AS (SELECT *, last_value(rid IGNORE NULLS) OVER wdw AS m_id, " +
      "last_value(rmetric IGNORE NULLS) OVER wdw AS m_metric, " +
      "last_value(CASE WHEN side = 0 THEN time_s END IGNORE NULLS) OVER wdw AS m_ts " +
      "FROM aju WINDOW wdw AS (PARTITION BY host ORDER BY time_s, side ROWS UNBOUNDED PRECEDING)) " +
      "SELECT event_id, host, time_s, " +
      "CASE WHEN m_ts IS NOT NULL AND time_s - m_ts <= 21600 THEN m_ts END AS purchase_time_s, " +
      "CASE WHEN m_ts IS NOT NULL AND time_s - m_ts <= 21600 THEN m_id END AS purchase_id, " +
      "CASE WHEN m_ts IS NOT NULL AND time_s - m_ts <= 21600 THEN m_metric END AS purchase_metric " +
      "FROM ajw WHERE side = 1 ORDER BY event_id"),
    // range join: the oracle states the containment predicate directly
    // (DuckDB's IEJoin); the Spark side's bin bucketing must produce
    // exactly this relation
    "q_range_join" -> (s"$cte, rjl AS (SELECT event_id, host, time_s FROM ev WHERE service = 'error'), " +
      "rji AS (SELECT event_id AS interval_id, host, time_s AS start_s, time_s + 900 AS end_s FROM ev WHERE service = 'purchase') " +
      "SELECT l.event_id, l.host, l.time_s, i.interval_id, i.start_s " +
      "FROM rjl l JOIN rji i ON l.host = i.host AND l.time_s >= i.start_s AND l.time_s < i.end_s " +
      "ORDER BY l.event_id, i.interval_id"),
    // sessionization: gaps-and-islands rollup — new session only at
    // gap > 21600: session_window merges TOUCHING windows too (an
    // event at exactly prev + gap extends the session — pinned
    // empirically at sf0.1, host 805), session end = last event + gap
    "q_sessionize" -> (s"$cte, sg AS (SELECT host, time_s, CASE WHEN lag(time_s) OVER wh IS NULL OR time_s - lag(time_s) OVER wh > 21600 THEN 1 ELSE 0 END AS new_s " +
      "FROM ev WINDOW wh AS (PARTITION BY host ORDER BY time_s)), " +
      "si AS (SELECT host, time_s, SUM(new_s) OVER (PARTITION BY host ORDER BY time_s ROWS UNBOUNDED PRECEDING) AS sid FROM sg) " +
      "SELECT host, min(time_s) AS session_start_s, max(time_s) + 21600 AS session_end_s, CAST(count(*) AS BIGINT) AS n_events " +
      "FROM si GROUP BY host, sid ORDER BY host, session_start_s"),
    "q_sreduce" -> (s"$cte SELECT event_id, max(metric) OVER w AS running_max, CAST(SUM(CAST(metric AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_sum FROM ev " +
      "WINDOW w AS (PARTITION BY host ORDER BY time_s, event_id ROWS UNBOUNDED PRECEDING) ORDER BY event_id"),
    "q_fold_difference" -> (s"$cte SELECT host, round(CAST(CAST(first(metric ORDER BY time_s, event_id) AS DECIMAL(28,10)) * 2 - SUM(CAST(metric AS DECIMAL(28,10))) AS DOUBLE), 4) AS difference " +
      "FROM ev WHERE metric IS NOT NULL GROUP BY host ORDER BY host"),
    "q_median" -> (s"$cte, b AS (SELECT service, list(metric ORDER BY metric) AS ms FROM ev WHERE metric IS NOT NULL GROUP BY 1) " +
      "SELECT service, ms[CAST(LEAST(FLOOR(CAST(0.5 AS DOUBLE) * len(ms)), len(ms) - 1) AS INT) + 1] AS median FROM b ORDER BY service"),
    "q_mode" -> (s"$cte, c AS (SELECT service, metric, count(*) AS cnt FROM ev WHERE metric IS NOT NULL GROUP BY 1, 2), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY service ORDER BY cnt DESC, metric ASC) AS rk FROM c) " +
      "SELECT service, metric AS mode, cnt AS mode_count FROM r WHERE rk = 1 ORDER BY service"),
    "q_deps" -> (s"$snapCte, live AS (SELECT * FROM snap WHERE rn = 1 AND NOT (state = 'expired' OR (ttl IS NOT NULL AND 1706620000 - time_s > ttl))) " +
      "SELECT e.event_id, EXISTS(SELECT 1 FROM live l WHERE l.host = e.host AND l.service = 'purchase' AND l.state = 'ok') AS deps_satisfied " +
      "FROM ev e ORDER BY e.event_id"),
    "q_salted_agg" -> s"$cte SELECT service, CAST(SUM(CAST(metric AS DECIMAL(18,6))) AS DOUBLE) AS sum_metric, count(metric) AS n_metric FROM ev GROUP BY service ORDER BY service",
    "q_tpch_pricing" -> ("SELECT l_returnflag, l_linestatus, " +
      "CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price, " +
      "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price, " +
      "CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS avg_qty, " +
      "count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_tpch_regional" -> ("SELECT r.r_name, count(*) AS n_orders, " +
      "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price " +
      "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
      "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
      "JOIN region r ON n.n_regionkey = r.r_regionkey " +
      "GROUP BY r.r_name ORDER BY r.r_name"),
    "q_modes" -> (s"$cte, c AS (SELECT service, metric, count(*) AS cnt FROM ev WHERE metric IS NOT NULL GROUP BY 1, 2), " +
      "m AS (SELECT *, max(cnt) OVER (PARTITION BY service) AS mx FROM c) " +
      "SELECT service, metric AS mode_value, CAST(mx AS BIGINT) AS mode_count FROM m WHERE cnt = mx ORDER BY service, mode_value"),
    "q_fold_product" -> (s"$foldCte SELECT host, batch_id, " +
      "CASE WHEN len(list_filter(ms, x -> x = 0)) > 0 THEN CAST(0.0 AS DOUBLE) " +
      "ELSE round(list_aggregate(ms, 'product'), 4) END AS product_m " +
      "FROM g ORDER BY host, batch_id"),
    "q_fold_quotient" -> (s"$foldCte, q AS (SELECT host, batch_id, ms[1] AS fv, " +
      "len(list_filter(ms[2:], x -> x = 0)) AS rz, len(list_filter(ms[2:], x -> x < 0)) AS rnn, " +
      "COALESCE(list_aggregate(ms[2:], 'product'), CAST(1.0 AS DOUBLE)) AS rp FROM g) " +
      "SELECT host, batch_id, " +
      "CASE WHEN rz > 0 AND fv = 0 THEN 'nan' WHEN rz > 0 THEN (CASE WHEN (fv < 0) <> (rnn % 2 = 1) THEN '-inf' ELSE 'inf' END) ELSE 'finite' END AS q_class, " +
      "CASE WHEN rz > 0 THEN NULL WHEN fv = 0 THEN CAST(0.0 AS DOUBLE) ELSE round(fv / rp, 6) END AS quotient " +
      "FROM q ORDER BY host, batch_id"),
    "q_fold_quotient_sloppy" -> (s"$foldCte SELECT host, batch_id, " +
      "CASE WHEN len(list_filter(ms, x -> x = 0)) > 0 THEN CAST(0.0 AS DOUBLE) " +
      "ELSE round(ms[1] / COALESCE(list_aggregate(ms[2:], 'product'), CAST(1.0 AS DOUBLE)), 6) END AS quotient_sloppy " +
      "FROM g ORDER BY host, batch_id"),
    "q_media_features" -> ("SELECT doc_id AS media_id, " +
      "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality, " +
      "CAST(length(text) AS BIGINT) AS n_bytes, " +
      "CAST(COALESCE(list_sum(list_transform(generate_series(1, length(text)), i -> CAST(unicode(text[i]) AS BIGINT) * i)), 0) AS BIGINT) AS checksum " +
      "FROM documents ORDER BY media_id"),
    "q_media_decode" -> ("SELECT doc_id AS media_id, " +
      "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'bmp' END AS format, " +
      "CAST((n_chars % 64) + 1 AS INT) AS width, " +
      "CAST((n_chars % 48) + 1 AS INT) AS height, " +
      "CAST(3 AS INT) AS channels, TRUE AS ok " +
      "FROM documents ORDER BY media_id"),
    "q_media_audio" -> ("SELECT doc_id AS media_id, " +
      "CASE WHEN doc_id % 2 = 0 THEN 'wave' ELSE 'aiff' END AS format, " +
      "CAST(8000 + (n_chars % 4) * 4000 AS INT) AS sample_rate, " +
      "CAST(1 + (n_chars % 2) AS INT) AS channels, " +
      "CAST((n_chars % 500) + 100 AS BIGINT) AS frames, " +
      "((n_chars % 500) + 100) * 1000 // (8000 + (n_chars % 4) * 4000) AS duration_ms, " +
      "TRUE AS ok FROM documents ORDER BY media_id"),
    "q_media_frames_decode" -> ("SELECT doc_id AS media_id, " +
      "CAST(0 AS INT) AS stream, " +
      "unnest(generate_series(0, (n_chars % 4) + 1)) AS frame_idx, " +
      "CASE WHEN doc_id % 2 = 0 THEN 'mjpeg' ELSE 'dib' END AS codec, " +
      "CAST((n_chars % 32) + 8 AS INT) AS width, " +
      "CAST((n_chars % 24) + 8 AS INT) AS height, " +
      "TRUE AS ok FROM documents ORDER BY media_id, frame_idx"),
    "q_media_gif_frames" -> ("SELECT doc_id AS media_id, " +
      "unnest(generate_series(0, (n_chars % 3) + 1)) AS frame_idx, " +
      "'gif' AS codec, " +
      "CAST((n_chars % 24) + 4 AS INT) AS width, " +
      "CAST((n_chars % 16) + 4 AS INT) AS height, " +
      "TRUE AS ok FROM documents ORDER BY media_id, frame_idx"),
    "q_media_frames_sampled" -> ("SELECT * FROM (SELECT doc_id AS media_id, " +
      "CAST(0 AS INT) AS stream, " +
      "unnest(generate_series(0, (n_chars % 4) + 1)) AS frame_idx, " +
      "CASE WHEN doc_id % 2 = 0 THEN 'mjpeg' ELSE 'dib' END AS codec, " +
      "CAST((n_chars % 32) + 8 AS INT) AS width, " +
      "CAST((n_chars % 24) + 8 AS INT) AS height, " +
      "TRUE AS ok FROM documents) WHERE frame_idx % 2 = 0 " +
      "ORDER BY media_id, frame_idx"),
    "q_media_video" -> ("SELECT doc_id AS media_id, 'mp4' AS format, " +
      "CAST((n_chars % 1280) + 16 AS INT) AS width, " +
      "CAST((n_chars % 720) + 16 AS INT) AS height, " +
      "CAST((n_chars % 900) + 100 AS BIGINT) AS duration_ms, " +
      "CAST(1 + (doc_id % 2) AS INT) AS n_tracks, " +
      "TRUE AS ok FROM documents ORDER BY media_id"),
    "q_dedup_exact" -> "SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS n_dups FROM documents GROUP BY 1 ORDER BY 1",
    "q_minhash_sig" -> (s"$shCte$hsCte SELECT doc_id, array_to_string(list_transform(" +
      s"${minhashSigSql(8)}, h -> CAST(h AS VARCHAR)), ',') AS sig FROM hh ORDER BY doc_id"),
    "q_minhash_pairs" -> s"$minhashPairsCte SELECT doc_a, doc_b, est_jaccard FROM pairs WHERE est_jaccard >= 0.5 ORDER BY doc_a, doc_b",
    "q_dedup_clusters" -> (minhashPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      ", fp AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= 0.5), " +
      "edges AS (SELECT doc_a AS src, doc_b AS dst FROM fp UNION SELECT doc_b, doc_a FROM fp), " +
      "r(doc, comp) AS (SELECT src, src FROM edges UNION SELECT e.dst, r.comp FROM r JOIN edges e ON e.src = r.doc) " +
      "SELECT doc AS doc_id, min(comp) AS component FROM r GROUP BY doc ORDER BY doc_id"),
    "q_deduped_corpus" -> (minhashPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      ", fp AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= 0.5), " +
      "edges AS (SELECT doc_a AS src, doc_b AS dst FROM fp UNION SELECT doc_b, doc_a FROM fp), " +
      "r(doc, comp) AS (SELECT src, src FROM edges UNION SELECT e.dst, r.comp FROM r JOIN edges e ON e.src = r.doc), " +
      "cmp AS (SELECT doc AS doc_id, min(comp) AS component FROM r GROUP BY doc), " +
      "dropids AS (SELECT doc_id FROM cmp WHERE doc_id <> component) " +
      "SELECT d.doc_id, d.lang, d.n_chars FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM dropids) ORDER BY d.doc_id"),
    "q_ngram_jaccard" -> (s"$shCte$hsCte, sg AS (SELECT doc_id, ${minhashSigSql(16)} AS sig FROM hh), " +
      "banded AS (SELECT doc_id, sig, unnest(generate_series(0, 7)) AS band FROM sg), " +
      "bk0 AS (SELECT doc_id, band, md5(array_to_string(list_transform(sig[band*2+1:band*2+2], x -> CAST(x AS VARCHAR)), ',')) AS bucket FROM banded), " +
      s"okb AS (SELECT band, bucket FROM bk0 GROUP BY band, bucket HAVING count(*) <= ${pipeline.Caps.DefaultMaxBucket}), " +
      "bk AS (SELECT bk0.* FROM bk0 JOIN okb USING (band, bucket)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id), " +
      "jj AS (SELECT doc_a, doc_b, CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard " +
      "FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id JOIN sh sb ON cand.doc_b = sb.doc_id) " +
      "SELECT doc_a, doc_b, jaccard FROM jj WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b"),
    "q_simhash" -> simhashSql,
    "q_simhash_pairs" -> simhashPairsSql,
    "q_frames" -> ("SELECT doc_id AS media_id, unnest(generate_series(0, n_chars * 10, 500)) AS frame_ts " +
      "FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id, frame_ts"),
    "q_embedding_neardups" ->
      s"$unitCte, $embNearDupChain SELECT vec_a, vec_b, cosine FROM j WHERE cosine >= 0.4 ORDER BY vec_a, vec_b",
    // SemDeDup: components over the embedding near-dup pairs, keep the
    // min vec_id per component (the same recursive-CTE machinery as
    // q_dedup_clusters)
    "q_semantic_dedup" ->
      (s"$unitCte, $embNearDupChain, ".replaceFirst("WITH ", "WITH RECURSIVE ") +
        "fp AS (SELECT vec_a, vec_b FROM j WHERE cosine >= 0.4), " +
        "edges AS (SELECT vec_a AS src, vec_b AS dst FROM fp UNION SELECT vec_b, vec_a FROM fp), " +
        "r(v, comp) AS (SELECT src, src FROM edges UNION SELECT e.dst, r.comp FROM r JOIN edges e ON e.src = r.v), " +
        "cmp AS (SELECT v AS vec_id, min(comp) AS component FROM r GROUP BY v), " +
        "dropids AS (SELECT vec_id FROM cmp WHERE vec_id <> component) " +
        "SELECT e.vec_id, e.label FROM embeddings e WHERE e.vec_id NOT IN (SELECT vec_id FROM dropids) ORDER BY e.vec_id"),
    "q_ann_brute" -> (s"$unitCte, q AS (SELECT vec_id AS query_id, unit AS qunit FROM u WHERE vec_id IN (0,1,2,3,4)), " +
      "scored AS (SELECT query_id, vec_id, round(CAST(list_sum(list_transform(list_zip(unit, qunit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine FROM u, q WHERE vec_id <> query_id), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM scored) " +
      "SELECT query_id, vec_id, cosine, rk FROM rk WHERE rk <= 10 ORDER BY query_id, rk"),
    "q_lsh_buckets" -> s"$unitCte SELECT vec_id, label, ${bucketSql(8)} AS bucket FROM u ORDER BY vec_id",
    "q_ann_lsh" -> (s"$unitCte, bk AS (SELECT vec_id, unit, ${bucketSql(8)} AS bucket FROM u), " +
      "scored AS (SELECT a.vec_id AS query_id, b.vec_id AS vec_id, round(CAST(list_sum(list_transform(list_zip(a.unit, b.unit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine " +
      "FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM scored) " +
      "SELECT query_id, vec_id, cosine, rk FROM rk WHERE rk <= 5 ORDER BY query_id, rk"),
    "q_ann_ivf" -> s"$unitCte, $ivfChain SELECT query_id, vec_id, cosine, rk FROM ivf_rk WHERE rk <= 10 ORDER BY query_id, rk",
    "q_ann_pq" -> s"$unitCte, $pqChain SELECT query_id, vec_id, adc, rk FROM pq_rk WHERE rk <= 10 ORDER BY query_id, rk",
    "q_ann_ivfpq" -> s"$unitCte, $ivfChain, $ivfPqChain SELECT query_id, vec_id, adc, rk FROM ivfpq_rk WHERE rk <= 10 ORDER BY query_id, rk",
    "q_ann_ivfpq_rerank" -> (s"$unitCte, $ivfChain, $ivfPqChain, " +
      "isl AS (SELECT query_id, vec_id, adc FROM ivfpq_rk WHERE rk <= 25), " +
      "iex AS (SELECT isl.query_id, isl.vec_id, isl.adc, round(CAST(list_sum(list_transform(list_zip(uq.unit, uv.unit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine " +
      "FROM isl JOIN u uq ON isl.query_id = uq.vec_id JOIN u uv ON isl.vec_id = uv.vec_id), " +
      "irr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM iex) " +
      "SELECT query_id, vec_id, adc, cosine, rk FROM irr WHERE rk <= 10 ORDER BY query_id, rk"),
    // one unrolled Lloyd round on the IVF coarse quantizer: re-mean
    // each cell over asg's members (decimal-exact), empty cells hold
    // their seed centroid, then re-assign the corpus
    "q_ivf_kmeans" -> (s"$unitCte, $ivfChain, " +
      "ircc AS (SELECT asg.cell, d.dim, CAST(SUM(CAST(list_extract(asg.unit, d.dim+1) AS DECIMAL(38,18))) AS DOUBLE)/count(*) AS c FROM asg, (SELECT unnest(generate_series(0, 63)) AS dim) d GROUP BY 1, 2), " +
      "irc0 AS (SELECT cell AS label, list(c ORDER BY dim) AS cvec FROM ircc GROUP BY 1), " +
      "ircent AS (SELECT c.label, COALESCE(r.cvec, c.cvec) AS cvec FROM cent c LEFT JOIN irc0 r ON c.label = r.label), " +
      "iras0 AS (SELECT u.vec_id, c.label, list_sum(list_transform(list_zip(u.unit, c.cvec), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS score FROM u CROSS JOIN ircent c), " +
      "iras AS (SELECT vec_id, label AS cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, label) AS rn FROM iras0) WHERE rn = 1) " +
      "SELECT vec_id, cell FROM iras ORDER BY vec_id"),
    "q_ann_pq_rerank" -> (s"$unitCte, $pqChain, " +
      "sl AS (SELECT query_id, vec_id, adc FROM pq_rk WHERE rk <= 50), " +
      "ex AS (SELECT sl.query_id, sl.vec_id, sl.adc, round(CAST(list_sum(list_transform(list_zip(uq.unit, uv.unit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine " +
      "FROM sl JOIN u uq ON sl.query_id = uq.vec_id JOIN u uv ON sl.vec_id = uv.vec_id), " +
      "rr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM ex) " +
      "SELECT query_id, vec_id, adc, cosine, rk FROM rr WHERE rk <= 10 ORDER BY query_id, rk"),
    "q_pq_codes" -> (s"$unitCte, $pqChain SELECT vec_id, " +
      "array_to_string(list(code ORDER BY sub), ',') AS codes " +
      "FROM pen GROUP BY vec_id ORDER BY vec_id"),
    "q_pq_kmeans" -> (s"$unitCte, $pqChain, $pqRefChain SELECT vec_id, " +
      "array_to_string(list(code ORDER BY sub), ',') AS codes " +
      "FROM ren GROUP BY vec_id ORDER BY vec_id"),
    "q_ann_recall" -> (s"$unitCte, $ivfChain, $pqChain, $ivfPqChain, " +
      "br0 AS (SELECT q.query_id, u.vec_id, round(CAST(list_sum(list_transform(list_zip(u.unit, q.qunit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine FROM u, q WHERE u.vec_id <> q.query_id), " +
      "br AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM br0) WHERE rk <= 10), " +
      s"lbk AS (SELECT vec_id, unit, ${bucketSql(8)} AS bucket FROM u), " +
      "l0 AS (SELECT a.vec_id AS query_id, b.vec_id AS vec_id, round(CAST(list_sum(list_transform(list_zip(a.unit, b.unit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine FROM lbk a JOIN lbk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id WHERE a.vec_id IN (0,1,2,3,4)), " +
      "lsh AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM l0) WHERE rk <= 10), " +
      {
        val bnd = (0 until 4).map(b =>
          s"SELECT vec_id, $b AS band, ${bucketSql(6, "dv", b * 6)} AS bucket FROM u")
          .mkString(" UNION ALL ")
        s"bnd AS ($bnd), " +
          "c0 AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS vec_id FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id <> b.vec_id WHERE a.vec_id IN (0,1,2,3,4)), " +
          "b0 AS (SELECT c.query_id, c.vec_id, round(CAST(list_sum(list_transform(list_zip(uq.unit, uv.unit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) AS cosine FROM c0 c JOIN u uq ON c.query_id = uq.vec_id JOIN u uv ON c.vec_id = uv.vec_id), " +
          "blsh AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk FROM b0) WHERE rk <= 10), "
      } +
      "ivf AS (SELECT query_id, vec_id FROM ivf_rk WHERE rk <= 10), " +
      "pqt AS (SELECT query_id, vec_id FROM pq_rk WHERE rk <= 10), " +
      "ipqt AS (SELECT query_id, vec_id FROM ivfpq_rk WHERE rk <= 10), " +
      "rec AS (SELECT br.query_id, count(*) AS k, CAST(SUM(CASE WHEN lsh.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lsh_hits, CAST(SUM(CASE WHEN blsh.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS blsh_hits, CAST(SUM(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ivf_hits, CAST(SUM(CASE WHEN pqt.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS pq_hits, CAST(SUM(CASE WHEN ipqt.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ivfpq_hits " +
      "FROM br LEFT JOIN lsh ON br.query_id = lsh.query_id AND br.vec_id = lsh.vec_id LEFT JOIN blsh ON br.query_id = blsh.query_id AND br.vec_id = blsh.vec_id LEFT JOIN ivf ON br.query_id = ivf.query_id AND br.vec_id = ivf.vec_id LEFT JOIN pqt ON br.query_id = pqt.query_id AND br.vec_id = pqt.vec_id LEFT JOIN ipqt ON br.query_id = ipqt.query_id AND br.vec_id = ipqt.vec_id GROUP BY br.query_id) " +
      "SELECT query_id, k, lsh_hits, blsh_hits, ivf_hits, pq_hits, ivfpq_hits, round(CAST(lsh_hits AS DOUBLE)/k, 6) AS lsh_recall, round(CAST(blsh_hits AS DOUBLE)/k, 6) AS blsh_recall, round(CAST(ivf_hits AS DOUBLE)/k, 6) AS ivf_recall, round(CAST(pq_hits AS DOUBLE)/k, 6) AS pq_recall, round(CAST(ivfpq_hits AS DOUBLE)/k, 6) AS ivfpq_recall FROM rec ORDER BY query_id"),
    "q_quantize" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv FROM embeddings), " +
      "m AS (SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) AS scale FROM e) " +
      "SELECT vec_id, round(scale, 6) AS scale, " +
      "CASE WHEN scale = 0 THEN array_to_string(list_transform(dv, x -> '0'), ',') " +
      "ELSE array_to_string(list_transform(dv, x -> CAST(CAST(FLOOR(x / scale * CAST(127 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS VARCHAR)), ',') END AS qvec " +
      "FROM m ORDER BY vec_id"),
    "q_quant_error" -> ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv FROM embeddings), " +
      "m AS (SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) AS scale FROM e), " +
      "q AS (SELECT vec_id, dv, scale, CASE WHEN scale = 0 THEN list_transform(dv, x -> CAST(0 AS BIGINT)) " +
      "ELSE list_transform(dv, x -> CAST(FLOOR(x / scale * CAST(127 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) END AS qvec FROM m) " +
      "SELECT vec_id, round(scale, 6) AS scale, " +
      "round(list_sum(list_transform(list_zip(dv, qvec), z -> abs(z[1] - CAST(z[2] AS DOUBLE) / CAST(127 AS DOUBLE) * scale))) / len(dv), 6) AS mean_abs_err " +
      "FROM q ORDER BY vec_id"),
    "q_rand_proj" -> (s"$unitCte${rpCte(16)} SELECT vec_id, label, " +
      (0 until 16).map(j => s"round(rp16[${j + 1}], 6) AS rp$j")
        .mkString(", ") +
      " FROM rp ORDER BY vec_id"),
    "q_rp_distortion" -> (s"$unitCte${rpCte(16)}, " +
      "sp AS (SELECT vec_id, unit, rp16 AS rp FROM rp WHERE vec_id IN (0,1,2,3,4,5,6,7,8,9)), " +
      "pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
      "round(2.0 - 2.0*(CAST(list_sum(list_transform(list_zip(a.unit, b.unit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16), 6) AS d2_orig, " +
      "round(CAST(list_sum(list_transform(list_zip(a.rp, b.rp), z -> CAST(FLOOR((z[1]-z[2])*(z[1]-z[2])*1e12) AS BIGINT))) AS DOUBLE)/1e12, 6) AS d2_proj " +
      "FROM sp a JOIN sp b ON a.vec_id < b.vec_id) " +
      "SELECT vec_a, vec_b, d2_orig, d2_proj, " +
      "CASE WHEN d2_orig = 0 THEN NULL ELSE round(d2_proj / d2_orig, 6) END AS ratio " +
      "FROM pr ORDER BY vec_a, vec_b"),
    "q_rp_recall" -> (s"$unitCte${rpCte(16, 32)}, " +
      "q AS (SELECT vec_id AS query_id, unit AS qunit, rp16 AS qrp16, rp32 AS qrp32 FROM rp WHERE vec_id IN (0,1,2,3,4)), " +
      "j AS (SELECT query_id, vec_id, unit, rp16, rp32, qunit, qrp16, qrp32 FROM rp, q WHERE vec_id <> query_id), " +
      "ex AS (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY round(CAST(list_sum(list_transform(list_zip(unit, qunit), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) DESC, vec_id) AS rk FROM j), " +
      "ap16 AS (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY round(CAST(list_sum(list_transform(list_zip(rp16, qrp16), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) DESC, vec_id) AS rk FROM j), " +
      "ap32 AS (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY round(CAST(list_sum(list_transform(list_zip(rp32, qrp32), z -> CAST(FLOOR(z[1]*z[2]*1e16) AS BIGINT))) AS DOUBLE)/1e16, 6) DESC, vec_id) AS rk FROM j) " +
      "SELECT e.query_id, round(CAST(count(a16.query_id) AS DOUBLE) / count(*), 6) AS rp16_recall, " +
      "round(CAST(count(a32.query_id) AS DOUBLE) / count(*), 6) AS rp32_recall " +
      "FROM (SELECT query_id, vec_id FROM ex WHERE rk <= 10) e " +
      "LEFT JOIN (SELECT query_id, vec_id FROM ap16 WHERE rk <= 10) a16 " +
      "ON e.query_id = a16.query_id AND e.vec_id = a16.vec_id " +
      "LEFT JOIN (SELECT query_id, vec_id FROM ap32 WHERE rk <= 10) a32 " +
      "ON e.query_id = a32.query_id AND e.vec_id = a32.vec_id " +
      "GROUP BY e.query_id ORDER BY e.query_id"),
    "q_graphite_decode" -> s"$cte SELECT event_id, service, metric, time_s, host FROM ev ORDER BY event_id",
    "q_protobuf_roundtrip" -> (EventView.oracleCteWith(
      "json_extract_string(props, '$.k') AS attr_k") +
      " SELECT event_id, host, service, state, metric, COALESCE(array_to_string(tags, ','), '') AS tags, time_s, ttl, attr_k " +
      "FROM ev ORDER BY event_id"),
    "q_opentsdb_decode" -> (s"$cte SELECT event_id, service AS metric_name, " +
      "service || ' idx=' || CAST(event_id AS VARCHAR) AS service, metric, time_s, host FROM ev ORDER BY event_id"),
    "q_label_centroids" -> (s"$unitCte, dims AS (SELECT label, unnest(unit) AS v, unnest(generate_series(0, len(unit)-1)) AS dim FROM u), " +
      "cc AS (SELECT label, dim, CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS c FROM dims GROUP BY 1, 2) " +
      "SELECT label, round(sqrt(CAST(SUM(CAST(c*c AS DECIMAL(38,18))) AS DOUBLE)), 4) AS centroid_norm, count(*) AS dims FROM cc GROUP BY label ORDER BY label"),
    "q_text_stats" -> ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
      "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens, CAST(length(text) AS BIGINT) // 4 AS est_bpe_tokens, " +
      s"CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeSplitRe.replace("'", "''")}')) AS BIGINT) AS bpe_regex_tokens " +
      "FROM documents ORDER BY doc_id"),
    "q_quality" -> (s"WITH t AS (SELECT doc_id, length(text) AS nch, string_split(text, ' ') AS toks FROM documents), " +
      s"m AS (SELECT doc_id, CAST(nch AS DOUBLE) AS nchars, CAST(len(toks) AS DOUBLE) AS ntok, CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE) AS nstop, CAST(len(list_distinct(toks)) AS DOUBLE) AS ndis FROM t) " +
      "SELECT doc_id, round(nchars / ntok, 4) AS mean_token_len, round(ndis / ntok, 4) AS type_token_ratio, round(nstop / ntok, 4) AS stopword_ratio, round(CAST(1.0 AS DOUBLE) - ndis / ntok, 4) AS repetition FROM m ORDER BY doc_id"),
    "q_bpe_train" -> {
      val n = graft.pipeline.Bpe.DefaultMerges
      s"WITH ${bpeCtes(n, graft.pipeline.Bpe.DefaultVocabCap)} " +
        "SELECT * FROM (" +
        (1 to n).map(i => s"SELECT CAST($i AS BIGINT) AS rank, pr AS pair, " +
          s"replace(pr, ' ', '') AS merged, CAST(cnt AS BIGINT) AS cnt FROM b$i")
          .mkString(" UNION ALL ") +
        ") ORDER BY rank"
    },
    "q_bpe_encode" -> {
      val n = graft.pipeline.Bpe.DefaultMerges
      s"${bpeEncChain(n, graft.pipeline.Bpe.DefaultVocabCap)} " +
        "SELECT doc_id, CAST(len(syms) AS BIGINT) AS n_pretokens, " +
        "CAST(COALESCE(list_sum(list_transform(syms, s -> len(string_split(s, ' ')))), 0) AS BIGINT) AS n_bpe_tokens " +
        s"FROM e$n ORDER BY doc_id"
    },
    // the materialized token sequences: flatten each pre-token's final
    // symbol split, join on the unit separator (chr(31)) so every
    // token byte and boundary is pinned in order
    "q_bpe_tokens" -> {
      val n = graft.pipeline.Bpe.DefaultMerges
      s"${bpeEncChain(n, graft.pipeline.Bpe.DefaultVocabCap)} " +
        "SELECT doc_id, " +
        "CAST(COALESCE(list_sum(list_transform(syms, s -> len(string_split(s, ' ')))), 0) AS BIGINT) AS n_bpe_tokens, " +
        "COALESCE(array_to_string(flatten(list_transform(syms, s -> string_split(s, ' '))), chr(31)), '') AS tokens_str " +
        s"FROM e$n ORDER BY doc_id"
    },
    // unigram-LM tokenizer: the full seed → hard-EM → prune training
    // loop and the Viterbi encode DP, unrolled — training and encoding
    // replayed end to end in integer arithmetic
    "q_unigram_train" -> (s"WITH $unigramTrainCtes " +
      "SELECT piece, usage, cost FROM uc1 ORDER BY piece"),
    // the materialized unigram token sequences — encode DP backtraced
    // (smallest split on ties), every token byte and boundary pinned
    // in document order on the unit separator
    "q_unigram_tokens" -> (s"WITH $unigramTrainCtes, $unigramEncodeCtes, $unigramTokensCtes " +
      "SELECT d.doc_id, COALESCE(a.n_unigram_tokens, 0) AS n_unigram_tokens, " +
      "COALESCE(a.tokens_str, '') AS tokens_str " +
      "FROM documents d LEFT JOIN uetd a USING (doc_id) ORDER BY d.doc_id"),
    "q_unigram_encode" -> (s"WITH $unigramTrainCtes, $unigramEncodeCtes " +
      "SELECT d.doc_id, COALESCE(a.n_pretokens, 0) AS n_pretokens, " +
      "COALESCE(a.n_unigram_tokens, 0) AS n_unigram_tokens, " +
      "COALESCE(a.total_cost, 0) AS total_cost " +
      "FROM documents d LEFT JOIN ueagg a USING (doc_id) ORDER BY d.doc_id"),
    // the mixture planner budgeted in REAL tokenizer units (unigram-LM
    // token counts) instead of whitespace tokens
    "q_mixture_plan_unigram" -> (s"WITH $unigramTrainCtes, $unigramEncodeCtes, " +
      "mxa AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(COALESCE(a.n_unigram_tokens, 0)) AS BIGINT) AS tok_avail " +
      "FROM documents d LEFT JOIN ueagg a USING (doc_id) GROUP BY 1), " +
      "mxw AS (SELECT lang, n_docs, tok_avail, CAST(round(pow(CAST(tok_avail AS DOUBLE), CAST(0.6 AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wgt FROM mxa), " +
      "mxp AS (SELECT lang, n_docs, tok_avail, " +
      "round(CAST(wgt AS DOUBLE) / CAST(SUM(wgt) OVER () AS DOUBLE), 6) AS weight, " +
      "CAST(floor(least(CAST(20000 AS DOUBLE) * CAST(wgt AS DOUBLE) / CAST(SUM(wgt) OVER () AS DOUBLE), " +
      "CAST(1.5 AS DOUBLE) * CAST(tok_avail AS DOUBLE))) AS BIGINT) AS alloc_tokens FROM mxw) " +
      "SELECT lang, n_docs, tok_avail, weight, alloc_tokens, " +
      "round(CAST(alloc_tokens AS DOUBLE) / CAST(tok_avail AS DOUBLE), 6) AS epochs, " +
      "CAST(20000 - SUM(alloc_tokens) OVER () AS BIGINT) AS unspent " +
      "FROM mxp ORDER BY lang"),
    "q_langid" -> (s"WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents), " +
      s"m AS (SELECT doc_id, lang, CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE) / len(toks) AS sc FROM t) " +
      "SELECT doc_id, lang AS declared_lang, round(sc, 4) AS en_score, CASE WHEN sc >= 0.05 THEN 'en' ELSE 'other' END AS predicted_lang FROM m ORDER BY doc_id"),
    // trained char-3-gram Naive Bayes language ID: the full fit +
    // predict chain replayed (hashed grams, smoothed fixed-point-log2
    // profiles, argmax) — every step integer arithmetic, so the score
    // longs hash-match bit for bit
    "q_langid_ngram" -> (s"WITH $langIdNgramChain " +
      "SELECT d.doc_id, d.lang AS declared_lang, COALESCE(p.lang, 'und') AS predicted_lang, COALESCE(p.score, 0) AS nb_score " +
      "FROM documents d LEFT JOIN (SELECT doc_id, lang, score FROM lidp WHERE rk = 1) p USING (doc_id) ORDER BY d.doc_id"),
    "q_fingerprint" -> ("SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fingerprint, md5(text) AS exact_fingerprint FROM documents ORDER BY doc_id"),
    "q_winnow" -> (s"$winnowCte SELECT doc_id, array_to_string(" +
      "list_transform(fps, h -> CAST(h AS VARCHAR)), ',') AS fps " +
      "FROM f ORDER BY doc_id"),
    "q_winnow_overlap" -> (s"$winnowCte, x AS (SELECT doc_id, " +
      "unnest(fps) AS fp FROM f), " +
      // mirror the boilerplate-fingerprint cap (WinnowMaxFpDocs) so
      // Spark and oracle agree at every scale factor
      s"okf AS (SELECT fp FROM x GROUP BY fp HAVING count(*) <= ${Dedup.WinnowMaxFpDocs}), " +
      "xc AS (SELECT x.* FROM x JOIN okf USING (fp)) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared " +
      "FROM xc a JOIN xc b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY doc_a, doc_b"),
    "q_lm_likelihood" -> ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), " +
      "b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1), i -> {'w1': ws[i], 'w2': ws[i+1]}), recursive := true) FROM t), " +
      "bc AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2), " +
      "uc AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1), " +
      "vv AS (SELECT count(DISTINCT w2) AS v FROM b), " +
      "terms AS (SELECT b.doc_id, CAST(FLOOR(1e6 * (bc.c12 + 1) / (uc.c1 + vv.v)) AS BIGINT) AS tl FROM b JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN vv) " +
      "SELECT doc_id, count(*) AS n_bigrams, CAST((2*SUM(tl) + count(*)) // (2*count(*)) AS DOUBLE)/1e6 AS lm_score FROM terms GROUP BY 1 ORDER BY doc_id"),
    // the full curation funnel: every stage's SQL is the corresponding
    // standalone oracle's fragment re-rooted on the prior stage's
    // survivors (constants identical: Gopher thresholds, minhash
    // k=16/bands=4/threshold 0.5/cap, w=3 shingles); decontamination
    // compares 2·hits < shingles in integers (no rounding boundary)
    "q_curation_funnel" -> (
      "WITH RECURSIVE corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0), " +
      "gt AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM corpus), " +
      "gg AS (SELECT doc_id, text, w, CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w) - 2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END AS g3 FROM gt), " +
      s"gm AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, round(CAST(length(text) AS DOUBLE) / CAST(len(w) AS DOUBLE), 4) AS mean_token_len, CAST(len(list_filter(w, x -> list_contains($stopList, x))) AS INT) AS n_stopwords, round(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE) / CAST(len(w) AS DOUBLE), 4) AS symbol_ratio, round(CASE WHEN len(g3) > 0 THEN CAST(1.0 AS DOUBLE) - CAST(len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END, 4) AS dup_3gram_frac FROM gg), " +
      "gq AS (SELECT doc_id FROM gm WHERE n_tokens >= 20 AND n_tokens <= 100000 AND mean_token_len >= CAST(3.0 AS DOUBLE) AND mean_token_len <= CAST(10.0 AS DOUBLE) AND n_stopwords >= 2 AND symbol_ratio <= CAST(0.1 AS DOUBLE) AND dup_3gram_frac <= CAST(0.3 AS DOUBLE)), " +
      "qdocs AS (SELECT c.* FROM corpus c JOIN gq USING (doc_id)), " +
      "ek AS (SELECT min(doc_id) AS doc_id FROM (SELECT doc_id, md5(text) AS h FROM qdocs) GROUP BY h), " +
      "edocs AS (SELECT q.* FROM qdocs q JOIN ek USING (doc_id)), " +
      // substring stage: the q_substring_dedup fragment re-rooted on
      // the exact-dedup survivors; docs losing >= half their tokens
      // drop, the rest continue with their CLEANED text
      "st AS (SELECT doc_id, string_split(text, ' ') AS w FROM edocs), " +
      "sg0 AS (SELECT doc_id, p, md5(array_to_string(list_slice(w, p, p + 7), ' ')) AS h FROM st CROSS JOIN unnest(generate_series(1, len(w) - 7)) AS u(p)), " +
      "sc0 AS (SELECT h, count(*) AS cnt, min(doc_id * 1000000 + p) AS mink FROM sg0 GROUP BY h), " +
      "sd0 AS (SELECT g.doc_id, g.p FROM sg0 g JOIN sc0 USING (h) WHERE cnt >= 2 AND g.doc_id * 1000000 + g.p <> mink), " +
      "sq0 AS (SELECT doc_id, list_sort(list(p)) AS qs FROM sd0 GROUP BY doc_id), " +
      "sf0 AS (SELECT st.doc_id, w, COALESCE(qs, []) AS qs FROM st LEFT JOIN sq0 USING (doc_id)), " +
      "sk0 AS (SELECT doc_id, w, list_filter(generate_series(1, len(w)), i -> len(list_filter(qs, q -> q <= i AND i <= q + 7)) = 0) AS kept FROM sf0), " +
      "sdd AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, CAST(len(w) - len(kept) AS BIGINT) AS n_removed, COALESCE(array_to_string(list_transform(kept, i -> w[i]), ' '), '') AS text_clean FROM sk0), " +
      "sdocs AS (SELECT doc_id, text_clean AS text FROM sdd WHERE n_removed * 2 < n_tokens), " +
      "s2 AS (SELECT doc_id, string_split(text, ' ') AS words FROM sdocs), " +
      "sh2 AS (SELECT doc_id, list_distinct(list_transform(generate_series(0, GREATEST(len(words)-3, 0)), i -> array_to_string(words[i+1:i+3], ' '))) AS shingles FROM s2), " +
      s"hh2 AS (SELECT doc_id, shingles, list_transform(shingles, s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % ${Dedup.MinhashP}) AS hs FROM sh2), " +
      s"sg2 AS (SELECT doc_id, ${minhashSigSql(16)} AS sig FROM hh2), " +
      "banded2 AS (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band FROM sg2), " +
      "bk02 AS (SELECT doc_id, sig, band, md5(array_to_string(list_transform(sig[band*4+1:band*4+4], x -> CAST(x AS VARCHAR)), ',')) AS bucket FROM banded2), " +
      s"okb2 AS (SELECT band, bucket FROM bk02 GROUP BY band, bucket HAVING count(*) <= ${pipeline.Caps.DefaultMaxBucket}), " +
      "bk2 AS (SELECT bk02.* FROM bk02 JOIN okb2 USING (band, bucket)), " +
      "pairs2 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(len(list_filter(list_zip(a.sig, b.sig), z -> z[1] = z[2])) AS DOUBLE) / 16 AS est_jaccard FROM bk2 a JOIN bk2 b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id), " +
      "fp2 AS (SELECT doc_a, doc_b FROM pairs2 WHERE est_jaccard >= 0.5), " +
      "edges2 AS (SELECT doc_a AS src, doc_b AS dst FROM fp2 UNION SELECT doc_b, doc_a FROM fp2), " +
      "r2(doc, comp) AS (SELECT src, src FROM edges2 UNION SELECT e.dst, r2.comp FROM r2 JOIN edges2 e ON e.src = r2.doc), " +
      "cmp2 AS (SELECT doc AS doc_id, min(comp) AS component FROM r2 GROUP BY doc), " +
      "drop2 AS (SELECT doc_id FROM cmp2 WHERE doc_id <> component), " +
      "ndocs AS (SELECT e.* FROM sdocs e WHERE e.doc_id NOT IN (SELECT doc_id FROM drop2)), " +
      // cross-corpus stage: near-dup survivors LSH-matched against the
      // benchmark slice (per-side caps, est_jaccard >= 0.5 — the
      // q_crosscorpus_neardup semantics); the new side reuses sg2's
      // signatures (same cleaned text), re-capped WITHIN ndocs
      sideBandedCtes("fr", "doc_id % 10 = 0") + ", " +
      "ccbd AS (SELECT g.doc_id, g.sig, unnest(generate_series(0, 3)) AS band FROM sg2 g JOIN ndocs USING (doc_id)), " +
      "ccbk0 AS (SELECT doc_id, sig, band, md5(array_to_string(list_transform(sig[band*4+1:band*4+4], x -> CAST(x AS VARCHAR)), ',')) AS bucket FROM ccbd), " +
      s"ccokb AS (SELECT band, bucket FROM ccbk0 GROUP BY band, bucket HAVING count(*) <= ${pipeline.Caps.DefaultMaxBucket}), " +
      "ccbk AS (SELECT ccbk0.* FROM ccbk0 JOIN ccokb USING (band, bucket)), " +
      "cchit AS (SELECT DISTINCT n.doc_id FROM ccbk n JOIN bkfr r ON n.band = r.band AND n.bucket = r.bucket " +
      "WHERE CAST(len(list_filter(list_zip(n.sig, r.sig), z -> z[1] = z[2])) AS DOUBLE) / 16 >= CAST(0.5 AS DOUBLE)), " +
      "cdocs AS (SELECT nd.* FROM ndocs nd WHERE nd.doc_id NOT IN (SELECT doc_id FROM cchit)), " +
      "bs2 AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id % 10 = 0), " +
      "bsh AS (SELECT DISTINCT s FROM (SELECT unnest(list_distinct(list_transform(generate_series(0, GREATEST(len(words)-3, 0)), i -> array_to_string(words[i+1:i+3], ' ')))) AS s FROM bs2)), " +
      "nsh AS (SELECT doc_id, unnest(shingles) AS s FROM (SELECT n.doc_id, sh2.shingles FROM cdocs n JOIN sh2 ON n.doc_id = sh2.doc_id)), " +
      "cj AS (SELECT nsh.doc_id, count(*) AS n, CAST(SUM(CASE WHEN bsh.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits FROM nsh LEFT JOIN bsh ON nsh.s = bsh.s GROUP BY 1), " +
      "clean AS (SELECT doc_id FROM cj WHERE hits * 2 < n) " +
      "SELECT (SELECT count(*) FROM corpus) AS n_corpus, (SELECT count(*) FROM qdocs) AS n_quality, (SELECT count(*) FROM edocs) AS n_exact, (SELECT count(*) FROM sdocs) AS n_substring, (SELECT count(*) FROM ndocs) AS n_neardup, (SELECT count(*) FROM cdocs) AS n_crosscorpus, (SELECT count(*) FROM clean) AS n_clean"),
    "q_importance" -> (s"WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents), " +
      "b0 AS (SELECT doc_id, lang, unnest(list_transform(generate_series(1, len(ws)-1), i -> {'w1': ws[i], 'w2': ws[i+1]}), recursive := true) FROM t), " +
      s"f AS (SELECT doc_id, lang, CAST((CAST(('0x'||substr(md5(w1 || ' ' || w2),1,15)) AS BIGINT) % ${Dedup.MinhashP}) % 4096 AS INT) AS b FROM b0), " +
      "tc AS (SELECT b, count(*) AS ct FROM f WHERE lang = 'en' GROUP BY 1), " +
      "rc AS (SELECT b, count(*) AS cr FROM f GROUP BY 1), " +
      "tot AS (SELECT (SELECT SUM(ct) FROM tc) AS nt, (SELECT SUM(cr) FROM rc) AS nr), " +
      "terms AS (SELECT f.doc_id, CAST(FLOOR(1e6 * ((CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE) * CAST(tot.nr + 4096 AS DOUBLE)) / (CAST(tot.nt + 4096 AS DOUBLE) * CAST(rc.cr + 1 AS DOUBLE)))) AS BIGINT) AS tw FROM f JOIN rc USING (b) LEFT JOIN tc USING (b) CROSS JOIN tot) " +
      "SELECT doc_id, count(*) AS n_feats, CAST((2*SUM(tw) + count(*)) // (2*count(*)) AS DOUBLE)/1e6 AS importance FROM terms GROUP BY 1 ORDER BY doc_id"),
    "q_repetition" -> ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])) AS g FROM t), " +
      "bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2), " +
      "bs AS (SELECT doc_id, round(max(c)/CAST(sum(c) AS DOUBLE), 4) AS top_bigram_frac, round((sum(c)-count(*))/CAST(sum(c) AS DOUBLE), 4) AS dup_2gram_frac FROM bc GROUP BY 1), " +
      "tr AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM t), " +
      "tc AS (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2), " +
      "ts AS (SELECT doc_id, round((sum(c)-count(*))/CAST(sum(c) AS DOUBLE), 4) AS dup_3gram_frac FROM tc GROUP BY 1) " +
      "SELECT bs.doc_id AS doc_id, top_bigram_frac, dup_2gram_frac, dup_3gram_frac FROM bs JOIN ts ON bs.doc_id = ts.doc_id ORDER BY bs.doc_id"),
    "q_pii" -> ("WITH t AS (SELECT doc_id, text || CASE WHEN doc_id % 5 = 0 THEN ' contact alice@example.com or bob.smith@mail.org' " +
      "WHEN doc_id % 5 = 1 THEN ' server at 10.0.0.1 and 192.168.1.100' WHEN doc_id % 5 = 2 THEN ' call +1 555-123-4567' " +
      "WHEN doc_id % 5 = 3 THEN ' mixed: c@d.io 8.8.8.8' ELSE '' END AS text2 FROM documents) " +
      "SELECT doc_id, CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails, " +
      "CAST(len(regexp_extract_all(text2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INT) AS n_ipv4, " +
      "CAST(len(regexp_extract_all(text2, '\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}')) AS INT) AS n_phones FROM t ORDER BY doc_id"),
    "q_tfidf" -> ("WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
      "tf AS (SELECT doc_id, term, count(*) AS cnt FROM t GROUP BY 1, 2), " +
      "dl AS (SELECT doc_id, term, cnt, SUM(cnt) OVER (PARTITION BY doc_id) AS doc_len FROM tf), " +
      "df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY term), " +
      "sc AS (SELECT dl.doc_id, dl.term, round((CAST(cnt AS DOUBLE) / doc_len) * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS tfidf FROM dl JOIN df USING (term)), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk FROM sc) " +
      "SELECT doc_id, term, tfidf, rk FROM rk WHERE rk <= 5 ORDER BY doc_id, rk"),
    // Okapi BM25: identical expression tree (left-assoc, every literal
    // a DOUBLE, k1+1 computed by the same Scala addition), per-term
    // round(…,9) then DECIMAL sum so addition order can't flip a bit
    "q_bm25" -> {
      val k1 = 1.2; val b = 0.75
      val terms = "('hash','join','spark','window')"
      "WITH bmn AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM documents), " +
        "bml AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents), " +
        "bmt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
        s"bmf AS (SELECT doc_id, term, count(*) AS tf FROM bmt WHERE term IN $terms GROUP BY 1, 2), " +
        "bmd AS (SELECT term, count(*) AS df FROM bmf GROUP BY 1), " +
        s"bms AS (SELECT f.doc_id, ln(CAST(1.0 AS DOUBLE) + (n.n - d.df + CAST(0.5 AS DOUBLE)) / (d.df + CAST(0.5 AS DOUBLE))) * (f.tf * CAST(${k1 + 1.0} AS DOUBLE)) / (f.tf + CAST($k1 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST($b AS DOUBLE) + CAST($b AS DOUBLE) * l.dl / n.avgdl)) AS s " +
        "FROM bmf f JOIN bmd d USING (term) JOIN bml l USING (doc_id) CROSS JOIN bmn n), " +
        "bm9 AS (SELECT doc_id, CAST(round(s, 9) AS DECIMAL(38,9)) AS s9 FROM bms), " +
        "bma AS (SELECT doc_id, round(CAST(sum(s9) AS DOUBLE), 6) AS bm25, CAST(count(*) AS INT) AS n_terms_hit FROM bm9 GROUP BY 1), " +
        "bmr AS (SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk FROM bma) " +
        "SELECT doc_id, bm25, n_terms_hit, rk FROM bmr WHERE rk <= 20 ORDER BY rk"
    },
    "q_contamination" -> (s"$shCte, d AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 10 <> 0), " +
      "b AS (SELECT DISTINCT s FROM (SELECT unnest(shingles) AS s FROM sh WHERE doc_id % 10 = 0)), " +
      "j AS (SELECT d.doc_id, count(*) AS n_shingles, CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated " +
      "FROM d LEFT JOIN b ON d.s = b.s GROUP BY d.doc_id) " +
      "SELECT doc_id, n_shingles, n_contaminated, round(CAST(n_contaminated AS DOUBLE) / n_shingles, 6) AS contamination FROM j ORDER BY doc_id"),

    // curation: per-source cap / split assignment / sequence packing
    "q_source_cap" -> ("WITH r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS source_rank FROM documents) " +
      "SELECT doc_id, source, source_rank FROM r WHERE source_rank <= 40 ORDER BY source, source_rank"),
    "q_split_assign" -> ("WITH h AS (SELECT doc_id, CAST(('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) AS hv FROM documents), " +
      "u AS (SELECT doc_id, CAST(hv AS DOUBLE) / 4294967296.0 AS uu FROM h) " +
      "SELECT doc_id, round(uu, 8) AS split_u, CASE WHEN uu < 0.9 THEN 'train' WHEN uu < 0.95 THEN 'val' ELSE 'test' END AS split FROM u ORDER BY doc_id"),
    "q_pack" -> ("WITH t AS (SELECT doc_id, lang, doc_id % 8 AS shard, len(string_split(text, ' ')) AS n_tokens FROM documents), " +
      "c AS (SELECT doc_id, lang, shard, n_tokens, CAST(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok FROM t) " +
      "SELECT doc_id, lang, shard, n_tokens, start_tok, start_tok // 2048 AS chunk, start_tok % 2048 AS chunk_offset FROM c ORDER BY doc_id"),

    // segment-level dedup: global first occurrence per 10-word segment,
    // survivors reassembled in order (text compared via md5)
    "q_segment_dedup" -> ("WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents), " +
      "sg AS (SELECT doc_id, " +
      "unnest(generate_series(0, CAST(CEIL(len(words) / 10.0) AS BIGINT) - 1)) AS seg_idx, " +
      "unnest(list_transform(generate_series(0, CAST(CEIL(len(words) / 10.0) AS BIGINT) - 1), " +
      "i -> array_to_string(list_slice(words, i * 10 + 1, i * 10 + 10), ' '))) AS seg FROM w), " +
      "f AS (SELECT doc_id, seg_idx, seg, " +
      "row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn FROM sg) " +
      "SELECT doc_id, count(*) AS n_segments, " +
      "CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
      "md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), '')) AS text_hash " +
      "FROM f GROUP BY doc_id ORDER BY doc_id"),
    // exact substring dedup (Lee et al. 2021): every duplicated
    // 8-token gram's non-canonical occurrences mark their token span
    // for removal; canonical = min(doc_id * 1e6 + pos), the shared
    // Dedup.SubstringPosBase encoding
    "q_substring_dedup" -> ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), " +
      "g AS (SELECT doc_id, p, md5(array_to_string(list_slice(w, p, p + 7), ' ')) AS h " +
      "FROM t CROSS JOIN unnest(generate_series(1, len(w) - 7)) AS u(p)), " +
      "c AS (SELECT h, count(*) AS cnt, min(doc_id * 1000000 + p) AS mink FROM g GROUP BY h), " +
      "d AS (SELECT g.doc_id, g.p FROM g JOIN c USING (h) " +
      "WHERE cnt >= 2 AND g.doc_id * 1000000 + g.p <> mink), " +
      "q AS (SELECT doc_id, list_sort(list(p)) AS qs FROM d GROUP BY doc_id), " +
      "f AS (SELECT t.doc_id, w, COALESCE(qs, []) AS qs FROM t LEFT JOIN q USING (doc_id)), " +
      "k AS (SELECT doc_id, w, list_filter(generate_series(1, len(w)), " +
      "i -> len(list_filter(qs, q -> q <= i AND i <= q + 7)) = 0) AS kept FROM f) " +
      "SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, " +
      "CAST(len(w) - len(kept) AS BIGINT) AS n_removed, " +
      "COALESCE(array_to_string(list_transform(kept, i -> w[i]), ' '), '') AS text_clean " +
      "FROM k ORDER BY doc_id"),
    // skew stress: the same segment-dedup and LSH-cap semantics over
    // the 50%-boilerplate corpus (CASE substitution mirrors skewedDocs)
    "q_skew_segment_dedup" -> (s"WITH w AS (SELECT doc_id, string_split(CASE WHEN doc_id % 2 = 0 THEN '$skewBoiler' ELSE text END, ' ') AS words FROM documents), " +
      "sg AS (SELECT doc_id, " +
      "unnest(generate_series(0, CAST(CEIL(len(words) / 10.0) AS BIGINT) - 1)) AS seg_idx, " +
      "unnest(list_transform(generate_series(0, CAST(CEIL(len(words) / 10.0) AS BIGINT) - 1), " +
      "i -> array_to_string(list_slice(words, i * 10 + 1, i * 10 + 10), ' '))) AS seg FROM w), " +
      "f AS (SELECT doc_id, seg_idx, seg, " +
      "row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn FROM sg) " +
      "SELECT doc_id, count(*) AS n_segments, " +
      "CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
      "md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), '')) AS text_hash " +
      "FROM f GROUP BY doc_id ORDER BY doc_id"),
    "q_skew_lsh_capped" -> (minhashPairsCte
      .replace("FROM documents",
        s"FROM (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN '$skewBoiler' ELSE text END AS text FROM documents)")
      .replace(
        "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(len(list_filter(list_zip(a.sig, b.sig), z -> z[1] = z[2])) AS DOUBLE) / 16 AS est_jaccard " +
          "FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)",
        "ok AS (SELECT band, bucket FROM bk GROUP BY band, bucket HAVING count(*) <= 64), " +
          "bk2 AS (SELECT bk.* FROM bk JOIN ok USING (band, bucket)), " +
          "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
          "FROM bk2 a JOIN bk2 b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)") +
      " SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b"),
    // cross-corpus near-dup join: the per-side banded chains mirror
    // crossCorpusNearDups' per-side hot-bucket caps exactly
    "q_crosscorpus_neardup" -> ("WITH " +
      sideBandedCtes("cn", "doc_id % 4 = 0") + ", " +
      sideBandedCtes("cr", "doc_id % 4 <> 0") + ", " +
      "cxp AS (SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id, " +
      "CAST(len(list_filter(list_zip(n.sig, r.sig), z -> z[1] = z[2])) AS DOUBLE) / 16 AS est_jaccard " +
      "FROM bkcn n JOIN bkcr r ON n.band = r.band AND n.bucket = r.bucket) " +
      "SELECT new_id, ref_id, est_jaccard FROM cxp " +
      "WHERE est_jaccard >= CAST(0.5 AS DOUBLE) ORDER BY new_id, ref_id"),
    // cluster-balanced sampling: IVF assignment (the ANN family's
    // oracle-pinned chain) + the temperature-sampling fragment keyed
    // by cell instead of source
    "q_cluster_sample" -> (s"$unitCte, $ivfChain, " +
      "clc AS (SELECT cell, count(*) AS n_cell FROM asg GROUP BY cell), " +
      "clr AS (SELECT cell, n_cell, CAST(round(pow(CAST(n_cell AS DOUBLE), CAST(0.5 AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wgt FROM clc), " +
      "clr2 AS (SELECT cell, n_cell, least(CAST(1.0 AS DOUBLE), " +
      "CAST(0.5 AS DOUBLE) * CAST(SUM(n_cell) OVER () AS DOUBLE) * CAST(wgt AS DOUBLE) " +
      "/ CAST(SUM(wgt) OVER () AS DOUBLE) / CAST(n_cell AS DOUBLE)) AS keep_rate FROM clr), " +
      "clu AS (SELECT a.vec_id, a.cell, r.n_cell, r.keep_rate, " +
      "round(CAST(CAST(('0x'||substr(md5('csample:'||CAST(a.vec_id AS VARCHAR)),1,8)) AS BIGINT) AS DOUBLE) / 4294967296.0, 8) AS sample_u " +
      "FROM asg a JOIN clr2 r USING (cell)) " +
      "SELECT vec_id, cell, n_cell, round(keep_rate, 6) AS keep_rate, sample_u " +
      "FROM clu WHERE sample_u < round(keep_rate, 8) ORDER BY vec_id"),
    // deterministic HLL distinct sketch: md5-derived 60-bit hash,
    // 64 buckets, exact DECIMAL harmonic sum, driver-literal ln table
    // (constants shared with Sketches via the same Scala calls)
    "q_hll_distinct" -> {
      val b = pipeline.Sketches.DefaultB
      val m = 1 << b
      val restBits = 60 - b
      val p61 = math.pow(2.0, 61)
      val lnArr = pipeline.Sketches.lnTable(b).mkString("[", ", ", "]")
      s"WITH hl AS (SELECT event_type, CAST(('0x'||substr(md5('hll:'||CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hash FROM events WHERE user_id IS NOT NULL), " +
        s"hb AS (SELECT event_type, hash % $m AS bucket, hash // $m AS rest FROM hl), " +
        s"hr AS (SELECT event_type, bucket, max(CASE WHEN rest = 0 THEN ${restBits + 1} ELSE $restBits - length(bin(rest)) + 1 END) AS r FROM hb GROUP BY 1, 2), " +
        s"hg AS (SELECT event_type, CAST(count(*) AS INT) AS n_buckets, SUM(CAST(pow(CAST(2 AS DOUBLE), 61 - r) AS DECIMAL(38,0))) AS zp FROM hr GROUP BY 1), " +
        s"hz AS (SELECT event_type, n_buckets, $m - n_buckets AS n_zero, CAST(zp + CAST($m - n_buckets AS DECIMAL(38,0)) * CAST($p61 AS DECIMAL(38,0)) AS DOUBLE) AS z FROM hg), " +
        s"he AS (SELECT event_type, n_buckets, n_zero, CAST(${pipeline.Sketches.alphaNum(b)} AS DOUBLE) / z AS e_raw FROM hz), " +
        s"hx AS (SELECT event_type, n_buckets, n_zero, round(CASE WHEN e_raw <= CAST(${2.5 * m} AS DOUBLE) AND n_zero > 0 THEN (CAST($lnArr AS DOUBLE[]))[n_zero] ELSE e_raw END, 4) AS hll_est FROM he), " +
        s"hx2 AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1) " +
        // LEFT JOIN + COALESCE mirrors hllDistinct's all-NULL-key
        // handling: n_exact = 0 keys report (0 buckets, m zeros,
        // est 0, rel_err 0) instead of disappearing
        s"SELECT hx2.event_type, hx2.n_exact, COALESCE(hx.n_buckets, 0) AS n_buckets, COALESCE(hx.n_zero, $m) AS n_zero, COALESCE(hx.hll_est, 0.0) AS hll_est, " +
        "CASE WHEN hx2.n_exact = 0 THEN 0.0 ELSE round(abs(COALESCE(hx.hll_est, 0.0) - CAST(hx2.n_exact AS DOUBLE)) / CAST(hx2.n_exact AS DOUBLE), 4) END AS rel_err " +
        "FROM hx2 LEFT JOIN hx USING (event_type) ORDER BY event_type"
    },
    // count-min sketch: d unrolled md5 hash rows, additive cells,
    // min-over-rows estimates — every step exact integer arithmetic
    "q_cms_counts" -> {
      val d = pipeline.Sketches.DefaultCmsDepth
      val w = pipeline.Sketches.DefaultCmsWidth
      def bkt(r: Int) =
        s"CAST(('0x'||substr(md5('cms:$r:'||CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % $w"
      val rowsUnion = (0 until d).map(r =>
        s"SELECT $r AS rw, ${bkt(r)} AS bucket FROM events")
        .mkString(" UNION ALL ")
      val probeUnion = (0 until d).map(r =>
        s"SELECT user_id, $r AS rw, ${bkt(r)} AS bucket FROM cme")
        .mkString(" UNION ALL ")
      s"WITH cmsk AS (SELECT rw, bucket, count(*) AS cnt FROM ($rowsUnion) GROUP BY 1, 2), " +
        "cme AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1), " +
        s"cmpe AS (SELECT user_id, min(cnt) AS cms_est FROM ($probeUnion) p JOIN cmsk USING (rw, bucket) GROUP BY 1) " +
        "SELECT cme.user_id, cme.n_exact, cmpe.cms_est, cmpe.cms_est - cme.n_exact AS over_err " +
        "FROM cme JOIN cmpe USING (user_id) ORDER BY user_id"
    },
    // HDR-histogram quantile sketch: pure integer bit arithmetic (the
    // binary-string length + shifts both engines share), exact integer
    // rank ceil via //, under_err >= 0 + the 2^-sb bound per row
    "q_hdr_quantiles" -> {
      val sb = pipeline.Sketches.DefaultSubBits
      s"WITH hqv AS (SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v FROM events WHERE value IS NOT NULL AND value >= 0), " +
        s"hqb AS (SELECT event_type, (v >> s) << s AS rep FROM (SELECT event_type, v, greatest(length(bin(v)) - ${1 + sb}, 0) AS s FROM hqv)), " +
        "hqc AS (SELECT event_type, rep, count(*) AS cnt FROM hqb GROUP BY 1, 2), " +
        "hqn AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM hqc GROUP BY 1), " +
        "hqm AS (SELECT event_type, rep, sum(cnt) OVER (PARTITION BY event_type ORDER BY rep) AS cum FROM hqc), " +
        "hqp AS (SELECT event_type, n, q_milli, greatest((q_milli * n + 999) // 1000, 1) AS rnk FROM hqn CROSS JOIN (VALUES (500), (900), (990)) qs(q_milli)), " +
        "hqe AS (SELECT p.event_type, p.q_milli, min(p.n) AS n, min(c.rep) AS hdr_est FROM hqp p JOIN hqm c ON p.event_type = c.event_type AND c.cum >= p.rnk GROUP BY 1, 2), " +
        "hxc AS (SELECT event_type, v, count(*) AS cnt FROM hqv GROUP BY 1, 2), " +
        "hxm AS (SELECT event_type, v, sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum FROM hxc), " +
        "hxe AS (SELECT p.event_type, p.q_milli, min(c.v) AS exact FROM hqp p JOIN hxm c ON p.event_type = c.event_type AND c.cum >= p.rnk GROUP BY 1, 2) " +
        "SELECT e.event_type, e.q_milli, e.n, e.hdr_est, x.exact, x.exact - e.hdr_est AS under_err, " +
        s"(x.exact - e.hdr_est) * ${1L << sb} <= e.hdr_est AS bound_ok " +
        "FROM hqe e JOIN hxe x USING (event_type, q_milli) ORDER BY event_type, q_milli"
    },
    // CMS heavy hitters: the per-value replay of the two-pass filter —
    // est = min over the d cells, thr = exact integer ceil of phi·n,
    // keep every value whose ESTIMATE reaches thr (zero false
    // negatives; n_exact >= thr audits which survivors are real)
    "q_cms_heavy" -> {
      val d = pipeline.Sketches.DefaultCmsDepth
      val w = pipeline.Sketches.DefaultCmsWidth
      def bkt(r: Int) =
        s"CAST(('0x'||substr(md5('cms:$r:'||hh_key),1,15)) AS BIGINT) % $w"
      val rowsUnion = (0 until d).map(r =>
        s"SELECT $r AS rw, ${bkt(r)} AS bucket FROM che")
        .mkString(" UNION ALL ")
      val probeUnion = (0 until d).map(r =>
        s"SELECT hh_key, $r AS rw, ${bkt(r)} AS bucket FROM chv")
        .mkString(" UNION ALL ")
      "WITH che AS (SELECT CASE WHEN user_id % 10 < 3 THEN 'hot:' || CAST(user_id % 3 AS VARCHAR) ELSE 'cold:' || CAST(user_id AS VARCHAR) END AS hh_key FROM events WHERE user_id IS NOT NULL), " +
        s"chk AS (SELECT rw, bucket, count(*) AS cnt FROM ($rowsUnion) GROUP BY 1, 2), " +
        "chv AS (SELECT hh_key, count(*) AS n_exact FROM che GROUP BY 1), " +
        "cht AS (SELECT greatest((50 * count(*) + 999) // 1000, 1) AS thr FROM che), " +
        s"chm AS (SELECT hh_key, min(cnt) AS cms_est FROM ($probeUnion) p JOIN chk USING (rw, bucket) GROUP BY 1) " +
        "SELECT v.hh_key, m.cms_est, v.n_exact, t.thr, v.n_exact >= t.thr AS is_true_heavy " +
        "FROM chv v JOIN chm m USING (hh_key) CROSS JOIN cht t " +
        "WHERE m.cms_est >= t.thr ORDER BY hh_key"
    },
    // temperature sampling: keep-rate ∝ count^alpha, decimal-exact
    // normalizer, md5-derived deterministic uniform per doc
    "q_temp_sample" -> ("WITH c AS (SELECT source, count(*) AS n_source FROM documents GROUP BY source), " +
      "r AS (SELECT source, n_source, CAST(round(pow(CAST(n_source AS DOUBLE), CAST(0.5 AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wgt FROM c), " +
      "r2 AS (SELECT source, n_source, least(CAST(1.0 AS DOUBLE), " +
      "CAST(0.5 AS DOUBLE) * CAST(SUM(n_source) OVER () AS DOUBLE) * CAST(wgt AS DOUBLE) " +
      "/ CAST(SUM(wgt) OVER () AS DOUBLE) / CAST(n_source AS DOUBLE)) AS keep_rate FROM r), " +
      "u AS (SELECT d.doc_id, d.source, r2.n_source, r2.keep_rate, " +
      "round(CAST(CAST(('0x'||substr(md5('sample:'||CAST(d.doc_id AS VARCHAR)),1,8)) AS BIGINT) AS DOUBLE) / 4294967296.0, 8) AS sample_u " +
      "FROM documents d JOIN r2 USING (source)) " +
      "SELECT doc_id, source, n_source, round(keep_rate, 6) AS keep_rate, sample_u " +
      "FROM u WHERE sample_u < round(keep_rate, 8) ORDER BY doc_id"),
    // multilingual rebalance keyed by the TRAINED classifier's
    // predictions (not the declared labels): the langIdNgram chain
    // feeds the temperature-sampling fragment
    "q_temp_sample_lang" -> (s"WITH $langIdNgramChain, " +
      "pl AS (SELECT d.doc_id, COALESCE(p.lang, 'und') AS lang " +
      "FROM documents d LEFT JOIN (SELECT doc_id, lang FROM lidp WHERE rk = 1) p USING (doc_id)), " +
      "c AS (SELECT lang, count(*) AS n_source FROM pl GROUP BY lang), " +
      "r AS (SELECT lang, n_source, CAST(round(pow(CAST(n_source AS DOUBLE), CAST(0.3 AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wgt FROM c), " +
      "r2 AS (SELECT lang, n_source, least(CAST(1.0 AS DOUBLE), " +
      "CAST(0.5 AS DOUBLE) * CAST(SUM(n_source) OVER () AS DOUBLE) * CAST(wgt AS DOUBLE) " +
      "/ CAST(SUM(wgt) OVER () AS DOUBLE) / CAST(n_source AS DOUBLE)) AS keep_rate FROM r), " +
      "u AS (SELECT d.doc_id, d.lang, r2.n_source, r2.keep_rate, " +
      "round(CAST(CAST(('0x'||substr(md5('sample:'||CAST(d.doc_id AS VARCHAR)),1,8)) AS BIGINT) AS DOUBLE) / 4294967296.0, 8) AS sample_u " +
      "FROM pl d JOIN r2 USING (lang)) " +
      "SELECT doc_id, lang, n_source, round(keep_rate, 6) AS keep_rate, sample_u " +
      "FROM u WHERE sample_u < round(keep_rate, 8) ORDER BY doc_id"),
    // token-budget mixture planner: rounded-DECIMAL weight normalizer
    // (the temperatureSample discipline) in token units, floor'd
    // allocations, maxEpochs cap, window-summed unspent remainder
    "q_mixture_plan" -> ("WITH mxa AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_avail FROM documents GROUP BY 1), " +
      "mxw AS (SELECT lang, n_docs, tok_avail, CAST(round(pow(CAST(tok_avail AS DOUBLE), CAST(0.6 AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wgt FROM mxa), " +
      "mxp AS (SELECT lang, n_docs, tok_avail, " +
      "round(CAST(wgt AS DOUBLE) / CAST(SUM(wgt) OVER () AS DOUBLE), 6) AS weight, " +
      "CAST(floor(least(CAST(20000 AS DOUBLE) * CAST(wgt AS DOUBLE) / CAST(SUM(wgt) OVER () AS DOUBLE), " +
      "CAST(1.5 AS DOUBLE) * CAST(tok_avail AS DOUBLE))) AS BIGINT) AS alloc_tokens FROM mxw) " +
      "SELECT lang, n_docs, tok_avail, weight, alloc_tokens, " +
      "round(CAST(alloc_tokens AS DOUBLE) / CAST(tok_avail AS DOUBLE), 6) AS epochs, " +
      "CAST(20000 - SUM(alloc_tokens) OVER () AS BIGINT) AS unspent " +
      "FROM mxp ORDER BY lang"),
    "q_changed_pairs" -> (s"$cte, l AS (SELECT event_id, host, state, " +
      "lag(state, 1, 'ok') OVER (PARTITION BY host ORDER BY time_s, event_id) AS prev_value FROM ev) " +
      "SELECT event_id, host, prev_value, state FROM l " +
      "WHERE state IS DISTINCT FROM prev_value ORDER BY event_id"),

    // email subject: human-uniq'd hosts/services/states per service
    // group, distinct values in first-appearance (time, id) order
    "q_email_subject" -> (s"$cte, " +
      "rh AS (SELECT service, host, time_s, event_id, row_number() OVER (PARTITION BY service, host ORDER BY time_s, event_id) AS rn FROM ev WHERE host IS NOT NULL), " +
      "hl AS (SELECT service, list(host ORDER BY time_s, event_id) AS d FROM rh WHERE rn = 1 GROUP BY service), " +
      "rs AS (SELECT service, service AS v, time_s, event_id, row_number() OVER (PARTITION BY service ORDER BY time_s, event_id) AS rn FROM ev), " +
      "sl AS (SELECT service, list(v ORDER BY time_s, event_id) AS d FROM rs WHERE rn = 1 GROUP BY service), " +
      "rt AS (SELECT service, state, time_s, event_id, row_number() OVER (PARTITION BY service, state ORDER BY time_s, event_id) AS rn FROM ev WHERE state IS NOT NULL), " +
      "tl AS (SELECT service, list(state ORDER BY time_s, event_id) AS d FROM rt WHERE rn = 1 GROUP BY service) " +
      "SELECT hl.service, concat_ws(' ', " +
      "CASE WHEN len(hl.d) = 0 THEN NULL WHEN len(hl.d) = 1 THEN hl.d[1] WHEN len(hl.d) = 2 THEN hl.d[1] || ' and ' || hl.d[2] WHEN len(hl.d) <= 4 THEN array_to_string(hl.d, ', ') ELSE CAST(len(hl.d) AS VARCHAR) || ' hosts' END, " +
      "CASE WHEN len(sl.d) = 0 THEN NULL WHEN len(sl.d) = 1 THEN sl.d[1] WHEN len(sl.d) = 2 THEN sl.d[1] || ' and ' || sl.d[2] WHEN len(sl.d) <= 4 THEN array_to_string(sl.d, ', ') ELSE CAST(len(sl.d) AS VARCHAR) || ' services' END, " +
      "CASE WHEN len(tl.d) = 0 THEN NULL WHEN len(tl.d) = 1 THEN tl.d[1] WHEN len(tl.d) = 2 THEN tl.d[1] || ' and ' || tl.d[2] WHEN len(tl.d) <= 4 THEN array_to_string(tl.d, ', ') ELSE CAST(len(tl.d) AS VARCHAR) || ' states' END) AS subject " +
      "FROM hl JOIN sl USING (service) JOIN tl USING (service) ORDER BY service"),
    // email body block per event (time line, h/s/state/metric, tags,
    // custom attributes, empty description), compared via md5
    "q_email_body" -> (EventView.oracleCteWith(
      "json_extract_string(props, '$.k') AS kstr") +
      " SELECT event_id, md5('At ' || strftime(make_timestamp(time_s * 1000000), '%a %b %d %H:%M:%S UTC %Y') || chr(10) || " +
      "COALESCE(host, '') || ' ' || COALESCE(service, '') || ' ' || COALESCE(state, '') || ' (' || " +
      "COALESCE(CAST(metric AS VARCHAR), '') || ')' || chr(10) || " +
      "'Tags: [' || array_to_string(tags, ', ') || ']' || chr(10) || " +
      "'Custom Attributes: ' || (CASE WHEN kstr IS NULL THEN '' ELSE '{:k \"' || kstr || '\"}' END) || chr(10) || chr(10)) AS body_hash " +
      "FROM ev ORDER BY event_id"),
    "q_index_delete" -> (s"$snapCte SELECT event_id, host, service, state, metric, time_s " +
      "FROM snap WHERE rn = 1 AND NOT EXISTS (SELECT 1 FROM ev e2 " +
      "WHERE e2.state = 'critical' AND e2.host = snap.host AND e2.service = snap.service) " +
      "ORDER BY host, service"),
    // prometheus datapoint: sanitized name + sorted labels + float value
    "q_prometheus_line" -> (EventView.oracleCteWith(
      "json_extract_string(props, '$.k') AS kstr") +
      " SELECT event_id, regexp_replace(regexp_replace(service, '[^a-zA-Z0-9_]', '_', 'g'), '_{2,}', '_', 'g') " +
      "|| '{host=' || host || ',k=' || kstr || ',state=' || state || '} ' " +
      "|| CAST(CAST(metric AS REAL) AS VARCHAR) AS line " +
      "FROM ev WHERE metric IS NOT NULL AND service IS NOT NULL ORDER BY event_id"),
    "q_graphite_path" -> (s"$cte SELECT event_id, " +
      "array_to_string(list_concat(" +
      "list_reverse(string_split(host || '.node.example.com', '.')), " +
      "string_split(regexp_replace(service || ' latency 0.95', " +
      "'(\\d+)\\.(\\d+)$', '\\2'), ' ')), '.') AS path " +
      "FROM ev ORDER BY event_id"),
    "q_opentsdb_encode" -> (s"$cte SELECT event_id, " +
      "'put ' || array_to_string(string_split(service || ' p99', ' '), '.') " +
      "|| ' ' || CAST(time_s AS VARCHAR) || ' ' || CAST(CAST(metric AS REAL) AS VARCHAR) " +
      "|| ' host=' || host AS line " +
      "FROM ev WHERE metric IS NOT NULL AND service IS NOT NULL ORDER BY event_id"),
    // datadog gauge JSON (event services/hosts/tags are alphanumeric in
    // this relation, so the escape pass is the identity on both sides)
    "q_datadog_event" -> (s"$cte SELECT event_id, " +
      "'{\"metric\":\"' || service || '\",\"type\":\"gauge\",\"host\":\"' || host " +
      "|| '\",\"tags\":[\"' || array_to_string(tags, '\",\"') " +
      "|| '\"],\"points\":[[' || CAST(time_s AS VARCHAR) || ',' || CAST(metric AS VARCHAR) || ']]}' AS entry " +
      "FROM ev WHERE metric IS NOT NULL AND service IS NOT NULL ORDER BY event_id"),
    "q_gopher_filter" -> (s"WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents), " +
      "g AS (SELECT doc_id, text, w, CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w) - 2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END AS g3 FROM t), " +
      s"m AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, " +
      "round(CAST(length(text) AS DOUBLE) / CAST(len(w) AS DOUBLE), 4) AS mean_token_len, " +
      s"CAST(len(list_filter(w, x -> list_contains($stopList, x))) AS INT) AS n_stopwords, " +
      "round(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE) / CAST(len(w) AS DOUBLE), 4) AS symbol_ratio, " +
      "round(CASE WHEN len(g3) > 0 THEN CAST(1.0 AS DOUBLE) - CAST(len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END, 4) AS dup_3gram_frac FROM g) " +
      "SELECT doc_id, n_tokens, mean_token_len, n_stopwords, symbol_ratio, dup_3gram_frac, " +
      "n_tokens >= 20 AND n_tokens <= 100000 AS ok_words, " +
      "mean_token_len >= CAST(3.0 AS DOUBLE) AND mean_token_len <= CAST(10.0 AS DOUBLE) AS ok_token_len, " +
      "n_stopwords >= 2 AS ok_stopwords, " +
      "symbol_ratio <= CAST(0.1 AS DOUBLE) AS ok_symbols, " +
      "dup_3gram_frac <= CAST(0.3 AS DOUBLE) AS ok_repetition, " +
      "(n_tokens >= 20 AND n_tokens <= 100000 AND mean_token_len >= CAST(3.0 AS DOUBLE) AND mean_token_len <= CAST(10.0 AS DOUBLE) " +
      "AND n_stopwords >= 2 AND symbol_ratio <= CAST(0.1 AS DOUBLE) AND dup_3gram_frac <= CAST(0.3 AS DOUBLE)) AS keep " +
      "FROM m ORDER BY doc_id"),
    "q_librato_gauge" -> (s"$cte SELECT event_id, " +
      "'{\"name\":\"' || substr(regexp_replace(replace(service || ' p99!!', ' ', '.'), '[^-.:_A-Za-z0-9]', '', 'g'), 1, 255) " +
      "|| '\",\"source\":\"' || substr(regexp_replace(replace(host, ' ', '.'), '[^-.:_A-Za-z0-9]', '', 'g'), 1, 255) " +
      "|| '\",\"value\":' || CAST(metric AS VARCHAR) || ',\"measure_time\":' || CAST(time_s AS VARCHAR) || '}' AS entry " +
      "FROM ev WHERE metric IS NOT NULL ORDER BY event_id"),
    "q_kairosdb_line" -> (s"$cte SELECT event_id, " +
      "'put ' || array_to_string(string_split(service || ' p50', ' '), '.') " +
      "|| ' ' || CAST(time_s * 1000 AS VARCHAR) || ' ' || CAST(CAST(metric AS REAL) AS VARCHAR) " +
      "|| ' host=' || host AS line " +
      "FROM ev WHERE metric IS NOT NULL AND service IS NOT NULL ORDER BY event_id"),
    // ---- r7 sink payload oracles. descCte mirrors withDerivedDesc.
    "q_slack_message" -> (s"$descCte, esc AS (SELECT event_id, " +
      "replace(replace(replace('*Host:* ' || coalesce(host, '-') " +
      "|| ' *Service:* ' || coalesce(service, '-') " +
      "|| ' *State:* ' || coalesce(state, '-') " +
      "|| ' *Description:* ' || coalesce(description, '-') " +
      "|| ' *Metric:* ' || coalesce(CAST(metric AS VARCHAR), '-'), " +
      "'&', '&amp;'), '<', '&lt;'), '>', '&gt;') AS fb, " +
      "replace(replace(replace('Host:   ' || coalesce(host, '-') || chr(10) " +
      "|| 'Service:   ' || coalesce(service, '-') || chr(10) " +
      "|| 'State:   ' || coalesce(state, '-') || chr(10) " +
      "|| 'Description:   ' || coalesce(description, '-') || chr(10) " +
      "|| 'Metric:   ' || coalesce(CAST(metric AS VARCHAR), '-') || chr(10) " +
      "|| 'Tags:   [' || array_to_string(list_transform(tags, t -> '\"' || t || '\"'), ' ') || ']' || chr(10), " +
      "'&', '&amp;'), '<', '&lt;'), '>', '&gt;') AS fv FROM ev) " +
      "SELECT event_id, to_json({'username': 'riemann', 'channel': '#ops', " +
      "'icon_emoji': ':fire:', 'attachments': [{'fallback': fb, " +
      "'fields': [{'title': 'Riemann Event', 'value': fv, 'short': true}]}]}) AS body " +
      "FROM esc ORDER BY event_id"),
    "q_boundary_tuple" -> (s"$cte SELECT event_id, '[' " +
      "|| coalesce(to_json(CASE WHEN event_id % 7 = 0 THEN NULL ELSE host END), 'null') || ',' " +
      "|| to_json(regexp_replace(upper(regexp_replace(service, '\\s+', '_', 'g')), '[^A-Z0-9_]', '', 'g')) || ',' " +
      "|| coalesce(to_json(CASE WHEN event_id % 11 = 0 THEN NULL ELSE metric END), 'null') || ',' " +
      "|| to_json(time_s) || ']' AS t FROM ev " +
      "WHERE regexp_replace(upper(regexp_replace(service, '\\s+', '_', 'g')), '[^A-Z0-9_]', '', 'g') <> '' " +
      "ORDER BY event_id"),
    "q_cloudwatch_datapoint" -> (s"$cte SELECT event_id, " +
      "to_json({'metric_name': service, " +
      "'value': CASE WHEN event_id % 11 = 0 THEN NULL ELSE metric END, " +
      "'dimensions': [{'name': 'Host', 'value': host}]}) AS dp " +
      "FROM ev ORDER BY event_id"),
    "q_zabbix_datapoint" -> (s"$cte SELECT event_id, " +
      "to_json({'host': host, 'key': service, " +
      "'value': coalesce(CAST(CASE WHEN event_id % 11 = 0 THEN NULL ELSE metric END AS VARCHAR), ''), " +
      "'clock': time_s}) AS dp FROM ev ORDER BY event_id"),
    "q_nagios_line" -> (s"$descCte, n AS (SELECT event_id, host, service, description, " +
      "CASE WHEN event_id % 3 = 0 THEN 'error' WHEN event_id % 3 = 1 THEN NULL ELSE state END AS s2 FROM ev) " +
      "SELECT event_id, coalesce(host, '') AS nhost, " +
      "CASE WHEN s2 IN ('ok', 'warning', 'critical') THEN s2 " +
      "WHEN s2 = 'error' THEN 'critical' ELSE 'unknown' END AS nstate, " +
      "coalesce(service, '') AS nservice, coalesce(description, '') AS ndesc " +
      "FROM n ORDER BY event_id"),
    "q_xymon_status" -> (s"$descCte SELECT event_id, " +
      "'status' || CASE WHEN ttl IS NOT NULL THEN '+' || CAST(CAST(ceil(ttl / 60) AS BIGINT) AS VARCHAR) ELSE '' END " +
      "|| ' ' || replace(coalesce(host, ''), '.', ',') || '.' " +
      "|| regexp_replace(coalesce(service, ''), '(\\.| )', '_', 'g') " +
      "|| ' ' || coalesce(state, 'unknown') || ' ' || coalesce(description, '') || chr(10) AS status " +
      "FROM ev ORDER BY event_id"),
    "q_blueflood_point" -> (s"$cte SELECT event_id, " +
      "to_json({'collectionTime': time_s, " +
      "'ttlInSeconds': coalesce(CAST(CASE WHEN event_id % 6 = 0 THEN NULL ELSE ttl END AS BIGINT), 2592000), " +
      "'metricValue': metric, 'metricName': host || '.' || service}) AS p " +
      "FROM ev WHERE metric IS NOT NULL ORDER BY event_id"),
    "q_druid_event" -> (s"$descCte SELECT event_id, " +
      "to_json({'host': host, 'service': service, 'state': state, " +
      "'timestamp': strftime(make_timestamp(time_s * 1000000), '%Y-%m-%dT%H:%M:%S.000') || 'Z', " +
      "'tags': tags, 'description': description, 'value': metric}) AS e " +
      "FROM ev ORDER BY event_id"),
    "q_netuitive_element" -> (s"$cte SELECT event_id, " +
      "to_json({'id': 'Riemann:' || coalesce(host, ''), 'name': host, 'type': 'Riemann', " +
      "'metrics': [{'id': mid}], " +
      "'samples': [{'metricId': mid, 'timestamp': time_s * 1000, 'val': metric}], " +
      "'tags': list_transform(tags, t -> {'name': t, 'value': 'true'})}) AS e " +
      "FROM (SELECT *, array_to_string(string_split(coalesce(service || ' p95', ''), ' '), '.') AS mid FROM ev) " +
      "ORDER BY event_id"),
    "q_shinken_form" -> (s"$cte SELECT event_id, " +
      "CAST(time_s AS VARCHAR) AS time_stamp, coalesce(host, '') AS host_name, " +
      "coalesce(service, '') AS service_description, coalesce(state, '') AS return_code, " +
      "coalesce(CAST(metric AS VARCHAR), '') AS output FROM ev ORDER BY event_id"),
    "q_pushover_fields" -> (s"$cte, p AS (SELECT event_id, host, service, metric, time_s, " +
      "CASE WHEN event_id % 4 = 0 THEN 'emergency' WHEN event_id % 4 = 1 THEN 'info' ELSE state END AS s2 FROM ev) " +
      "SELECT event_id, coalesce(host, '') || ' ' || coalesce(service, '') AS title, " +
      "coalesce(host, '') || ' ' || coalesce(service, '') || ' is ' || coalesce(s2, '') " +
      "|| ' (' || coalesce(CAST(metric AS VARCHAR), '') || ')' AS message, " +
      "CAST(CASE WHEN s2 IN ('ok', 'error') THEN 0 WHEN s2 = 'info' THEN -2 " +
      "WHEN s2 = 'warning' THEN -1 WHEN s2 = 'critical' THEN 1 " +
      "WHEN s2 = 'emergency' THEN 2 ELSE -1 END AS VARCHAR) AS priority, " +
      "CAST(time_s AS VARCHAR) AS timestamp FROM p ORDER BY event_id"),
    "q_logstash_line" -> (s"$cte SELECT event_id, " +
      "to_json({'host': host, 'service': service, 'state': state, " +
      "'metric': CASE WHEN event_id % 11 = 0 THEN NULL ELSE metric END, " +
      "'time_s': time_s, 'source': host}) AS line FROM ev ORDER BY event_id"),
    "q_logentries_line" -> (s"$descCte SELECT event_id, " +
      "CASE WHEN description IS NOT NULL THEN description || ',' ELSE '' END " +
      "|| ' host=''' || coalesce(host, '') || ''' service=''' || coalesce(service, '') " +
      "|| ''' state=''' || coalesce(state, '') || ''' metric=''' || coalesce(CAST(metric AS VARCHAR), '') " +
      "|| ''' time=''' || CAST(time_s AS VARCHAR) || '''' AS line FROM ev ORDER BY event_id"),
    "q_hipchat_message" -> (s"$descCte, h AS (SELECT event_id, host, service, metric, description, " +
      "CASE WHEN event_id % 3 = 0 THEN 'error' WHEN event_id % 3 = 1 THEN NULL ELSE state END AS s2 FROM ev) " +
      "SELECT event_id, 'Host: ' || coalesce(host, '') || ' ' || chr(10) " +
      "|| 'Service: ' || coalesce(service, '') || ' ' || chr(10) " +
      "|| 'State: ' || coalesce(s2, '') || ' ' || chr(10) " +
      "|| 'Metric: ' || coalesce(CAST(metric AS VARCHAR), '') || ' ' || chr(10) " +
      "|| 'Description: ' || coalesce(description, '') AS msg, " +
      "CASE WHEN s2 = 'ok' THEN 'green' WHEN s2 IN ('critical', 'error') THEN 'red' " +
      "ELSE 'yellow' END AS color FROM h ORDER BY event_id"),
    "q_msteams_section" -> (s"$descCte SELECT event_id, " +
      "to_json({'title': coalesce(service, '') || ' is ' || coalesce(state, ''), " +
      "'facts': [{'name': 'Service', 'value': service}, {'name': 'Host', 'value': host}, " +
      "{'name': 'Metric', 'value': CAST(metric AS VARCHAR)}, {'name': 'State', 'value': state}, " +
      "{'name': 'Description', 'value': description}, " +
      "{'name': 'Tags', 'value': array_to_string(tags, ', ')}]}) AS section " +
      "FROM ev ORDER BY event_id"),
    "q_telegram_text" -> (s"$descCte SELECT event_id, " +
      "'*Host:* ' || coalesce(host, '-') || chr(10) " +
      "|| '*Service:* ' || coalesce(service, '-') || chr(10) " +
      "|| '*State:* ' || coalesce(state, '-') || chr(10) " +
      "|| '*Metric:* ' || coalesce(CAST(metric AS VARCHAR), '-') || chr(10) " +
      "|| '*Description:* ' || coalesce(description, '-') AS text " +
      "FROM ev ORDER BY event_id"),
    "q_opsgenie_body" -> {
      val sep = "￿" // opsgenie.clj:43 joiner
      s"$descCte SELECT event_id, " +
        "to_json({'message': coalesce(host, '') || ': [' || coalesce(state, '') || '] ' || coalesce(service, ''), " +
        "'description': 'Host: ' || coalesce(host, '') || ' ' || chr(10) " +
        "|| 'Service: ' || coalesce(service, '') || ' ' || chr(10) " +
        "|| 'State: ' || coalesce(state, '') || ' ' || chr(10) " +
        "|| 'Metric: ' || coalesce(CAST(metric AS VARCHAR), '') || ' ' || chr(10) " +
        "|| 'Description: ' || coalesce(description, ''), " +
        s"'alias': substr(md5(host || '$sep' || service || '$sep' || array_to_string(list_sort(tags), '$sep')), 1, 15), " +
        "'user': 'Riemann', 'tags': tags}) AS body FROM ev ORDER BY event_id"
    },
    "q_victorops_body" -> (s"$cte SELECT event_id, " +
      "to_json({'message_type': 'CRITICAL', " +
      "'entity_id': coalesce(host, '') || '/' || coalesce(service, ''), " +
      "'timestamp': time_s, 'state_start_time': time_s, " +
      "'state_message': coalesce(host, '') || ' ' || coalesce(service, '') || ' is ' " +
      "|| coalesce(state, '') || ' (' || coalesce(CAST(metric AS VARCHAR), '') || ')', " +
      "'entity_is_host': false, 'monitoring_tool': 'riemann'}) AS body " +
      "FROM ev ORDER BY event_id"),
    "q_pagerduty_v1" -> (s"$cte SELECT event_id, " +
      "to_json({'service_key': 'rk', 'event_type': 'trigger', " +
      "'incident_key': coalesce(host, '') || ' ' || coalesce(service, ''), " +
      "'description': coalesce(host, '') || ' ' || coalesce(service, '') || ' is ' " +
      "|| coalesce(state, '') || ' (' || coalesce(CAST(metric AS VARCHAR), '') || ')', " +
      "'details': CAST(to_json({'host': host, 'service': service, 'state': state, " +
      "'metric': metric, 'time_s': time_s}) AS VARCHAR)}) AS body " +
      "FROM ev ORDER BY event_id"),
    "q_pagerduty_v2" -> (s"$cte SELECT event_id, " +
      "to_json({'routing_key': 'rk', 'event_action': 'trigger', " +
      "'payload': {'summary': coalesce(host, '') || ' - ' || coalesce(service, '') || ' is ' " +
      "|| coalesce(state, '') || ' (' || coalesce(CAST(metric AS VARCHAR), '') || ')', " +
      "'source': host, 'severity': state, " +
      "'timestamp': strftime(make_timestamp(time_s * 1000), '%Y-%m-%dT%H:%M:%S.%g') || 'Z', " +
      "'custom_details': CAST(to_json({'host': host, 'service': service, 'state': state, " +
      "'metric': metric, 'time_s': time_s}) AS VARCHAR)}, " +
      "'dedup_key': 'dk-' || host}) AS body FROM ev ORDER BY event_id"),
    "q_stackdriver_point" -> (s"$cte SELECT event_id, " +
      "to_json({'name': regexp_replace(service || ' x  y', '\\s+', '.', 'g'), " +
      "'value': metric, 'collected_at': time_s}) AS p " +
      "FROM ev WHERE metric IS NOT NULL ORDER BY event_id"),
    "q_keenio_body" -> (s"$cte SELECT event_id, " +
      "to_json({'host': host, 'service': service, 'state': state, " +
      "'metric': CASE WHEN event_id % 11 = 0 THEN NULL ELSE metric END, " +
      "'time_s': time_s}) AS body FROM ev ORDER BY event_id"),
    // the config-file pipeline gate: ops applied in file order — the
    // `checked` projection sees the pre-scale metric, `scale` halves it
    "q_config_pipeline" -> (s"$cte SELECT event_id, host, service, state, " +
      "metric * 0.5 AS metric, metric * 2 AS checked, 'none' AS description " +
      "FROM ev WHERE metric IS NOT NULL AND state <> 'ok' " +
      "AND (service = 'error' OR metric > 120) ORDER BY event_id")
  )

  /** The skew-hardened temporal forms (time-bucketed as-of, chunked
    * sessionize — Temporal.scala) compute the SAME relation as their
    * single-window originals: a different physical plan, identical
    * semantics. They share the oracle SQL verbatim, so the correctness
    * gate proves the plan rewrite changed nothing. */
  val sql: Map[String, String] = base ++ Map(
    "q_asof_bucketed" -> base("q_asof_join"),
    "q_sessionize_bucketed" -> base("q_sessionize"))
}
