package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.EventView
import graft.operators.{Combine, Index, Streams, Windows}
import graft.operators.Streams.EventOps
import graft.functions.Folds
import graft.pipeline.{Curation, Dedup, Similarity, Sketches, TextAnalysis, Unigram}
import graft.EntryShared._

/** Driver-contract queries, part 2 of the [[SparkEntry]] split:
  * multimodal plumbing / text analysis / corpus curation / sink
  * payload renderer gates. */
private[graft] object EntryPipeline {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- LLM pipeline: multimodal plumbing (media derived from documents)
    "q_frames" -> ((s, d) =>
      graft.pipeline.Multimodal.sampleFrames(
        graft.pipeline.Multimodal.deriveMedia(docs(s, d)), 500)
        .orderBy("media_id", "frame_ts")),
    // decode stub runs the real mapPartitions/iterator contract; the
    // positional byte checksum is ANSI-expressible (documents are
    // ASCII, so DuckDB's per-char unicode() equals the byte value)
    "q_media_features" -> ((s, d) => {
      val spark0 = s
      import spark0.implicits._
      graft.pipeline.Multimodal.decodeStub(
        graft.pipeline.Multimodal.deriveMedia(docs(s, d)), 8)
        .toDF().select("media_id", "modality", "n_bytes", "checksum")
        .orderBy("media_id")
    }),
    // REAL javax.imageio decode: each doc becomes an actual png/jpeg/
    // bmp file (dims derived from n_chars), then the decoder sniffs the
    // container from magic bytes and reads dims back out of the real
    // image bytes; the oracle predicts the round trip from doc columns
    "q_media_decode" -> ((s, d) => {
      val spark0 = s
      import spark0.implicits._
      graft.pipeline.Multimodal.decodeImages(
        graft.pipeline.Multimodal.syntheticImages(docsS(s, d)))
        .toDF().select("media_id", "format", "width", "height",
          "channels", "ok")
        .orderBy("media_id")
    }),
    // REAL javax.sound.sampled decode: each doc becomes an actual
    // WAV/AIFF clip (rate/channels/frames from doc columns), then the
    // decoder sniffs the container from magic bytes and parses the
    // header back out; the oracle predicts the round trip
    "q_media_audio" -> ((s, d) => {
      val spark0 = s
      import spark0.implicits._
      graft.pipeline.Multimodal.decodeAudio(
        graft.pipeline.Multimodal.syntheticAudio(docs(s, d)))
        .toDF().select("media_id", "format", "sample_rate", "channels",
          "frames", "duration_ms", "ok")
        .orderBy("media_id")
    }),
    // REAL ISO-BMFF metadata decode: each doc becomes an actual
    // minimal MP4 (ftyp + moov/mvhd/tkhd, mixing v0/v1 box layouts),
    // then the hand-rolled box parser walks the real bytes back out;
    // the oracle predicts the round trip from doc columns
    "q_media_video" -> ((s, d) => {
      val spark0 = s
      import spark0.implicits._
      graft.pipeline.Multimodal.decodeVideo(
        graft.pipeline.Multimodal.syntheticVideos(docs(s, d)))
        .toDF().select("media_id", "format", "width", "height",
          "duration_ms", "n_tracks", "ok")
        .orderBy("media_id")
    }),
    // REAL video FRAME decode: each doc becomes an actual RIFF/AVI
    // file whose movi chunks are real JPEGs (MJPEG) or raw DIBs, then
    // the chunk walker + javax.imageio decode every frame back out;
    // the oracle predicts frame count, per-frame codec and dims
    "q_media_frames_decode" -> ((s, d) => {
      val spark0 = s
      import spark0.implicits._
      graft.pipeline.Multimodal.decodeVideoFrames(
        graft.pipeline.Multimodal.syntheticAviVideos(docsS(s, d)))
        .toDF().select("media_id", "stream", "frame_idx", "codec",
          "width", "height", "ok")
        .orderBy("media_id", "frame_idx")
    }),
    // REAL animated-GIF frame decode: each doc becomes an actual
    // multi-frame GIF (JDK sequence writer), then the multi-frame GIF
    // reader extracts every frame; the oracle predicts count and dims
    "q_media_gif_frames" -> ((s, d) => {
      val spark0 = s
      import spark0.implicits._
      graft.pipeline.Multimodal.decodeGifFrames(
        graft.pipeline.Multimodal.syntheticAnimatedGifs(docsS(s, d)))
        .toDF().select("media_id", "frame_idx", "codec", "width",
          "height", "ok")
        .orderBy("media_id", "frame_idx")
    }),
    // every-Nth frame sampling: the chunk walk visits all frames but
    // only every 2nd pays the codec — the decode-cost throttle at scale
    "q_media_frames_sampled" -> ((s, d) => {
      val spark0 = s
      import spark0.implicits._
      graft.pipeline.Multimodal.decodeVideoFrames(
        graft.pipeline.Multimodal.syntheticAviVideos(docsS(s, d)), 2)
        .toDF().select("media_id", "stream", "frame_idx", "codec",
          "width", "height", "ok")
        .orderBy("media_id", "frame_idx")
    }),

    // ---- LLM pipeline: text analysis
    "q_text_stats" -> ((s, d) => TextAnalysis.tokenStats(docs(s, d))
      .orderBy("doc_id")),
    "q_quality" -> ((s, d) => TextAnalysis.qualityScores(docs(s, d))
      .orderBy("doc_id")),
    "q_langid" -> ((s, d) => TextAnalysis.langId(docs(s, d)).orderBy("doc_id")),
    // corpus-trained char-3-gram Naive Bayes LID (fit on the labeled
    // corpus, model broadcast back; fixed-point-log2 scores so the
    // oracle replays the longs exactly)
    "q_langid_ngram" -> ((s, d) =>
      TextAnalysis.langIdNgram(docsS(s, d)).orderBy("doc_id")),
    // deterministic BPE merge training (Sennrich et al. 2016): the
    // word-frequency sufficient statistic distributed, the merge loop
    // on the driver, argmax tie-broken by pair string
    "q_bpe_train" -> ((s, d) =>
      graft.pipeline.Bpe.trainMerges(docs(s, d)).orderBy("rank")),
    // encode every doc under the trained merges — token counts under
    // a REAL tokenizer, as nested codegen'd replaces (no UDF). The
    // merge list comes from the PERSISTED artifact (train-once, reused
    // by q_bpe_tokens and any later invocation; the manifest's corpus
    // fingerprint forces a retrain when the corpus changes)
    "q_bpe_encode" -> ((s, d) =>
      graft.pipeline.Bpe.encode(docs(s, d),
        graft.pipeline.Models.loadOrTrainBpe(docs(s, d),
          graft.pipeline.Models.defaultRoot(d) + "/bpe_merges"))
        .orderBy("doc_id")),
    // the materialized token sequences themselves (the training-data
    // product): full-fidelity token strings joined on the unit
    // separator, so the oracle pins every token byte in order — same
    // persisted merge list as q_bpe_encode (shared artifact)
    "q_bpe_tokens" -> ((s, d) =>
      graft.pipeline.Bpe.encodeTokens(docs(s, d),
        graft.pipeline.Models.loadOrTrainBpe(docs(s, d),
          graft.pipeline.Models.defaultRoot(d) + "/bpe_merges"))
        // null-text docs: (0, '') like the oracle's COALESCE, not
        // (size(null) = -1, null)
        .withColumn("tokens", coalesce(col("tokens"), array()))
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_bpe_tokens"),
          array_join(col("tokens"), "\u001f").as("tokens_str"))
        .orderBy("doc_id")),
    // corpus-trained bigram LM likelihood (the CCNet-style LM quality
    // filter shape, deterministic long/floor arithmetic)
    "q_lm_likelihood" -> ((s, d) =>
      TextAnalysis.bigramLikelihood(docsS(s, d)).orderBy("doc_id")),
    // DSIR importance weights toward the English slice as the target
    // domain (hashed-bigram likelihood ratios)
    "q_importance" -> ((s, d) =>
      TextAnalysis.importanceWeights(docsS(s, d),
          docsS(s, d).filter(col("lang") === "en"))
        .orderBy("doc_id")),
    // the full curation recipe with auditable per-stage attrition
    "q_curation_funnel" -> ((s, d) =>
      graft.pipeline.Curation.curationFunnel(docsS(s, d))),
    "q_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(docs(s, d))
      .orderBy("doc_id")),
    // winnowing fingerprints (Schleimer et al. 2003): codegen'd kernel,
    // fingerprint set serialized for the comparator
    "q_winnow" -> ((s, d) => TextAnalysis.winnow(docsS(s, d))
      .select(col("doc_id"), concat_ws(",",
        expr("transform(fps, h -> CAST(h AS STRING))")).as("fps"))
      .orderBy("doc_id")),
    // span-level overlap pairs via shared winnowed fingerprints: the
    // partial-verbatim-copy detector (one hash exchange on fp, capped)
    "q_winnow_overlap" -> ((s, d) =>
      graft.pipeline.Dedup.winnowOverlapPairs(docsS(s, d))
        .orderBy("doc_a", "doc_b")),
    "q_repetition" -> ((s, d) =>
      TextAnalysis.repetitionSignals(docs(s, d)).orderBy("doc_id")),
    // PII scan over deterministically planted spans (the synthetic
    // corpus carries none): the encode-then-decode gate pattern
    "q_pii" -> ((s, d) => {
      val planted = docs(s, d).withColumn("text2", concat(col("text"),
        when(col("doc_id") % 5 === 0,
          lit(" contact alice@example.com or bob.smith@mail.org"))
          .when(col("doc_id") % 5 === 1,
            lit(" server at 10.0.0.1 and 192.168.1.100"))
          .when(col("doc_id") % 5 === 2, lit(" call +1 555-123-4567"))
          .when(col("doc_id") % 5 === 3, lit(" mixed: c@d.io 8.8.8.8"))
          .otherwise(lit(""))))
      TextAnalysis.piiScan(planted, "text2").orderBy("doc_id")
    }),
    "q_tfidf" -> ((s, d) => TextAnalysis.tfIdf(docsS(s, d), 5)
      .orderBy("doc_id", "rk")),
    // Okapi BM25 ranked retrieval over a fixed query — the "find
    // documents about X" curation primitive; per-term scores rounded
    // then DECIMAL-summed so the total is addition-order independent
    "q_bm25" -> ((s, d) =>
      TextAnalysis.bm25(docsS(s, d),
        Seq("hash", "join", "spark", "window"), topK = 20)
        .orderBy("rk")),
    // decontamination: every 10th doc plays the held-out benchmark set
    "q_contamination" -> ((s, d) => {
      val all = docsS(s, d)
      TextAnalysis.contamination(all.filter(col("doc_id") % 10 =!= 0),
        all.filter(col("doc_id") % 10 === 0), 3)
        .orderBy("doc_id")
    }),

    // ---- LLM pipeline: corpus curation (caps, splits, packing)
    "q_source_cap" -> ((s, d) => Curation.sourceCap(docs(s, d), 40)
      .select("doc_id", "source", "source_rank")
      .orderBy("source", "source_rank")),
    "q_split_assign" -> ((s, d) => Curation.splitAssign(docs(s, d))
      .select("doc_id", "split_u", "split").orderBy("doc_id")),
    "q_pack" -> ((s, d) => Curation.packSequences(docs(s, d), 2048, 8)
      .orderBy("doc_id")),
    // segment-level (line) dedup: compare the reassembled text via md5
    // so the driver hashes short rows, not whole documents
    "q_segment_dedup" -> ((s, d) => Curation.segmentDedup(docs(s, d), 10)
      .select(col("doc_id"), col("n_segments"), col("n_kept"),
        md5(col("text_deduped")).as("text_hash"))
      .orderBy("doc_id")),
    // skew stress (SkewSpec's corpora at oracle scale): segment dedup
    // under a 50%-hot segment, and the LSH hot-bucket cap engaging —
    // the bench rows for these ARE the skewed-corpus evidence
    "q_skew_segment_dedup" -> ((s, d) =>
      Curation.segmentDedup(skewedDocs(s, d), 10)
        .select(col("doc_id"), col("n_segments"), col("n_kept"),
          md5(col("text_deduped")).as("text_hash"))
        .orderBy("doc_id")),
    "q_skew_lsh_capped" -> ((s, d) =>
      Dedup.lshCandidates(skewedDocs(s, d), 16, 4, 3, maxBucket = 64)
        .orderBy("doc_a", "doc_b")),
    "q_temp_sample" -> ((s, d) => Curation.temperatureSample(docs(s, d), 0.5, 0.5)
      .select(col("doc_id"), col("source"), col("n_source"),
        round(col("keep_rate"), 6).as("keep_rate"), col("sample_u"))
      .orderBy("doc_id")),
    // same mixture rule along the lang column — keyed by the TRAINED
    // classifier's predictions (langIdNgram), not the declared labels:
    // the multilingual rebalancing pipeline as it actually runs (LID
    // first, then up-sample low-resource languages toward uniform)
    // ... consuming the classifier as a PERSISTED ARTIFACT: train once
    // (first invocation saves parquet + manifest under the corpus-keyed
    // model root), every later invocation loads and applies — the
    // production tokenizer/classifier-versioned-beside-the-data shape;
    // the manifest's corpus fingerprint forces a retrain whenever the
    // corpus changes, so the cache can never serve stale predictions
    "q_temp_sample_lang" -> ((s, d) => {
      val m = graft.pipeline.Models.loadOrTrainLangId(docsS(s, d),
        graft.pipeline.Models.defaultRoot(d) + "/langid_ngram")
      val pred = TextAnalysis.langIdApply(docsS(s, d), m)
        .select(col("doc_id"), col("predicted_lang").as("lang"))
      Curation.temperatureSample(pred, 0.3, 0.5, byCol = "lang")
        .select(col("doc_id"), col("lang"), col("n_source"),
          round(col("keep_rate"), 6).as("keep_rate"), col("sample_u"))
        .orderBy("doc_id")
    }),
    // token-budget mixture planner: the per-source allocation table a
    // training run is budgeted from — temperature weights in TOKEN
    // units, the maxEpochs repetition cap, single-pass waterfilling
    // with the capped slack surfaced as `unspent`
    "q_mixture_plan" -> ((s, d) =>
      Curation.mixturePlan(docs(s, d), budgetTokens = 20000, alpha = 0.6,
        maxEpochs = 1.5, byCol = "lang")
        .orderBy("lang")),
    // unigram-LM (SentencePiece-style) tokenizer: deterministic hard-EM
    // prune loop on the driver over the distributed word-frequency
    // statistic; encode = the Viterbi DP as codegen'd column chains
    "q_unigram_train" -> ((s, d) =>
      Unigram.train(docs(s, d)).orderBy("piece")),
    // ... encoding under the PERSISTED vocab artifact (train-once,
    // shared with q_unigram_tokens; corpus-fingerprint-guarded)
    "q_unigram_encode" -> ((s, d) =>
      Unigram.encode(docsS(s, d),
        graft.pipeline.Models.loadOrTrainUnigram(docsS(s, d),
          graft.pipeline.Models.defaultRoot(d) + "/unigram_vocab"))
        .orderBy("doc_id")),
    // the materialized unigram token sequences — every token byte and
    // boundary pinned in document order (the q_bpe_tokens contract
    // for the second tokenizer)
    "q_unigram_tokens" -> ((s, d) =>
      Unigram.encodeTokensDf(docs(s, d),
        graft.pipeline.Models.loadOrTrainUnigram(docs(s, d),
          graft.pipeline.Models.defaultRoot(d) + "/unigram_vocab"))
        // null-text docs: (0, '') like the oracle's COALESCE, not
        // (size(null) = -1, null)
        .withColumn("tokens", coalesce(col("tokens"), array()))
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_unigram_tokens"),
          array_join(col("tokens"), "\u001f").as("tokens_str"))
        .orderBy("doc_id")),
    // the mixture planner budgeted in REAL tokenizer units: unigram
    // token counts joined per doc, then the same temperature math
    "q_mixture_plan_unigram" -> ((s, d) => {
      val base = docsS(s, d)
      val enc = Unigram.encode(base,
        graft.pipeline.Models.loadOrTrainUnigram(base,
          graft.pipeline.Models.defaultRoot(d) + "/unigram_vocab"))
      Curation.mixturePlan(base.join(enc, "doc_id"),
        budgetTokens = 20000, alpha = 0.6, maxEpochs = 1.5,
        byCol = "lang", tokCol = col("n_unigram_tokens"))
        .orderBy("lang")
    }),
    // cross-corpus near-dup join: dedup an incoming batch (doc_id
    // divisible by 4) against the reference corpus (the rest) — the
    // continuous-ingestion production shape; banded per side, capped
    // per side, never all-pairs
    "q_crosscorpus_neardup" -> ((s, d) =>
      Dedup.crossCorpusNearDups(
        docsS(s, d).filter(col("doc_id") % 4 === 0),
        docsS(s, d).filter(col("doc_id") % 4 =!= 0))
        .orderBy("new_id", "ref_id")),
    // cluster-balanced sampling: the temperature mixture rule over
    // embedding-space cells (topic rebalancing without labels)
    "q_cluster_sample" -> ((s, d) =>
      Curation.clusterSample(emb(s, d), 0.5, 0.5)
        .select(col("vec_id"), col("cell"), col("n_cell"),
          round(col("keep_rate"), 6).as("keep_rate"), col("sample_u"))
        .orderBy("vec_id")),
    // deterministic HyperLogLog distinct-user sketch per event type,
    // audited against the exact count — every step md5-derived and
    // replayed exactly by the oracle (no engine-internal HLL++ state)
    "q_hll_distinct" -> ((s, d) =>
      Sketches.hllDistinct(
        s.read.parquet(s"$d/events.parquet"),
        Seq("event_type"), "user_id")
        .orderBy("event_type")),
    // count-min frequency sketch audited against exact counts —
    // additive cells, so deterministic + mergeable + replayed exactly;
    // over_err >= 0 is the CMS one-sided-error contract
    "q_cms_counts" -> ((s, d) =>
      Sketches.cmsFrequencies(
        s.read.parquet(s"$d/events.parquet"), "user_id")
        .orderBy("user_id")),
    // HDR-histogram quantile sketch (the quantile member of the sketch
    // family): pure-integer log-linear buckets over the scaled metric,
    // nearest-rank p50/p90/p99 per event type audited against the
    // exact sort — under_err >= 0 and the 2^-sb relative bound are the
    // one-sided contract, checked per row
    "q_hdr_quantiles" -> ((s, d) =>
      Sketches.hdrQuantilesAudit(
        s.read.parquet(s"$d/events.parquet"), Seq("event_type"),
        floor(col("value") * 1000).cast("long"), Seq(500, 900, 990))
        .orderBy("event_type", "q_milli")),
    // CMS heavy hitters in the two-pass shape: the broadcast-literal
    // sketch filters rows map-side BEFORE the only shuffle, so the
    // groupBy carries heavy candidates alone; the hot/cold synthesized
    // key keeps relative frequencies scale-invariant (3 hot values at
    // ~10% each vs a long cold tail), and zero false negatives is the
    // CMS one-sided contract
    // r22: both CMS passes (4 md5 hashes per row each) ran single-task
    // over the one-split test scan (job log: 0.44 s + 0.60 s, 1 task
    // each) — spread on the unique event_id parallelizes them; hh_key
    // itself is deliberately hot (3 keys ≈ 30%) so it must NOT be the
    // spread key
    "q_cms_heavy" -> ((s, d) =>
      Sketches.cmsHeavyHitters(
        EntryShared.spread(s.read.parquet(s"$d/events.parquet"),
            col("event_id"))
          .select(when(col("user_id") % 10 < 3,
              concat(lit("hot:"), (col("user_id") % 3).cast("string")))
            .otherwise(concat(lit("cold:"), col("user_id").cast("string")))
            .as("hh_key")),
        "hh_key", phiMilli = 50)
        .orderBy("hh_key")),
    // changed with :pairs? — the previous value rides along with each
    // transition (streams_test.clj changed-test "with previous event")
    "q_changed_pairs" -> ((s, d) =>
      Windows.changed(ev(s, d), "state", Seq("host"), init = Some("ok"))
        .select("event_id", "host", "prev_value", "state")
        .orderBy("event_id")),
    // email formatter (common.clj subject/body, email.clj mailer)
    "q_email_subject" -> ((s, d) =>
      graft.sinks.Email.subject(evs(s, d), Seq("service"))
        .orderBy("service")),
    "q_email_body" -> ((s, d) => evs(s, d)
      .select(col("event_id"),
        md5(graft.sinks.Email.bodyBlock()).as("body_hash"))
      .orderBy("event_id")),
    // delete-from-index: every pkey that ever went critical is removed
    // from the snapshot via the broadcast anti-join
    "q_index_delete" -> ((s, d) => {
      val e = ev(s, d)
      Index.delete(Index.snapshot(e), e.filter(col("state") === "critical"))
        .select("event_id", "host", "service", "state", "metric", "time_s")
        .orderBy("host", "service")
    }),
    // prometheus exposition datapoint (name sanitize + labels + float)
    "q_prometheus_line" -> ((s, d) => evs(s, d)
      .filter(col("metric").isNotNull && col("service").isNotNull)
      .select(col("event_id"), graft.sinks.Metrics.prometheusLine.as("line"))
      .orderBy("event_id")),
    // graphite path rendering: reversed fqdn + dotted service with the
    // percentile-suffix collapse
    "q_graphite_path" -> ((s, d) => ev(s, d)
      .withColumn("host", concat(col("host"), lit(".node.example.com")))
      .withColumn("service", concat(col("service"), lit(" latency 0.95")))
      .select(col("event_id"),
        graft.sources.LineProtocols.graphitePathPercentiles.as("path"))
      .orderBy("event_id")),
    // opentsdb put-line encode (the decode counterpart is
    // q_opentsdb_decode): round-trip-able through decodeOpenTsdb
    "q_opentsdb_encode" -> ((s, d) => ev(s, d)
      .filter(col("metric").isNotNull && col("service").isNotNull)
      .withColumn("service", concat(col("service"), lit(" p99")))
      .select(col("event_id"), graft.sinks.Metrics.opentsdbLine.as("line"))
      .orderBy("event_id")),
    // datadog series entry: byte-exact gauge JSON per event
    "q_datadog_event" -> ((s, d) => evs(s, d)
      .filter(col("metric").isNotNull && col("service").isNotNull)
      .select(col("event_id"), graft.sinks.Metrics.datadogEvent.as("entry"))
      .orderBy("event_id")),
    // combined Gopher-rules quality filter (minWords=20 so the corpus
    // mixes keep/drop outcomes at test scale)
    "q_gopher_filter" -> ((s, d) =>
      TextAnalysis.gopherFilter(docs(s, d), minWords = 20)
        .orderBy("doc_id")),
    // librato gauge JSON with the safe-name sanitizer exercised
    "q_librato_gauge" -> ((s, d) => evs(s, d)
      .filter(col("metric").isNotNull)
      .withColumn("service", concat(col("service"), lit(" p99!!")))
      .select(col("event_id"), graft.sinks.Metrics.libratoGauge.as("entry"))
      .orderBy("event_id")),
    // kairosdb telnet metric (millisecond timestamps)
    "q_kairosdb_line" -> ((s, d) => ev(s, d)
      .filter(col("metric").isNotNull && col("service").isNotNull)
      .withColumn("service", concat(col("service"), lit(" p50")))
      .select(col("event_id"), graft.sinks.Metrics.kairosdbLine.as("line"))
      .orderBy("event_id")),
    // ---- r7: sink payload renderers promoted from spec-only to
    // oracle-gated (slack.clj / boundary.clj / cloudwatch.clj /
    // zabbix.clj / nagios.clj / xymon.clj). Derived null columns
    // exercise the nil-rendering paths the oracle can now pin.
    "q_slack_message" -> ((s, d) => withDerivedDesc(evs(s, d))
      .select(col("event_id"),
        graft.sinks.Alerting.slackMessage("riemann", "#ops", ":fire:")
          .as("body"))
      .orderBy("event_id")),
    // the 4-tuple stays aligned with explicit nulls (the boundary.clj
    // contract) — null host AND null metric rows included
    "q_boundary_tuple" -> ((s, d) => evs(s, d)
      .withColumn("host", when(col("event_id") % 7 === 0,
        lit(null).cast("string")).otherwise(col("host")))
      .withColumn("metric", when(col("event_id") % 11 === 0,
        lit(null).cast("double")).otherwise(col("metric")))
      .withColumn("_mid",
        graft.sinks.Forwarders.boundarify(col("service"), None))
      .filter(col("_mid") =!= "")
      .select(col("event_id"), graft.sinks.Forwarders.boundaryTuple.as("t"))
      .orderBy("event_id")),
    // unfiltered: null metric proves cheshire-style explicit-null JSON
    "q_cloudwatch_datapoint" -> ((s, d) => evs(s, d)
      .withColumn("metric", when(col("event_id") % 11 === 0,
        lit(null).cast("double")).otherwise(col("metric")))
      .select(col("event_id"),
        graft.sinks.Forwarders.cloudwatchDatapoint.as("dp"))
      .orderBy("event_id")),
    "q_zabbix_datapoint" -> ((s, d) => evs(s, d)
      .withColumn("metric", when(col("event_id") % 11 === 0,
        lit(null).cast("double")).otherwise(col("metric")))
      .select(col("event_id"),
        graft.sinks.Forwarders.zabbixDatapoint.as("dp"))
      .orderBy("event_id")),
    // error folds to critical, null state to unknown, nils render ""
    "q_nagios_line" -> ((s, d) => withDerivedDesc(ev(s, d))
      .withColumn("state", when(col("event_id") % 3 === 0, lit("error"))
        .when(col("event_id") % 3 === 1, lit(null).cast("string"))
        .otherwise(col("state")))
      .select(col("event_id") +: graft.sinks.Forwarders.nagiosFields: _*)
      .orderBy("event_id")),
    "q_xymon_status" -> ((s, d) => withDerivedDesc(evs(s, d))
      .select(col("event_id"),
        graft.sinks.Forwarders.xymonStatus.as("status"))
      .orderBy("event_id")),
    // blueflood ingest point; null ttl proves the 30-day default
    "q_blueflood_point" -> ((s, d) => evs(s, d)
      .withColumn("ttl", when(col("event_id") % 6 === 0,
        lit(null).cast("double")).otherwise(col("ttl")))
      .filter(col("metric").isNotNull)
      .select(col("event_id"), graft.sinks.Forwarders.bluefloodPoint.as("p"))
      .orderBy("event_id")),
    // druid tranquility event: ISO8601 UTC timestamp, explicit nulls
    "q_druid_event" -> ((s, d) => withDerivedDesc(evs(s, d))
      .select(col("event_id"), graft.sinks.Forwarders.druidEvent.as("e"))
      .orderBy("event_id")),
    // netuitive element: service-with-spaces exercises the dot mapping
    "q_netuitive_element" -> ((s, d) => evs(s, d)
      .withColumn("service", concat(col("service"), lit(" p95")))
      .select(col("event_id"),
        graft.sinks.Forwarders.netuitiveElement("Riemann").as("e"))
      .orderBy("event_id")),
    // shinken ws-arbiter form fields (nils render "")
    "q_shinken_form" -> ((s, d) => ev(s, d)
      .select(col("event_id") +: graft.sinks.Forwarders.shinkenFields: _*)
      .orderBy("event_id")),
    // pushover form fields incl. the full state->priority table
    "q_pushover_fields" -> ((s, d) => ev(s, d)
      .withColumn("state", when(col("event_id") % 4 === 0, lit("emergency"))
        .when(col("event_id") % 4 === 1, lit("info"))
        .otherwise(col("state")))
      .select(col("event_id"),
        graft.sinks.Notifiers.pushoverTitle.as("title"),
        graft.sinks.Notifiers.pushoverMessage.as("message"),
        graft.sinks.Notifiers.pushoverPriority.cast("string").as("priority"),
        col("time_s").cast("string").as("timestamp"))
      .orderBy("event_id")),
    // logstash wire JSON; null metric proves the explicit-null field
    "q_logstash_line" -> ((s, d) => evs(s, d)
      .withColumn("metric", when(col("event_id") % 11 === 0,
        lit(null).cast("double")).otherwise(col("metric")))
      .select(col("event_id"),
        graft.sinks.Notifiers.logstashLine.as("line"))
      .orderBy("event_id")),
    // logentries k='v' line; null description drops the leading clause
    "q_logentries_line" -> ((s, d) => withDerivedDesc(evs(s, d))
      .select(col("event_id"),
        graft.sinks.Notifiers.logentriesLine.as("line"))
      .orderBy("event_id")),
    // hipchat block + card color (error folds red, null folds yellow)
    "q_hipchat_message" -> ((s, d) => withDerivedDesc(evs(s, d))
      .withColumn("state", when(col("event_id") % 3 === 0, lit("error"))
        .when(col("event_id") % 3 === 1, lit(null).cast("string"))
        .otherwise(col("state")))
      .select(col("event_id"),
        graft.sinks.Notifiers.hipchatMessage.as("msg"),
        graft.sinks.Notifiers.hipchatColor.as("color"))
      .orderBy("event_id")),
    // msteams MessageCard section: explicit-null facts for nil fields
    "q_msteams_section" -> ((s, d) => withDerivedDesc(evs(s, d))
      .select(col("event_id"), graft.sinks.Sinks.cheshireJson(
        graft.sinks.Alerting.msteamsSection).as("section"))
      .orderBy("event_id")),
    "q_telegram_text" -> ((s, d) => withDerivedDesc(ev(s, d))
      .select(col("event_id"),
        graft.sinks.Alerting.telegramText("Markdown").as("text"))
      .orderBy("event_id")),
    // opsgenie body incl. the deterministic md5 alias over
    // (host, service, sorted tags)
    "q_opsgenie_body" -> ((s, d) => withDerivedDesc(evs(s, d))
      .select(col("event_id"), graft.sinks.Alerting.opsgenieBody.as("body"))
      .orderBy("event_id")),
    "q_victorops_body" -> ((s, d) => evs(s, d)
      .select(col("event_id"),
        graft.sinks.Alerting.victoropsBody("CRITICAL").as("body"))
      .orderBy("event_id")),
    "q_pagerduty_v1" -> ((s, d) => evs(s, d)
      .select(col("event_id"),
        graft.sinks.Alerting.pagerdutyV1Body("rk", "trigger").as("body"))
      .orderBy("event_id")),
    // v2 body: derived dedup-key attribute exercises the element_at
    // extraction; the seconds-as-millis 1970-era timestamp quirk is
    // reproduced bit-faithfully on both sides
    "q_pagerduty_v2" -> ((s, d) => evs(s, d)
      .withColumn("attributes", map_concat(col("attributes"),
        map(lit("dedup-key"), concat(lit("dk-"), col("host")))))
      .select(col("event_id"),
        graft.sinks.Alerting.pagerdutyV2Body("rk", "trigger").as("body"))
      .orderBy("event_id")),
    // stackdriver point: whitespace runs in the name collapse to dots
    "q_stackdriver_point" -> ((s, d) => evs(s, d)
      .withColumn("service", concat(col("service"), lit(" x  y")))
      .filter(col("metric").isNotNull)
      .select(col("event_id"),
        graft.sinks.Forwarders.stackdriverPoint.as("p"))
      .orderBy("event_id")),
    // keenio event body; null metric proves the explicit-null field
    "q_keenio_body" -> ((s, d) => evs(s, d)
      .withColumn("metric", when(col("event_id") % 11 === 0,
        lit(null).cast("double")).otherwise(col("metric")))
      .select(col("event_id"),
        graft.sinks.Notifiers.keenioBody.as("body"))
      .orderBy("event_id")),

    // ---- config-file surface: a literal JSON pipeline (where ->
    // riemann-query -> with -> default -> scale -> select) compiled by
    // graft.config.ConfigFile onto the event view — proves the file
    // surface produces the exact relation the equivalent SQL does
    "q_config_pipeline" -> ((s, d) => {
      val spec = org.json4s.jackson.JsonMethods.parse(
        """{"name":"gate","pipeline":[
          |  {"op":"where","expr":"metric IS NOT NULL AND state <> 'ok'"},
          |  {"op":"query","q":"service = \"error\" or metric > 120"},
          |  {"op":"with","set":{"checked":"metric * 2"}},
          |  {"op":"default","set":{"description":"'none'"}},
          |  {"op":"scale","factor":0.5},
          |  {"op":"select","cols":["event_id","host","service","state",
          |    "metric","checked","description"]}
          |]}""".stripMargin).asInstanceOf[org.json4s.JObject]
      graft.config.ConfigFile.compilePipeline(ev(s, d), spec)
        .orderBy("event_id")
    })
  )
}
