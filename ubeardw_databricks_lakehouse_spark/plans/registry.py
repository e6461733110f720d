"""Query registry — the single source for __spark_entry__.queries() /
oracle_sql() and for bench.py's headline set.

Every entry pairs a Spark implementation with its DuckDB oracle SQL
(None only for genuinely non-SQL-reproducible ops, e.g. ANN with
recall<1 — the driver then records a rows-only check).

ORDERING CONTRACT (evidence rotation): the correctness driver evaluates
only the FIRST 50 entries each round. Entries are DEFINED below grouped
by theme (the r1-r3 tier layout, kept for history), and the effective
order is set by the explicit ``_WINDOW`` list at the bottom: its 50
names become positions 1-50 for the next driver run; everything else
keeps its definition order behind them.

Rotation rule (enforced by tests/test_registry_order.py; the next
window is computed mechanically by tools/rotation_plan.py — run it
right after the driver drops a CORRECTNESS report): no query may
go two consecutive rounds unchecked — every entry whose latest green
evidence is two or more CORRECTNESS reports old, plus every entry with
no green evidence at all, must be inside the window. Entries whose
underlying operator code changed in the current round should be
re-windowed too (judgment call, noted per round below).

CAPACITY NOTE for r5+: at 120 registry entries the strict 2-round rule
exceeds the 50-slot/round budget (steady state needs ceil(120/50)=3
rounds per full pass). From r5 the window rotates on a 3-round cycle
(oldest-evidence-first), and the per-round staleness backstop is the
IN-REPO full gate mirror: `tools/oracle_sweep.py` runs EVERY
oracle-paired entry vs DuckDB at sf0.01 (the driver's scale) each
round — 113/113 green on 2026-08-14. test_registry_order's two-report
freshness horizon widens to three when the constraint first binds.
r7 UPDATE (168 entries at round close): the horizon is now the
steady-state minimum ceil(|registry|/50) — 4 at 151-200 entries. The
simulated ledger after CORRECTNESS_r07 lands: cohorts r5=44, r6=50,
r7=50, never-graded=24 (_DEFERRED_NEW); under horizon 4 the per-round
demand sequence is r8: 24 (+26 free slots pulling the oldest r5
cohort forward), r9: <=44, r10: 50, r11: 50 — always satisfiable.
Under the old horizon 3 the r8 demand would have been 44+17=61 > 50,
structurally red. Sweeps on 2026-08-15: 147/147, then 150/150, then
152/152 green at sf0.01 as the batches landed; 153/153 at close.
r8 UPDATE: window rotated per the r7 verdict (#1) — 24 deferred + 26
oldest-r5; _DEFERRED_NEW emptied then refilled with exactly ONE
genuinely-new-class entry (q_seasonal_decomposition — the
decomposition/forecast class) under the verdict's <=5 budget;
registry closes r8 at 169 entries, horizon still 4 (#2).
r8 sweep on 2026-08-15: 154/154 green at sf0.01 (367 s) on the tree
carrying the review fixes (containment prefix bound, benford >= 1,
bfs seed filter) and the linkage/graph-amortization work; full pytest
421 passed.
Note the accepted cadence: the forward-looking staleness test goes red
the moment CORRECTNESS_r08.json lands (the 18 unrotated r5 entries'
evidence falls off the horizon) and the r9 rotation — 18 + up to 32
oldest-r6 pulled forward — fixes it first thing, exactly as r6→r7 and
r7→r8 did.
r9 UPDATE: rotation delivered exactly as prescribed (18 r5-stale +
q_seasonal_decomposition + 31 oldest-r6; _DEFERRED_NEW emptied then
refilled with ONE genuinely-new-class entry, q_peak_concurrency — the
interval-algebra / sweep-line class). Registry closes r9 at 170
entries, horizon still 4; r10 demand = 19 remaining-r6 + 1 deferred +
30 free slots pulling the oldest-r7 cohort forward. r9 sweeps:
156/156 green at sf0.01 (194-206 s across three full-gate runs);
full pytest 460→463 green as the round's tests landed.
r10 UPDATE: rotation delivered exactly as prescribed (19 r6-stale +
q_peak_concurrency + 30 oldest-r7 in definition order; _DEFERRED_NEW
emptied). Ledger after r09 mechanically recomputed this round:
r6=19, r7=50, r8=50, r9=50, never-graded=1 — matches the r9 verdict
and the staleness test's printed list element-for-element. Horizon
stays 4 = ceil(|registry|/50); demand r11 = 20 remaining-r7 +
deferred + free slots. Registry closes r10 at 174 entries (four
additions in the deferred lane, inside the <=5 budget:
q_quantile_sketch, q_weighted_sample, q_spatial_neighbors,
q_lpa_communities).
r10 gates on the final tree: oracle sweep 159/159 exact at sf0.01
(203 s) AND 159/159 exact at sf0.1 (2,088 s — first full-battery
bench-scale sweep; earlier full-gate runs 157/157 as the additions
landed; final HEAD gates after the NaN-coordinate fix and the
weighted-LPA extension: sweep 159/159 at 187 s, full pytest 505),
full pytest 474→478→498→499→501→505 green as the round's tests
landed;
BENCH_REPS=3 medians committed as BENCH_MEDIANS_r10.json (39 entries,
suite 69.3 s with the two new bench entries; the CC edge-recompute
fix took q_curated_corpus 10.33 -> 5.93 s mid-round, and the final
sample's uniform 1.09x common-37 drift is host load, analyzed in
SCALING.md).
r11 UPDATE: rotation delivered exactly as prescribed (20 r7-stale +
the four r10 deferred additions at positions 21-24 + 26 oldest-r8 in
definition order; _DEFERRED_NEW emptied) — after first FIXING
tools/rotation_plan.py, whose one-extra-report lookahead demanded an
unsatisfiable 74 slots and truncated the never-graded lane out of
the window (see the tool's docstring note). Ledger after r10:
r7=20, r8=50, r9=50, r10=50, never=4. Registry closes r11 at 175
entries (ONE addition in the deferred lane, inside the <=5 budget:
q_kcore_parts — the density-filtering graph class; fixpoint-stable
peel makes its fixed-R CTE replay exact at any R). Horizon stays
4 = ceil(175/50); demand r12 = 24 remaining-r8 + 1 deferred + 25
free slots pulling the oldest-r9 cohort forward.
r11 gates on the final tree: oracle sweep 160/160 exact at sf0.01
(281 s) AND 160/160 exact at sf0.1 (2,232 s — the bench-scale
certification, the r10 precedent repeated), full pytest 515 green
(the r11 tests: kcore battery, CC-auto engine selection, LPA input
guards, spatial half-neighborhood + SHUFFLE_HASH equivalence,
release_local_checkpoint shape pins); BENCH_MEDIANS_r11.json
committed at 5 reps (41 entries incl. the new t-digest
merge-vs-rebuild pair), diffed vs r10 with tools/bench_diff.py.
r12 UPDATE: rotation delivered exactly as prescribed by
tools/rotation_plan.py run first thing (24 r8-stale + q_kcore_parts +
25 oldest-r9 in definition order; _DEFERRED_NEW emptied then refilled
with ONE genuinely-new-class entry, q_neardup_incremental — the
incremental/continuous-ingest near-dup class: delta bands probe a
materialized LSH band index, O(delta) candidates where the existing
signature-reuse entry still self-joins all corpus bands). Ledger
after r11: r8=24, r9=50, r10=50, r11=50, never=1. Registry closes
r12 at 176 entries; horizon stays 4 = ceil(176/50); demand r13 = 25
remaining-r9 + 1 deferred + 24 free slots pulling the oldest-r10
cohort forward.
r12 gates on the final tree: oracle sweep 161/161 exact at sf0.01
(222 s) AND 161/161 exact at sf0.1 (2,198 s — the bench-scale
certification, third round running), full pytest 525 green (519 at
the mid-round gate; the r12 tests: neardup_upsert batch-equivalence
+ planted cross-split pair, streaming incremental-neardup
convergence + crash-replay idempotence, SHUFFLE_HASH_AUTO pair-set
equality + derived-width plan pin, release_local_checkpoint
allow_projection gate, optimizeWrite file layout, bench tooling);
BENCH_MEDIANS_r12 committed at 5 reps from a final-HEAD run
(shared-41 vs r11 = 1.07x, max entry 1.33x), diffed vs r11 with
tools/bench_diff.py (which now prints both runs' loadavg, and
bench.py stamps degraded:true when the start load exceeds
BENCH_MAX_START_LOAD); the anomalous first medians run stays
committed as BENCH_MEDIANS_r12_run1.json with its adjudication in
SCALING.md.

r4 window rationale: the 45 entries that held tier-5 positions 51-95 in
r3 carry CORRECTNESS_r02 evidence (two rounds stale after r4) -> all in.
q_token_stats was r3's one red row (oracle HUGEINT cast, fixed) -> in.
Four r4-new queries (q_embedding_dedup_fast, q_repetition_profile,
q_unigram_lm, q_dsir) have no evidence -> in. q_time_travel /
q_ivm_refresh / q_sequence_packing are r3-green with operators changed
in r4 (CDF _commit_version, IVM watermark, ROWS-frame cumsum); no
window slots remain, so their re-confirmation is the in-repo simulated
gate (all 50 window entries + these three green vs DuckDB at sf0.01 on
2026-08-14) plus the new unit tests — they rotate back in next round.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import curation_q, dims_q, events_q, llm_q, relational


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


QUERIES: list[QueryDef] = [
    # ----------------------------------------------------------------
    # Tier 1 — never driver-green. r1: env/hash fail; r2: past the
    # 50-entry window (or canonicalizer err). Highest evidence priority.
    # ----------------------------------------------------------------
    QueryDef("q_lang_quality", llm_q.q_lang_quality, llm_q.Q_LANG_QUALITY_SQL,
             "lang-ID confusion rollup + quality mass"),
    QueryDef("q_geo_enrichment", llm_q.q_geo_enrichment,
             llm_q.Q_GEO_ENRICHMENT_SQL,
             "vectorized geohash/H3/timezone enrichment (U1-U3), "
             "recursive-CTE geohash oracle"),
    QueryDef("q_simhash", llm_q.q_simhash, llm_q.Q_SIMHASH_SQL,
             "SimHash signatures, 60 effective bits, bit-exact DuckDB oracle"),
    QueryDef("q_embedding_topk_lsh", llm_q.q_embedding_topk_lsh, None,
             "ANN top-k via hyperplane LSH (recall<1 -> rows-only check)"),
    QueryDef("q_user_event_arrays", events_q.q_user_event_arrays,
             events_q.Q_USER_EVENT_ARRAYS_SQL,
             "collect_list/array_agg surface: sorted arrays + arg_min/max "
             "(array outputs stringified for the harness; typed variant "
             "pytest-covered)"),
    QueryDef("q_approx_profile", events_q.q_approx_profile, None,
             "HLL distinct + quantile sketches (estimates are "
             "implementation-defined -> rows-only; bounds pytest-checked)"),
    # ----------------------------------------------------------------
    # Tier 2 — added in r2 (and r3), never driver-checked.
    # ----------------------------------------------------------------
    QueryDef("q_editdist_verify", llm_q.q_editdist_verify,
             llm_q.Q_EDITDIST_VERIFY_SQL,
             "edit-distance verification of LSH candidates (native "
             "levenshtein, prefix-bounded)"),
    QueryDef("q_dedup_clusters", llm_q.q_dedup_clusters,
             llm_q.Q_DEDUP_CLUSTERS_SQL,
             "near-dup clusters: connected components + canonical pick"),
    QueryDef("q_embedding_topk_ivf", llm_q.q_embedding_topk_ivf,
             llm_q.Q_EMBEDDING_TOPK_IVF_SQL,
             "IVF ANN top-k (label-cell coarse quantizer, nprobe=2)"),
    QueryDef("q_winnow_fingerprints", llm_q.q_winnow_fingerprints,
             llm_q.Q_WINNOW_FINGERPRINTS_SQL,
             "winnowing (rolling-hash selection) fingerprints — MOSS "
             "partial-overlap scheme, digest oracle-exact"),
    QueryDef("q_token_stats", llm_q.q_token_stats,
             llm_q.Q_TOKEN_STATS_SQL,
             "whitespace vs BPE-ish sub-word token accounting per "
             "language (lookaround-free oracle identity)"),
    QueryDef("q_winnow_overlap", llm_q.q_winnow_overlap,
             llm_q.Q_WINNOW_OVERLAP_SQL,
             "partial-overlap pairs via shared winnow selections "
             "(selection-hash equi-join, no cross product)"),
    QueryDef("q_time_travel", relational.q_time_travel,
             relational.Q_TIME_TRAVEL_SQL,
             "timestampAsOf twin: CDF reconstruction of the pre-mutation "
             "state hash-equals the untouched source"),
    QueryDef("q_ivm_refresh", relational.q_ivm_refresh,
             relational.Q_IVM_REFRESH_SQL,
             "incremental view maintenance: CDF-fed O(changes) refresh "
             "hash-equals the full O(table) aggregate"),
    QueryDef("q_audio_windows", llm_q.q_audio_windows,
             llm_q.Q_AUDIO_WINDOWS_SQL,
             "multimodal audio leg: windowed byte-energy features over "
             "binary payloads (Arrow mapInPandas, md5-free integer oracle)"),
    QueryDef("q_row_fingerprints", relational.q_row_fingerprints,
             relational.Q_ROW_FINGERPRINTS_SQL,
             "SCD2 row-hash (F4 sha2 idiom) + epoch/timestamp round trip "
             "(F3), oracle-exact"),
    QueryDef("q_embedding_dedup", llm_q.q_embedding_dedup,
             llm_q.Q_EMBEDDING_DEDUP_SQL,
             "SemDeDup-style embedding dedup: cosine pairs -> connected "
             "components -> canonical keep-list"),
    QueryDef("q_sequence_packing", llm_q.q_sequence_packing,
             llm_q.Q_SEQUENCE_PACKING_SQL,
             "GPT-style concat-and-split packing into 128-token training "
             "windows (shard-partitioned cumsum, integer-exact ranges)"),
    QueryDef("q_embedding_dedup_fast", llm_q.q_embedding_dedup_fast, None,
             "cluster-blocked SemDeDup (pairs within IVF cells only, "
             "O(n^2/K); rows-only — float centroids + recall<1, pytest-"
             "pinned >=0.95 vs the exact twin)"),
    QueryDef("q_neardup_verified_fast", llm_q.q_neardup_verified_fast, None,
             "near-dup pipeline, xxhash64 MinHash family (production "
             "path, 6x faster; rows-only — native hash not in DuckDB)"),
    QueryDef("q_embedding_topk_ivf_fast", llm_q.q_embedding_topk_ivf_fast, None,
             "IVF ANN, float partial-sum centroids (production path; "
             "rows-only — float training not oracle-hashable)"),
    QueryDef("q_embedding_quantized", llm_q.q_embedding_quantized,
             llm_q.Q_EMBEDDING_QUANTIZED_SQL,
             "int8 scalar quantization — engine-exact compressed codes"),
    QueryDef("q_frame_sampling", llm_q.q_frame_sampling,
             llm_q.Q_FRAME_SAMPLING_SQL,
             "video frame-sample plumbing: every-Nth fixed-size frame via "
             "Arrow mapInPandas, md5-of-slice oracle"),
    QueryDef("q_pii_redaction", llm_q.q_pii_redaction,
             llm_q.Q_PII_REDACTION_SQL,
             "email/IP/phone scrub with per-kind counts"),
    QueryDef("q_sentence_split", llm_q.q_sentence_split,
             llm_q.Q_SENTENCE_SPLIT_SQL,
             "Python UDTF lateral join == declarative unnest twin"),
    QueryDef("q_contamination", curation_q.q_contamination,
             curation_q.Q_CONTAMINATION_SQL,
             "8-gram eval-set decontamination (broadcast eval grams)"),
    QueryDef("q_boilerplate_ngrams", curation_q.q_boilerplate_ngrams,
             curation_q.Q_BOILERPLATE_NGRAMS_SQL,
             "corpus trigram doc-frequency top-50 (boilerplate signal)"),
    QueryDef("q_quality_rules", curation_q.q_quality_rules,
             curation_q.Q_QUALITY_RULES_SQL,
             "Gopher-style composite keep/drop rule battery"),
    QueryDef("q_doc_top_terms", curation_q.q_doc_top_terms,
             curation_q.Q_DOC_TOP_TERMS_SQL,
             "characteristic terms per doc: integer-exact tf-idf ordering, "
             "per-doc window rank"),
    QueryDef("q_repetition_profile", curation_q.q_repetition_profile,
             curation_q.Q_REPETITION_PROFILE_SQL,
             "Gopher line/n-gram repetition filters (dup-line mass, "
             "dup-5-gram fraction) — map-only array HOFs"),
    QueryDef("q_unigram_lm", curation_q.q_unigram_lm,
             curation_q.Q_UNIGRAM_LM_SQL,
             "CCNet-style LM quality score: mean -log2 p(token) under "
             "the corpus unigram distribution"),
    QueryDef("q_dsir", curation_q.q_dsir, curation_q.Q_DSIR_SQL,
             "DSIR importance resampling weights: hashed-bigram "
             "log-likelihood ratio vs the English target slice"),
    QueryDef("q_curated_corpus", curation_q.q_curated_corpus,
             curation_q.Q_CURATED_CORPUS_SQL,
             "END-TO-END curation: quality -> decontam -> exact dedup -> "
             "LSH near-dup -> chunking, full-pipeline oracle replay"),
    QueryDef("q_corpus_splits", llm_q.q_corpus_splits,
             llm_q.Q_CORPUS_SPLITS_SQL,
             "deterministic train/val/test carve + per-(lang,split) accounting"),
    QueryDef("q_source_mixing", llm_q.q_source_mixing,
             llm_q.Q_SOURCE_MIXING_SQL,
             "sqrt-temperature corpus mixing (integer-exact rates)"),
    QueryDef("q_sample_per_source", llm_q.q_sample_per_source,
             llm_q.Q_SAMPLE_PER_SOURCE_SQL,
             "exactly-k deterministic reservoir per source"),
    QueryDef("q_stream_attribution", events_q.q_stream_attribution,
             events_q.Q_STREAM_ATTRIBUTION_SQL,
             "watermarked stream-stream interval join (click attribution)"),
    # ---- added mid-r4 AFTER the window rotation locked (see _DEFERRED_NEW)
    QueryDef("q_span_dedup", curation_q.q_span_dedup,
             curation_q.Q_SPAN_DEDUP_SQL,
             "corpus-level exact span dedup (C4/RefinedWeb line-dedup "
             "shape), keep-first + text reassembly"),
    QueryDef("q_linear_quality", curation_q.q_linear_quality,
             curation_q.Q_LINEAR_QUALITY_SQL,
             "fastText-style hashed linear classifier scoring (map-only "
             "array HOFs, hash-derived stand-in weights)"),
    QueryDef("q_contamination_bloom", curation_q.q_contamination_bloom, None,
             "Bloom-bitmap decontamination production path (rows-only: "
             "xxhash64 bitmap; pytest pins flagged >= exact, FP bound)"),
    QueryDef("q_session_windows", events_q.q_session_windows,
             events_q.Q_SESSION_WINDOWS_SQL,
             "NATIVE session_window streaming agg, append mode — oracle "
             "replays gap-merge + watermark emission rule"),
    QueryDef("q_bpe_merges", llm_q.q_bpe_merges, None,
             "distributed BPE tokenizer training, 64 merges on the "
             "batched path (batch=8, <=16 passes asserted; iterative "
             "-> rows-only; pytest pins classic AND batched merge "
             "lists exactly vs a pure-Python reference). CHANGED in "
             "r6 (was 16 merges batch=1) -> must rotate into the r7 "
             "window."),
    QueryDef("q_inverted_index", llm_q.q_inverted_index,
             llm_q.Q_INVERTED_INDEX_SQL,
             "postings-list construction: top-50 terms by doc_freq with "
             "ordered posting strings (search-infra surface)"),
    QueryDef("q_pq_codes", llm_q.q_pq_codes, None,
             "product-quantization codes (m=8, ksub=16): 64 floats -> "
             "8 bytes/vector (rows-only; pytest pins codebook+codes "
             "bit-for-bit vs numpy reference)"),
    # ----------------------------------------------------------------
    # Tier 3 — r1-green, unchecked in r2 (stale evidence).
    # ----------------------------------------------------------------
    QueryDef("q_text_profile", llm_q.q_text_profile, llm_q.Q_TEXT_PROFILE_SQL,
             "token count / lang-id / fingerprint per doc"),
    QueryDef("q_exact_dedup", llm_q.q_exact_dedup, llm_q.Q_EXACT_DEDUP_SQL,
             "exact dedup groups via md5 fingerprint"),
    QueryDef("q_jaccard_pairs", llm_q.q_jaccard_pairs, llm_q.Q_JACCARD_PAIRS_SQL,
             "bigram-shingle Jaccard near-dup pairs"),
    QueryDef("q_minhash_signatures", llm_q.q_minhash_signatures,
             llm_q.Q_MINHASH_SIGNATURES_SQL, "md5 MinHash signatures (8 hashes)"),
    QueryDef("q_lsh_candidates", llm_q.q_lsh_candidates,
             llm_q.Q_LSH_CANDIDATES_SQL, "LSH banding candidate pairs"),
    QueryDef("q_neardup_verified", llm_q.q_neardup_verified,
             llm_q.Q_NEARDUP_VERIFIED_SQL,
             "MinHash->LSH->exact-Jaccard verified near-dup pipeline"),
    QueryDef("q_embedding_topk", llm_q.q_embedding_topk,
             llm_q.Q_EMBEDDING_TOPK_SQL, "brute-force cosine top-5 (ids+rank)"),
    QueryDef("q_embedding_neardup", llm_q.q_embedding_neardup,
             llm_q.Q_EMBEDDING_NEARDUP_SQL, "embedding-cosine near-dup pairs"),
    QueryDef("q_multimodal_features", llm_q.q_multimodal_features,
             llm_q.Q_MULTIMODAL_FEATURES_SQL,
             "binary payload + Arrow mapInPandas features"),
    QueryDef("q_chunking", llm_q.q_chunking, llm_q.Q_CHUNKING_SQL,
             "fixed-size token chunks with overlap (training-data prep)"),
    QueryDef("q_vocabulary", llm_q.q_vocabulary, llm_q.Q_VOCABULARY_SQL,
             "corpus token frequency / vocabulary building"),
    QueryDef("q_label_centroids", llm_q.q_label_centroids,
             llm_q.Q_LABEL_CENTROIDS_SQL,
             "per-label embedding centroids via posexplode + exact sums"),
    QueryDef("q_stratified_sample", llm_q.q_stratified_sample,
             llm_q.Q_STRATIFIED_SAMPLE_SQL,
             "per-language hash-sampling rates (corpus mixing)"),
    QueryDef("q_dim_time", dims_q.q_dim_time, dims_q.Q_DIM_TIME_SQL,
             "minute-of-day generator (F10-F12)"),
    # ----------------------------------------------------------------
    # Tier 4 — rotation slice of the r2-green set: refresh evidence for
    # the flagship + the operators most load-bearing for SURVEY §2.
    # ----------------------------------------------------------------
    QueryDef("q01_pricing_summary", relational.q01_pricing_summary,
             relational.Q01_SQL, "scan+filter+multi-agg (A1,P4,P10,F12)"),
    QueryDef("q_user_lifecycle_pivot", events_q.q_user_lifecycle_pivot,
             events_q.Q_USER_LIFECYCLE_PIVOT_SQL,
             "conditional-max pivot — the trip_fact idiom (A4)"),
    QueryDef("q03_shipping_priority", relational.q03_shipping_priority,
             relational.Q03_SQL, "3-way join + agg + total-order top-k (J2,A1,W1)"),
    QueryDef("q_sessionization", events_q.q_sessionization,
             events_q.Q_SESSIONIZATION_SQL, "gap sessionization via lag+cumsum (W2)"),
    QueryDef("q_scd2_history", events_q.q_scd2_history,
             events_q.Q_SCD2_HISTORY_SQL, "SCD2 change-detect semantics as a query"),
    QueryDef("q_streaming_event_counts", events_q.q_streaming_event_counts,
             events_q.Q_STREAMING_EVENT_COUNTS_SQL,
             "Structured Streaming availableNow agg == batch (ST1/ST2)"),
    QueryDef("q_streaming_windowed_counts", events_q.q_streaming_windowed_counts,
             events_q.Q_STREAMING_WINDOWED_COUNTS_SQL,
             "watermarked tumbling windows, append mode (ST4) — oracle "
             "replays the emission rule"),
    QueryDef("q_funnel", events_q.q_funnel,
             events_q.Q_FUNNEL_SQL,
             "ordered-step funnel via chained conditional mins"),
    QueryDef("q_retention_cohorts", events_q.q_retention_cohorts,
             events_q.Q_RETENTION_COHORTS_SQL,
             "weekly retention matrix (first-seen cohorts)"),
    QueryDef("q_asof_attribution", events_q.q_asof_attribution,
             events_q.Q_ASOF_ATTRIBUTION_SQL,
             "as-of join: purchase -> latest prior click (union+window)"),
    QueryDef("q_cohort_set_ops", relational.q_cohort_set_ops,
             relational.Q_COHORT_SET_OPS_SQL,
             "INTERSECT/EXCEPT cohort tagging (SO extension)"),
    QueryDef("q_salted_brand_revenue", relational.q_salted_brand_revenue,
             relational.Q_SALTED_BRAND_REVENUE_SQL,
             "salted skew join == plain join (oracle proves equivalence)"),
    QueryDef("q_unpivot_balances", relational.q_unpivot_balances,
             relational.Q_UNPIVOT_BALANCES_SQL,
             "native unpivot/melt == ANSI UNPIVOT (inverse of A4 pivot)"),
    QueryDef("q_dim_date", dims_q.q_dim_date, dims_q.Q_DIM_DATE_SQL,
             "sequence/explode calendar generator"),
    # ----------------------------------------------------------------
    # Tier 5 — r2-green, evidence in CORRECTNESS_r02.json; past the
    # driver window this round, rotate forward next round.
    # ----------------------------------------------------------------
    QueryDef("q05_region_revenue", relational.q05_region_revenue,
             relational.Q05_SQL, "6-way join, broadcast dims (J2)"),
    QueryDef("q06_forecast_revenue", relational.q06_forecast_revenue,
             relational.Q06_SQL, "pushdown filter + scalar agg (P4,P8)"),
    QueryDef("q_market_segment", relational.q_market_segment,
             relational.Q_MARKET_SEGMENT_SQL, "filtered counts count(when) (A2)"),
    QueryDef("q_top_customers", relational.q_top_customers,
             relational.Q_TOP_CUSTOMERS_SQL, "ranking window per partition (W1)"),
    QueryDef("q_order_gaps", relational.q_order_gaps,
             relational.Q_ORDER_GAPS_SQL, "lag window + datediff (W2,F16)"),
    QueryDef("q_union_entities", relational.q_union_entities,
             relational.Q_UNION_ENTITIES_SQL, "union all + agg (SO1,SO2)"),
    QueryDef("q_customers_no_orders", relational.q_customers_no_orders,
             relational.Q_CUSTOMERS_NO_ORDERS_SQL, "left-anti join (J5)"),
    QueryDef("q_priority_filters", relational.q_priority_filters,
             relational.Q_PRIORITY_FILTERS_SQL, "isin/between/like/startswith (P5-P9)"),
    QueryDef("q_customer_tiers", relational.q_customer_tiers,
             relational.Q_CUSTOMER_TIERS_SQL, "case-when tiering (F8) + countDistinct"),
    QueryDef("q_rollup_revenue", relational.q_rollup_revenue,
             relational.Q_ROLLUP_REVENUE_SQL, "rollup grouping sets (extension)"),
    QueryDef("q_cube_orders", relational.q_cube_orders,
             relational.Q_CUBE_ORDERS_SQL, "cube grouping sets (extension)"),
    QueryDef("q_part_stats", relational.q_part_stats,
             relational.Q_PART_STATS_SQL, "string/math scalar funcs + agg (P1-P3,F5)"),
    QueryDef("q12_late_shipments", relational.q12_late_shipments,
             relational.Q12_LATE_SHIPMENTS_SQL,
             "join + conditional counts + date arithmetic (A2,F8)"),
    QueryDef("q14_promo_revenue", relational.q14_promo_revenue,
             relational.Q14_PROMO_REVENUE_SQL, "revenue-share ratio of exact sums"),
    QueryDef("q04_priority_semi", relational.q04_priority_semi,
             relational.Q04_PRIORITY_SEMI_SQL, "left-semi join / EXISTS (J-family)"),
    QueryDef("q10_returned_items", relational.q10_returned_items,
             relational.Q10_RETURNED_ITEMS_SQL,
             "returned-value customers: 4-way join + top-20 (J2,W1)"),
    QueryDef("q_customer_deciles", relational.q_customer_deciles,
             relational.Q_CUSTOMER_DECILES_SQL, "ntile + dense_rank deciles (W2)"),
    QueryDef("q07_nation_volume", relational.q07_nation_volume,
             relational.Q07_SQL, "two-nation volume, broadcast dims (J2,F9)"),
    QueryDef("q08_market_share", relational.q08_market_share,
             relational.Q08_SQL, "market-share ratio of conditional sums (A3)"),
    QueryDef("q09_product_profit", relational.q09_product_profit,
             relational.Q09_SQL, "profit by nation/year, LIKE-pruned parts"),
    QueryDef("q13_customer_distribution", relational.q13_customer_distribution,
             relational.Q13_SQL, "outer-join count-of-counts histogram (J,A)"),
    QueryDef("q15_top_supplier", relational.q15_top_supplier,
             relational.Q15_SQL, "agg-view max via 1-row broadcast join"),
    QueryDef("q17_small_qty_revenue", relational.q17_small_qty_revenue,
             relational.Q17_SQL, "decorrelated scalar subquery (agg+join)"),
    QueryDef("q18_large_orders", relational.q18_large_orders,
             relational.Q18_SQL, "HAVING semi join + TakeOrdered top-100"),
    QueryDef("q19_disjunctive_revenue", relational.q19_disjunctive_revenue,
             relational.Q19_SQL, "OR-of-conjunction predicates (P4 stress)"),
    QueryDef("q21_waiting_supplier", relational.q21_waiting_supplier,
             relational.Q21_SQL, "EXISTS/NOT-EXISTS decorrelated to aggs"),
    QueryDef("q22_idle_customers", relational.q22_idle_customers,
             relational.Q22_SQL, "global-avg scalar broadcast + anti join"),
    QueryDef("q_props_json", events_q.q_props_json,
             events_q.Q_PROPS_JSON_SQL, "JSON path extraction (F1,F2)"),
    QueryDef("q_moving_value", events_q.q_moving_value,
             events_q.Q_MOVING_VALUE_SQL, "rowsBetween frame aggregates (W2 ext)"),
    QueryDef("q_daily_timeseries", events_q.q_daily_timeseries,
             events_q.Q_DAILY_TIMESERIES_SQL, "date_trunc time-series rollup"),
    QueryDef("q_top_purchasers", events_q.q_top_purchasers,
             events_q.Q_TOP_PURCHASERS_SQL, "filtered agg + global top-k"),
    QueryDef("q_event_quantiles", events_q.q_event_quantiles,
             events_q.Q_EVENT_QUANTILES_SQL,
             "exact grouped quantiles via applyInPandas (UDAF extension)"),
    QueryDef("q_time_rollup_multires", events_q.q_time_rollup_multires,
             events_q.Q_TIME_ROLLUP_MULTIRES_SQL,
             "hour+day rollup grains in one grouping-sets pass"),
    QueryDef("q_error_after_purchase", events_q.q_error_after_purchase,
             events_q.Q_ERROR_AFTER_PURCHASE_SQL,
             "range join via interval binning (errors within 6h of purchase)"),
    # ------------------------------------------------------------------
    # Tier 7 — added later in r4 (deferred-new lane, see _DEFERRED_NEW).
    # ------------------------------------------------------------------
    QueryDef("q_bm25_search", llm_q.q_bm25_search, llm_q.Q_BM25_SEARCH_SQL,
             "BM25 ranked retrieval (Okapi k1/b) top-20, decimal-exact"),
    QueryDef("q_export_manifest", llm_q.q_export_manifest,
             llm_q.Q_EXPORT_MANIFEST_SQL,
             "training-export shard manifest: md5 shards + "
             "order-insensitive content digest"),
    QueryDef("q_embedding_topk_ivfpq", llm_q.q_embedding_topk_ivfpq, None,
             "IVFADC ANN: IVF cells + PQ residual codes + asymmetric "
             "distance scan (float k-means -> rows-only; pytest pins "
             "recall vs brute force)"),
    QueryDef("q_embedding_topk_ivfpq_search", llm_q.q_embedding_topk_ivfpq_search,
             None,
             "IVFADC search over a PREBUILT index — the amortized "
             "per-batch production cost (rows-only; pytest pins "
             "prebuilt == one-shot)"),
    QueryDef("q_csv_roundtrip", llm_q.q_csv_roundtrip,
             llm_q.Q_CSV_ROUNDTRIP_SQL,
             "CSV source coverage: quoted/escaped write + PERMISSIVE "
             "schema read, digest-proven byte-exact round trip"),
    QueryDef("q_jsonl_roundtrip", llm_q.q_jsonl_roundtrip,
             llm_q.Q_JSONL_ROUNDTRIP_SQL,
             "JSON-lines source coverage: corrupt-record-quarantine "
             "read path, digest-proven round trip"),
    QueryDef("q_orc_roundtrip", llm_q.q_orc_roundtrip,
             llm_q.Q_ORC_ROUNDTRIP_SQL,
             "ORC source/sink coverage, digest-proven round trip"),
    QueryDef("q_gapfill_daily", events_q.q_gapfill_daily,
             events_q.Q_GAPFILL_DAILY_SQL,
             "time-series gap fill: dense per-user day grid + "
             "forward-fill (sequence+explode, key-partitioned window)"),
    QueryDef("q_pagerank_trading", relational.q_pagerank_trading,
             relational.Q_PAGERANK_TRADING_SQL,
             "PageRank (3 damped iterations) on the symmetrized "
             "customer-supplier graph, DECIMAL-exact iterations"),
    QueryDef("q_pagerank_trading_fast", relational.q_pagerank_trading_fast,
             None,
             "PageRank production twin: double-precision iterations, "
             "no per-element decimal tax (float sums -> rows-only; "
             "pytest pins mass~=1 + top-10 overlap vs the exact twin)"),
    QueryDef("q_kmeans_clusters", llm_q.q_kmeans_clusters, None,
             "label-free bounded-Lloyd k-means corpus clustering "
             "(float means -> rows-only; pytest pins recovery + numpy "
             "replay)"),
    QueryDef("q_incremental_neardup", llm_q.q_incremental_neardup,
             llm_q.Q_INCREMENTAL_NEARDUP_SQL,
             "incremental near-dup: materialized base signatures + "
             "delta batch, pairs touching the delta only"),
    QueryDef("q_customer_percentiles", relational.q_customer_percentiles,
             relational.Q_CUSTOMER_PERCENTILES_SQL,
             "percent_rank/cume_dist/nth_value analytic windows over "
             "segment spend, explicit full-partition ROWS frame"),
    QueryDef("q_snapshot_diff", relational.q_snapshot_diff,
             relational.Q_SNAPSHOT_DIFF_SQL,
             "row-level diff of two CDF snapshots (added/removed/"
             "changed per status) — table_changes summarized"),
    QueryDef("q_image_resize", llm_q.q_image_resize,
             llm_q.Q_IMAGE_RESIZE_SQL,
             "multimodal resize leg: nearest-neighbor byte-grid resize "
             "via Arrow mapInPandas, digest-pinned pixel gather"),
    QueryDef("q_hard_negatives", llm_q.q_hard_negatives,
             llm_q.Q_HARD_NEGATIVES_SQL,
             "contrastive hard-negative mining: per-query top-5 "
             "most-similar different-label vectors"),
    QueryDef("q_training_export", curation_q.q_training_export,
             curation_q.Q_TRAINING_EXPORT_SQL,
             "CAPSTONE: full curation pipeline kept-set -> shard "
             "manifest (the warehouse-to-training handoff, full-replay "
             "oracle)"),
    QueryDef("q_masked_read", relational.q_masked_read,
             relational.Q_MASKED_READ_SQL,
             "fine-grained access control: row filter + column masks "
             "(Lakeguard/UC-style) folded into the plan"),
    QueryDef("q_interpolate_daily", events_q.q_interpolate_daily,
             events_q.Q_INTERPOLATE_DAILY_SQL,
             "linear-interpolation gap fill (forward-fill's companion "
             "mode), decimal-exact"),
    # ------------------------------------------------------------------
    # Tier 8 — added in r6 (deferred-new lane, see _DEFERRED_NEW).
    # ------------------------------------------------------------------
    QueryDef("q_bpe_encode", llm_q.q_bpe_encode, None,
             "corpus tokenization with trained BPE merges (batched "
             "trainer + Arrow mapInPandas encoder, distinct-word "
             "cache) -> per-language token accounting (rows-only: "
             "iterative trainer upstream; encoder pytest-pinned vs "
             "encode_word)"),
    QueryDef("q_hybrid_search_rrf", llm_q.q_hybrid_search_rrf,
             llm_q.Q_HYBRID_SEARCH_RRF_SQL,
             "hybrid retrieval: reciprocal-rank fusion (RRF k=60) of "
             "the BM25 lexical top-20 and the dense cosine top-20 over "
             "the shared doc/vec id space"),
    QueryDef("q_bigram_lm", curation_q.q_bigram_lm,
             curation_q.Q_BIGRAM_LM_SQL,
             "order-2 LM quality score: add-one-smoothed bigram "
             "conditionals under corpus counts (the word-order signal "
             "q_unigram_lm cannot see)"),
    QueryDef("q_mmr_rerank", llm_q.q_mmr_rerank, None,
             "MMR diversity re-rank of the cosine top-50 pool "
             "(lambda=0.7, k=10) — the post-ANN rerank stage "
             "(rows-only: greedy float argmax; pytest pins picks vs "
             "an independent numpy replay)"),
    QueryDef("q_quality_buckets", curation_q.q_quality_buckets,
             curation_q.Q_QUALITY_BUCKETS_SQL,
             "CCNet head/middle/tail carve: per-language quality "
             "terciles of the unigram-LM score (ntile per-lang window) "
             "summarized per (lang, tier)"),
    QueryDef("q_dup_span_removal", curation_q.q_dup_span_removal,
             curation_q.Q_DUP_SPAN_REMOVAL_SQL,
             "Lee-et-al duplicate-substring removal: sliding 8-gram "
             "first-occurrence keep, position-coverage delete, "
             "reassembly (any-alignment companion to q_span_dedup)"),
    QueryDef("q_cms_heavy_hitters", llm_q.q_cms_heavy_hitters,
             llm_q.Q_CMS_HEAVY_HITTERS_SQL,
             "Count-Min sketch (D=4 x W=512, md5-salted rows) point "
             "estimates for the exact top-20 tokens — deterministic "
             "integer cells, oracle-checked sketch"),
    QueryDef("q_winsorized_stats", events_q.q_winsorized_stats,
             events_q.Q_WINSORIZED_STATS_SQL,
             "percentile outlier clipping (winsorize p01/p99 per "
             "event_type): exact-percentile bounds, clip counts, "
             "DECIMAL-policy winsorized mass"),
    QueryDef("q_kmv_distinct", events_q.q_kmv_distinct,
             events_q.Q_KMV_DISTINCT_SQL,
             "KMV (k-minimum md5 values) cardinality sketch vs exact "
             "distinct per event_type — the deterministic, "
             "oracle-checked counterpart to the rows-only HLL profile"),
    # -- the four TPC-H numbers the battery was missing (02/11/16/20),
    # -- adapted to this schema's lineitem-as-partsupp bridge; with
    # -- these the full classic 22 are covered (q01..q22).
    QueryDef("q02_min_cost_supplier", relational.q02_min_cost_supplier,
             relational.Q02_SQL,
             "adapted TPC-H Q02: cheapest EUROPE supplier per STANDARD "
             "part (per-part window min with suppkey tiebreak, "
             "decorrelated from the classic correlated MIN)"),
    QueryDef("q11_important_parts", relational.q11_important_parts,
             relational.Q11_SQL,
             "adapted TPC-H Q11: parts above 0.1% of ASIA-region "
             "revenue — global scalar threshold via 1-row broadcast, "
             "decimal-exact two-level total"),
    QueryDef("q16_supplier_diversity", relational.q16_supplier_diversity,
             relational.Q16_SQL,
             "adapted TPC-H Q16: distinct-supplier counts per part spec "
             "with a NOT-IN denylist (left-anti) over deficit suppliers"),
    QueryDef("q20_dominant_suppliers", relational.q20_dominant_suppliers,
             relational.Q20_SQL,
             "adapted TPC-H Q20: AMERICA suppliers shipping >50% of a "
             "red part's 1997 volume (nested correlated agg "
             "decorrelated into two-level grouped sums)"),
    # -- late-r6 analytics batch 2: graph triangles, record linkage,
    # -- sequence mining, distribution profiling.
    QueryDef("q_triangle_suppliers", relational.q_triangle_suppliers,
             relational.Q_TRIANGLE_SUPPLIERS_SQL,
             "triangle counting on the supplier co-supply graph "
             "(degree-oriented wedge join; completes the graph trio "
             "with PageRank and connected components)"),
    QueryDef("q_fuzzy_part_match", relational.q_fuzzy_part_match,
             relational.Q_FUZZY_PART_MATCH_SQL,
             "record linkage: noun-blocked levenshtein fuzzy join over "
             "part names (blocking-key + verify, never all-pairs)"),
    QueryDef("q_event_transitions", events_q.q_event_transitions,
             events_q.Q_EVENT_TRANSITIONS_SQL,
             "first-order Markov transition matrix over per-user event "
             "sequences (lag window + row-normalized probabilities)"),
    QueryDef("q_value_histogram", events_q.q_value_histogram,
             events_q.Q_VALUE_HISTOGRAM_SQL,
             "per-type equi-width value histogram (broadcast min/max "
             "bounds + clamped bucket arithmetic)"),
    QueryDef("q_entity_clusters", relational.q_entity_clusters,
             relational.Q_ENTITY_CLUSTERS_SQL,
             "entity resolution capstone: blocked fuzzy join -> "
             "connected components -> canonical representative "
             "(recursive-reachability oracle)"),
    QueryDef("q_trailing_7day", events_q.q_trailing_7day,
             events_q.Q_TRAILING_7DAY_SQL,
             "time-RANGE window frame: per-user trailing 7-day rolling "
             "sum over daily DECIMAL totals (rangeBetween on the day "
             "ordinal == RANGE INTERVAL 6 DAY PRECEDING)"),
    # Tier 9 — added in r7 (deferred-new lane, see _DEFERRED_NEW).
    QueryDef("q_containment_pairs", llm_q.q_containment_pairs,
             llm_q.Q_CONTAINMENT_PAIRS_SQL,
             "directed shingle containment |A∩B|/|A| (quote/excerpt "
             "detector): prefix-filtered SSJoin candidates vs a naive "
             "all-pairs oracle"),
    QueryDef("q_pareto_parts", relational.q_pareto_parts,
             relational.Q_PARETO_PARTS_SQL,
             "2-D Pareto skyline via sort-scan window vs an "
             "independent NOT-EXISTS dominance oracle"),
    QueryDef("q_column_profile", relational.q_column_profile,
             relational.Q_COLUMN_PROFILE_SQL,
             "ANALYZE-style per-column profile (nulls / exact distinct "
             "/ min / max as text) in one aggregate pass"),
    QueryDef("q_kanon_risk", relational.q_kanon_risk,
             relational.Q_KANON_RISK_SQL,
             "k-anonymity equivalence-class audit over the customer "
             "quasi-identifier pair (governance)"),
    QueryDef("q_benford_totals", relational.q_benford_totals,
             relational.Q_BENFORD_TOTALS_SQL,
             "Benford first-digit profile of order totals with inlined "
             "expected mass (fraud/data-entry screen)"),
    QueryDef("q_event_lift", events_q.q_event_lift,
             events_q.Q_EVENT_LIFT_SQL,
             "market-basket association (support/confidence/lift) over "
             "event-type pairs at user grain — ratios of exact counts, "
             "no logs"),
    QueryDef("q_oov_rate", llm_q.q_oov_rate,
             llm_q.Q_OOV_RATE_SQL,
             "out-of-vocabulary rate per source vs a reference-corpus "
             "vocabulary (tokenizer health / domain drift)"),
    QueryDef("q_copurchase_brands", relational.q_copurchase_brands,
             relational.Q_COPURCHASE_BRANDS_SQL,
             "item-item collaborative filtering over order baskets: "
             "co-occurrence counts scored by cosine (IEEE-exact sqrt) "
             "and overlap coefficient"),
    QueryDef("q_gini_revenue", relational.q_gini_revenue,
             relational.Q_GINI_REVENUE_SQL,
             "Gini concentration of customer revenue per market "
             "segment — integer-cents rank formula, one final double "
             "division"),
    QueryDef("q_mad_outliers", events_q.q_mad_outliers,
             events_q.Q_MAD_OUTLIERS_SQL,
             "Hampel median/MAD robust-outlier screen per event_type "
             "(counts + rates; companion to the winsorize clip)"),
    QueryDef("q_user_streaks", events_q.q_user_streaks,
             events_q.Q_USER_STREAKS_SQL,
             "gaps-and-islands: per-user consecutive-active-day "
             "streaks via the day_ordinal - row_number island key"),
    QueryDef("q_chisq_drift", llm_q.q_chisq_drift,
             llm_q.Q_CHISQ_DRIFT_SQL,
             "chi-square length-distribution drift per source vs the "
             "corpus over the full contingency grid (log-free PSI "
             "cousin)"),
    QueryDef("q_conversion_latency", events_q.q_conversion_latency,
             events_q.Q_CONVERSION_LATENCY_SQL,
             "per-funnel-step time-to-convert stats (median/p90/mean "
             "seconds) over the strictly-ordered first-touch chain"),
    QueryDef("q_fk_integrity", relational.q_fk_integrity,
             relational.Q_FK_INTEGRITY_SQL,
             "referential-integrity audit: orphan counts and rates "
             "for every FK edge of the star schema in one report"),
    QueryDef("q_revenue_concentration", relational.q_revenue_concentration,
             relational.Q_REVENUE_CONCENTRATION_SQL,
             "Lorenz head stats per segment: min top-k customers "
             "covering 50%/90% of revenue and the top-decile share "
             "(integer cumulative-sum thresholds)"),
    QueryDef("q_corr_profile", relational.q_corr_profile,
             relational.Q_CORR_PROFILE_SQL,
             "Pearson correlation matrix from exact integer "
             "sufficient statistics (one scan, decimal(38,0) sums), "
             "not order-sensitive streaming corr()"),
    QueryDef("q_supplier_reach", relational.q_supplier_reach,
             relational.Q_SUPPLIER_REACH_SQL,
             "bounded 3-hop BFS reachability over the supplier "
             "co-supply graph (frontier join + anti-join per hop)"),
    QueryDef("q_label_agreement", llm_q.q_label_agreement,
             llm_q.Q_LABEL_AGREEMENT_SQL,
             "Cohen's kappa between two document labelers per source "
             "(chance-corrected agreement; exact-integer pe==1 guard)"),
    QueryDef("q_geo_radius_join", relational.q_geo_radius_join,
             relational.Q_GEO_RADIUS_JOIN_SQL,
             "spatial radius join via grid-cell blocking + 3x3 probe "
             "+ exact distance verify (md5-fraction coordinates)"),
    QueryDef("q_lag1_autocorr", events_q.q_lag1_autocorr,
             events_q.Q_LAG1_AUTOCORR_SQL,
             "lag-1 autocorrelation per event type from exact decimal "
             "sufficient statistics over a lead() window"),
    QueryDef("q_ranksum_sources", llm_q.q_ranksum_sources,
             llm_q.Q_RANKSUM_SOURCES_SQL,
             "Mann-Whitney rank-sum test per source vs rest of corpus "
             "(tie-corrected z; ranks from the distinct-value table, "
             "no global row window)"),
    QueryDef("q_weighted_median", relational.q_weighted_median,
             relational.Q_WEIGHTED_MEDIAN_SQL,
             "quantity-weighted median price per flag via integer "
             "cumulative-weight threshold (left weighted median)"),
    QueryDef("q_ols_trend", relational.q_ols_trend,
             relational.Q_OLS_TREND_SQL,
             "least-squares daily-revenue trend per segment (slope + "
             "R^2 from exact integer sufficient statistics, no "
             "windows)"),
    QueryDef("q_cusum_changepoint", events_q.q_cusum_changepoint,
             events_q.Q_CUSUM_CHANGEPOINT_SQL,
             "CUSUM changepoint localization per event type: the peak "
             "of the integer-exact D_t = n*cum_t - t*S statistic and "
             "its time index"),
    # Tier 10 — added in r8 (deferred-new lane, see _DEFERRED_NEW).
    QueryDef("q_seasonal_decomposition", events_q.q_seasonal_decomposition,
             events_q.Q_SEASONAL_DECOMPOSITION_SQL,
             "day-of-week seasonal index per event type (the "
             "decomposition/forecast class): ratio-of-integer-ratios, "
             "ISO weekday probed across engines"),
    # Tier 11 — added in r9 (deferred-new lane, see _DEFERRED_NEW).
    QueryDef("q_peak_concurrency", events_q.q_peak_concurrency,
             events_q.Q_PEAK_CONCURRENCY_SQL,
             "peak simultaneous user sessions per day (the interval-"
             "algebra / sweep-line class): 30-min sessionization -> "
             "+1/-1 boundary deltas -> distributed running sum via "
             "range-partition + broadcast prefix offsets, never a "
             "single-partition global window; all-integer, exact"),
    # Tier 12 — added in r10 (deferred-new lane, see _DEFERRED_NEW).
    QueryDef("q_quantile_sketch", llm_q.q_quantile_sketch, None,
             "mergeable t-digest quantile summary (the bounded-size "
             "percentile primitive): per-source digests + global "
             "rollup MERGED from the summaries, never re-reading the "
             "corpus; estimates implementation-defined -> rows-only, "
             "rank-error <= 1.5/delta pytest-pinned vs exact"),
    QueryDef("q_weighted_sample", llm_q.q_weighted_sample,
             llm_q.Q_WEIGHTED_SAMPLE_SQL,
             "systematic PPS weighted sampling (row-level weight-"
             "proportional selection): hash-randomized order + "
             "distributed integer prefix sum + integer-division "
             "interval test — no pow/ln keys, hash-exact in any "
             "engine"),
    QueryDef("q_spatial_neighbors", llm_q.q_spatial_neighbors,
             llm_q.Q_SPATIAL_NEIGHBORS_SQL,
             "spatial radius SELF-join at pair grain (operatorized "
             "form of the q_geo_radius_join inline pattern): grid-"
             "cell 5-cell half-neighborhood equi-join (r11: 9N -> 5N "
             "exploded rows), each unordered pair once; IEEE-exact "
             "squared-distance residual, fully oracle-paired vs "
             "DuckDB brute force"),
    QueryDef("q_lpa_communities", relational.q_lpa_communities,
             relational.Q_LPA_COMMUNITIES_SQL,
             "label-propagation communities on the part co-order "
             "graph (the community-detection class, distinct from CC "
             "transitive closure): synchronous mode-of-neighbors with "
             "total tie-break, fixed 3 rounds — all-integer, DuckDB "
             "replays the iteration as chained CTEs, fully "
             "oracle-paired"),
    # Tier 13 — added in r11 (deferred-new lane, see _DEFERRED_NEW).
    QueryDef("q_kcore_parts", relational.q_kcore_parts,
             relational.Q_KCORE_PARTS_SQL,
             "k-core by synchronous degree peeling on the repeat-"
             "co-purchase part graph (the density-FILTERING class the "
             "graph family lacked — the spam/link-farm primitive): "
             "peeling is fixpoint-stable, so the fixed-R chained-CTE "
             "replay is exact at any R — all-integer, no tie-breaks, "
             "fully oracle-paired"),
    # Tier 14 — added in r12 (deferred-new lane, see _DEFERRED_NEW).
    QueryDef("q_neardup_incremental", llm_q.q_neardup_incremental,
             llm_q.Q_NEARDUP_INCREMENTAL_SQL,
             "incremental near-dup UPSERT: delta docs vs a materialized "
             "LSH band index — candidate generation is O(delta), a "
             "broadcast probe of the stored index, where the existing "
             "q_incremental_neardup (signature REUSE) only skips the "
             "re-hash and still self-joins all corpus bands per batch; "
             "this is the IVM pattern applied to near-dup state. Output "
             "contract is the batch re-run's pairs touching >=1 delta "
             "doc, so the oracle replays the batch pipeline and filters "
             "— fully oracle-paired"),
    # Tier 15 — added in r13 (deferred-new lane, see _DEFERRED_NEW).
    QueryDef("q_ivf_upsert", llm_q.q_ivf_upsert, llm_q.Q_IVF_UPSERT_SQL,
             "incremental ANN index maintenance (the ANN counterpart "
             "of q_neardup_incremental): the delta's embeddings are "
             "assigned to the EXISTING base-trained IVF centroids "
             "O(delta·K) broadcast work (similarity.ivf_upsert, with a "
             "distortion-drift retrain guard pinned in pytest), the "
             "search runs over the maintained state via ivf_search; "
             "assignment is pointwise-deterministic so the maintained "
             "state equals full re-assignment and the oracle replays "
             "it — fully oracle-paired"),
]

# Driver window for the CURRENT round (see module docstring): these 50
# names are promoted to positions 1-50, in this order; the remaining
# entries follow in definition order.
#
# r13 window rationale (from CORRECTNESS_r01-r12 evidence; r12 verdict
# "Next round #1" — mechanically generated by tools/rotation_plan.py,
# run first thing this round; ledger after r12 is r9=25, r10=50,
# r11=50, r12=50, never=1):
# - the 25 entries whose newest green is CORRECTNESS_r09 promote
#   first: their evidence falls off the 4-report horizon now that
#   CORRECTNESS_r12 is on disk (exactly the list the staleness test
#   prints).
# - q_neardup_incremental (the r12 _DEFERRED_NEW addition — the
#   never-driver-graded lane) promotes per test_deferred_new_queue.
# - the remaining 24 slots pull the oldest-evidence cohort forward:
#   24 of the 50 entries whose newest green is CORRECTNESS_r10, in
#   registry definition order (round-tie tiebreak — same policy as
#   every prior rotation). The other 26 r10 entries head the r14
#   window (demand r14 floor = 26, well under 50).
# 25 + 1 + 24 = 50/50: exactly full.
_WINDOW: list[str] = [
    # r14 window (mechanically generated by tools/rotation_plan.py,
    # then fill-lane adjusted per the r13 verdict's "Next round #1":
    # the r13-optimization-rewritten queries must be driver-graded
    # this round — their semantics-bearing rewrites currently rest on
    # the in-repo oracle sweep only).
    # r10-latest-green lane (falls off the 4-report horizon now that
    # r13 is on disk; the full 26-entry cohort in definition order)
    "q04_priority_semi", "q10_returned_items",
    "q_customer_deciles", "q07_nation_volume",
    "q08_market_share", "q09_product_profit",
    "q13_customer_distribution", "q15_top_supplier",
    "q17_small_qty_revenue", "q18_large_orders",
    "q19_disjunctive_revenue", "q21_waiting_supplier",
    "q22_idle_customers", "q_props_json",
    "q_moving_value", "q_daily_timeseries",
    "q_top_purchasers", "q_event_quantiles",
    "q_time_rollup_multires", "q_bm25_search",
    "q_gapfill_daily", "q_pagerank_trading",
    "q_customer_percentiles", "q_masked_read",
    "q_interpolate_daily", "q_peak_concurrency",
    # never-driver-graded lane (r13 deferred-new queue)
    "q_ivf_upsert",
    # verdict-priority fill (r13 "Next round #1"): the optimization
    # round's semantics-bearing rewrites, promoted ahead of the plain
    # oldest-evidence cohort so CORRECTNESS_r14 driver-verifies them
    # (q_bm25_search / q_pagerank_trading / q_embedding_topk_ivf are
    # already above via the staleness lanes; q_training_export and
    # q_pagerank_trading_fast are r13-fresh)
    "q_dup_span_removal", "q_bigram_lm",
    "q_triangle_suppliers", "q_quality_rules",
    "q_curated_corpus",
    # r11-latest-green lane (first 17 of the cohort in definition
    # order, plus q_embedding_topk_ivf_fast which shares the r13 ivf
    # rewrite; the 5 displaced r11 entries — q_neardup_verified_fast,
    # q_embedding_quantized, q_frame_sampling, q_pii_redaction,
    # q_sentence_split — go red at the r15 boundary and rotate then:
    # demand floor r15 = 29, satisfiable)
    "q_lang_quality", "q_geo_enrichment",
    "q_simhash", "q_embedding_topk_lsh",
    "q_user_event_arrays", "q_approx_profile",
    "q_editdist_verify", "q_dedup_clusters",
    "q_embedding_topk_ivf", "q_winnow_fingerprints",
    "q_winnow_overlap", "q_time_travel",
    "q_ivm_refresh", "q_audio_windows",
    "q_row_fingerprints", "q_embedding_dedup",
    "q_sequence_packing", "q_embedding_topk_ivf_fast",
]

# End-of-round full-gate mirror: ALL 130 oracle-paired entries swept
# green vs DuckDB at sf0.01 (the driver's grading scale) on 2026-08-14
# (r6 final, incl. the TPC-H completions and the late-r6 analytics
# batch) — `tools/oracle_sweep.py`, 0 failures in 273 s, under the
# HARDENED criteria (values + dtype_match + driver_safe: no
# DECIMAL/HUGEINT final kinds anywhere — the r5 hash-red class is now
# structurally unreachable). Re-confirmed after the post-sweep review
# fixes (triangle checkpoint, shared fuzzy helper): 130/130 again,
# full pytest 347 passed.
# Queries ADDED mid-round after the window was already saturated: they
# carry in-repo differential evidence (pytest sf0.001 sweep + sf0.01
# oracle_sweep run) and MUST rotate into the window next round —
# test_registry_order enforces that they sit immediately after the
# window so the next rotation promotes them, and that this list is
# emptied at each rotation. r5: the r4 backlog of 24 rotated into the
# window (contract honored). r6: q_bpe_encode (the encoder leg of the
# BPE trainer, rows-only) plus the eight late-r6 operators — hybrid RRF
# search, bigram LM, MMR re-rank, CCNet quality buckets, duplicate-
# substring removal, Count-Min heavy hitters, winsorization, KMV
# distinct (all but MMR oracle-paired; every one green in the sf0.001 +
# sf0.01 differentials this round) — added after the r6 window locked.
# ... and the four adapted TPC-H completions (q02/q11/q16/q20 — the
# battery now covers the classic 22 end-to-end), likewise added after
# the lock and green in both differentials.
# ... and the late-r6 analytics batch 2 (triangle counting, fuzzy
# record linkage, Markov event transitions, equi-width histograms,
# entity-resolution clustering) — all five oracle-paired and green in
# both differentials.
# r7 rotation: the 19-entry r6 queue promoted into the window above
# and this list emptied (contract honored — r5 rotated 24, r6 rotated
# none because the staleness tiers saturated the window). Queries added
# mid-r7 after the window locked go here, in addition order.
# r7 additions (tier 9): containment dedup, Pareto skyline, column
# profile, k-anonymity audit, Benford profile — all oracle-paired,
# green in the sf0.001 + sf0.01 differentials this round; they rotate
# into the r8 window.
# r7 additions batch 2 (statistics/analytics family): brand co-purchase
# CF, Gini concentration, MAD outliers, gaps-and-islands streaks,
# chi-square drift — likewise oracle-paired and green in both
# differentials.
# r7 additions batch 3 (funnel latency, FK audit, Lorenz concentration,
# exact-sufficient-statistics correlation, bounded-hop BFS).
# Rotation math, CORRECTED by mechanical simulation (the earlier "33
# r5-stale" count was wrong): 44 entries are r5-latest-green, so under
# the old 3-report horizon the r8 demand would be 44 + 17 = 61 > 50 —
# unsatisfiable. The staleness horizon is therefore the steady-state
# minimum ceil(161/50) = 4 (see CAPACITY NOTE and
# test_no_query_goes_stale_unchecked): r8 must window these 17 plus
# (by the oldest-evidence-first policy) 33 of the 44 r5 entries; the
# remaining 11 r5 entries head r9's window.
# r7 additions batch 4 (agreement / spatial / serial-dependence /
# hypothesis-testing / weighted-quantile / regression / changepoint):
# Cohen's kappa, grid-blocked radius join, lag-1 autocorrelation,
# Mann-Whitney rank-sum, weighted median, OLS trend, CUSUM changepoint
# — seven capability classes the battery lacked. Rotation math at 168
# entries (horizon stays 4 = ceil(168/50)): r8 windows these 24
# deferred + 26 of the 44 r5-stale entries (oldest-evidence-first);
# the remaining 18 head r9 — every round's demand stays under 50.
# r8 rotation: the 24-entry r7 queue promoted into the window above and
# this list emptied (contract honored — r5 rotated 24, r7 rotated 19).
# Registry growth is NEAR-FROZEN per the r7 verdict (#2, budget <=5 for
# genuinely new classes): r8 adds exactly ONE entry —
# q_seasonal_decomposition, the decomposition/forecast class the
# battery lacked (OLS/autocorr/CUSUM cover trend, serial dependence
# and changepoints; nothing covered seasonality). At 169 entries the
# horizon stays 4 = ceil(169/50) and the demand sequence is r9: 18
# r5-stale + 1 deferred (+31 free slots pulling the oldest-r6 cohort
# forward), r10: <=50, r11: 50 — always satisfiable.
# r9 rotation: q_seasonal_decomposition promoted into the window above
# and this list emptied (contract honored — every prior queue rotated
# on schedule: r5: 24, r7: 19, r8: 24, r9: 1). Ledger after r08 is
# r5=18, r6=50, r7=50, r8=50, never=1; the r9 window takes 18+1+31 and
# the demand sequence stays satisfiable: r10 = 19 remaining-r6 + free
# slots, r11 <= 50.
# r9 addition (budget <=5, genuinely new classes only): exactly ONE —
# q_peak_concurrency, the interval-algebra / sweep-line class (peak
# simultaneous sessions). Nothing in the battery computed concurrency
# over intervals; the operator also lands the distributed running-sum
# primitive (global_running_sum). At 170 entries the horizon stays
# 4 = ceil(170/50); demand r10 = 19 r6-stale + 1 deferred + 30 free.
# r10 rotation: q_peak_concurrency promoted into the window above and
# this list emptied (contract honored — every prior queue rotated on
# schedule: r5: 24, r7: 19, r8: 24, r9: 1, r10: 1). Ledger after r09 is
# r6=19, r7=50, r8=50, r9=50, never=1; the r10 window takes 19+1+30 and
# the demand sequence stays satisfiable: r11 = 20 remaining-r7 +
# deferred + free slots, r12 <= 50.
# r10 additions (budget <=5, genuinely new classes only): TWO —
# 1. q_quantile_sketch, the mergeable-quantile-summary class
#    (t-digest). The battery had exact grouped quantiles
#    (applyInPandas) and one-shot percentile_approx, plus mergeable
#    sketches for counts/cardinality (CMS/KMV/HLL) — but no
#    bounded-size MERGEABLE quantile summary, the standard 100 TB
#    percentile primitive (build per shard, merge summaries, never
#    re-scan).
# 2. q_weighted_sample, the row-level weighted-sampling class
#    (systematic PPS). The sampling family was uniform at the row
#    level (hash/stratified/reservoir) and weighted only at the
#    STRATUM level (sqrt-mixing); nothing selected individual rows
#    with probability proportional to a weight — the "sample docs
#    proportional to token budget / quality mass" mixing primitive.
#    Exactness-first design: no pow/ln priority keys (u^(1/w)
#    orderings are libm-dependent); hash order + integer prefix sum
#    (global_running_sum) + integer-division interval test, so the
#    entry is fully oracle-PAIRED, not rows-only.
# 3. q_spatial_neighbors, the spatial SELF-join pair primitive —
#    honestly labeled: the grid-cell technique itself is NOT new
#    (q_geo_radius_join carries it inline, two-table + aggregated);
#    this addition OPERATORIZES it (`operators/spatial.radius_join`:
#    self-join emitting each unordered pair once, haversine metric
#    with exact spherical cell bounds + modular antimeridian ring,
#    Catalyst-proof loudness guards) and grades the pair-LEVEL
#    output the inline form never exposed. Squared-distance residual
#    uses only IEEE-exact double ops (no sqrt/libm), so the entry is
#    fully oracle-PAIRED vs DuckDB's brute-force cross join.
# 4. q_lpa_communities, the community-detection class. The graph
#    family had connectivity (CC = min-label transitive closure),
#    centrality (PageRank), reachability (BFS), and density
#    (triangles) — but no clustering: LPA spreads the MODE of
#    neighbor labels, keeping dense pockets distinct. Synchronous
#    rounds + total tie-break (count DESC, label ASC) + fixed
#    iterations = all-integer and fully oracle-PAIRED (DuckDB chains
#    the rounds as CTEs), which async/random-tie-break LPA never is.
# At 174 entries the horizon stays 4 = ceil(174/50); demand
# r11 = 20 r7-stale + 4 deferred + 26 free.
# r11 rotation: the four-entry r10 queue promoted into the window above
# and this list emptied (contract honored — every prior queue rotated
# on schedule: r5: 24, r7: 19, r8: 24, r9: 1, r10: 1, r11: 4). Ledger
# after r10 is r7=20, r8=50, r9=50, r10=50, never=4; the r11 window
# takes 20+4+26 and the demand sequence stays satisfiable: r12 = 24
# remaining-r8 + deferred + free slots, r13 <= 50.
# r11 addition (budget <=5, genuinely new classes only — the r10
# verdict's named highest-value gap): exactly ONE — q_kcore_parts,
# the density-based graph FILTERING class (iterative degree peel).
# The family had connectivity/centrality/reachability/density/
# clustering but nothing that FILTERS by density — the standard
# spam/bot-subgraph primitive of a web-scale curation pipeline. The
# peel is fixpoint-stable, making the fixed-round DuckDB replay exact
# at any round count (one property stronger than LPA's pairing). At
# 175 entries the horizon stays 4 = ceil(175/50); demand r12 = 24
# r8-stale + 1 deferred + 25 free.
# r12 rotation: q_kcore_parts promoted into the window above and this
# list emptied (contract honored — every prior queue rotated on
# schedule: r5: 24, r7: 19, r8: 24, r9: 1, r10: 1, r11: 4, r12: 1).
# Ledger after r11 is r8=24, r9=50, r10=50, r11=50, never=1; the r12
# window takes 24+1+25 and the demand sequence stays satisfiable:
# r13 = 25 remaining-r9 + deferred + free slots, r14 <= 50.
# r12 addition (budget <=5, genuinely new classes only — the r11
# verdict's named highest-value gap, #5): exactly ONE —
# q_neardup_incremental, the streaming/incremental near-dup class.
# The batch MinHash->LSH battery was complete, but a corpus that GROWS
# re-ran the full pipeline per ingest; the band-index upsert
# (operators/dedup.neardup_upsert) makes the per-batch cost O(delta)
# — the operator a continuously-ingesting 100 TB curation pipeline
# actually runs (the storage/ivm.py pattern applied to near-dup
# state). At 176 entries the horizon stays 4 = ceil(176/50); demand
# r13 = 25 r9-stale + 1 deferred + 24 free.
# r13 rotation: q_neardup_incremental promoted into the window above
# and this list emptied (contract honored — every prior queue rotated
# on schedule: r5: 24, r7: 19, r8: 24, r9: 1, r10: 1, r11: 4, r12: 1,
# r13: 1). Ledger after r12 is r9=25, r10=50, r11=50, r12=50, never=1;
# the r13 window takes 25+1+24 and the demand sequence stays
# satisfiable: r14 = 26 remaining-r10 + deferred + free slots,
# r15 <= 50.
# r13 addition (budget <=5, genuinely new classes only — the r12
# verdict's named highest-value gap, #5): exactly ONE — q_ivf_upsert,
# the incremental ANN index-maintenance class. The ANN family's builds
# (IVF/IVF-fast/IVFPQ) were one-shot: a continuously-ingesting corpus
# re-trained and re-assigned per batch. similarity.ivf_upsert assigns
# only the delta against the existing centroids (O(delta·K) broadcast,
# corpus assignment never re-read) with an ivf_distortion drift guard
# that signals the rare retrain; ivf_search (split out of topk_ivf)
# searches the maintained state. The same IVM shape as neardup_upsert
# (r12) and storage/ivm.py, applied to ANN state. At 177 entries the
# horizon stays 4 = ceil(177/50); demand r14 = 26 r10-stale + 1
# deferred + 23 free.
# r14 rotation: q_ivf_upsert promoted into the window above and this
# list emptied (contract honored — every prior queue rotated on
# schedule: r5: 24, r7: 19, r8: 24, r9: 1, r10: 1, r11: 4, r12: 1,
# r13: 1, r14: 1). Ledger after r13 is r10=26, r11=50, r12=50, r13=50
# (less the 5 no_oracle rows, which count as graded for rotation);
# the r14 window takes 26+1+23 (fill = 5 verdict-priority rewritten
# queries + 18 oldest-r11). r14 is an OPTIMIZATION round: no new
# registry entries.
_DEFERRED_NEW: list[str] = []

_by_name = {q.name: q for q in QUERIES}
assert len(_WINDOW) == 50 and set(_WINDOW) <= set(_by_name)
QUERIES = (
    [_by_name[n] for n in _WINDOW]
    + [_by_name[n] for n in _DEFERRED_NEW]
    + [
        q
        for q in QUERIES
        if q.name not in set(_WINDOW) and q.name not in set(_DEFERRED_NEW)
    ]
)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # external drivers create their own SparkSession — ship the
        # package to its Python workers before any UDF-bearing plan runs
        from ..core.session import ship_package

        ship_package(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: _wrap(q.fn) for q in QUERIES}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES if q.oracle is not None}
