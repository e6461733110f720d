"""Corpus-curation queries — decontamination, boilerplate n-grams,
Gopher-style quality rules — with DuckDB oracles.

These extend the reference's surface with the corpus-level gates a
training-data pipeline needs (BASELINE.json north star; public
methods: Brown et al. 2020 §C n-gram decontamination, Rae et al. 2021
§A1.1 quality rules, CCNet boilerplate stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import (
    contamination_report,
    gopher_quality_flags,
    ngram_doc_frequency,
)
from .common import t

# Shared DuckDB fragment: whitespace tokens per document.
_DUCK_WORDS = r"""
  SELECT doc_id,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
"""


def _duck_ngrams(n: int, distinct: bool) -> str:
    """n-gram explosion over the _DUCK_WORDS CTE (expects it as ``w``)."""
    inner = (
        f"LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(words)-{n - 1}, 0)), "
        f"i -> ARRAY_TO_STRING(words[i:i+{n - 1}], ' '))"
    )
    if distinct:
        inner = f"LIST_DISTINCT({inner})"
    return f"SELECT doc_id, UNNEST({inner}) AS ngram FROM w"


# ---------------------------------------------------------------------------
# q_contamination: 8-gram collision check of the training split against a
# held-out eval split (doc_id % 50 == 0 plays the benchmark set).
# ---------------------------------------------------------------------------


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    evalset = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    return contamination_report(train, evalset, n=8)


Q_CONTAMINATION_SQL = f"""
WITH w AS ({_DUCK_WORDS}),
g AS ({_duck_ngrams(8, distinct=True)}),
train AS (SELECT * FROM g WHERE doc_id % 50 <> 0),
ev AS (SELECT DISTINCT doc_id AS eval_id, ngram FROM g WHERE doc_id % 50 = 0),
hits AS (
  SELECT t.doc_id,
    COUNT(DISTINCT t.ngram) AS n_overlap,
    COUNT(DISTINCT e.eval_id) AS n_eval_docs
  FROM train t JOIN ev e USING (ngram)
  GROUP BY t.doc_id
),
totals AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM train GROUP BY doc_id)
SELECT totals.doc_id, n_ngrams,
  COALESCE(n_overlap, 0) AS n_overlap,
  COALESCE(n_eval_docs, 0) AS n_eval_docs,
  COALESCE(n_overlap, 0) > 0 AS contaminated
FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id
"""


# ---------------------------------------------------------------------------
# q_boilerplate_ngrams: corpus-wide trigram doc-frequency, top 50 under a
# total order (doc_freq, total_occurrences, ngram) — TakeOrderedAndProject,
# no single-partition window.
# ---------------------------------------------------------------------------


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    stats = ngram_doc_frequency(docs, n=3, min_doc_freq=2)
    return stats.orderBy(
        F.desc("doc_freq"), F.desc("total_occurrences"), F.asc("ngram")
    ).limit(50)


Q_BOILERPLATE_NGRAMS_SQL = f"""
WITH w AS ({_DUCK_WORDS}),
g AS ({_duck_ngrams(3, distinct=False)}),
pd AS (SELECT doc_id, ngram, COUNT(*) AS c FROM g GROUP BY 1, 2)
SELECT ngram, COUNT(*) AS doc_freq,
  CAST(SUM(c) AS BIGINT) AS total_occurrences
FROM pd GROUP BY ngram HAVING COUNT(*) >= 2
ORDER BY doc_freq DESC, total_occurrences DESC, ngram
LIMIT 50
"""


# ---------------------------------------------------------------------------
# q_quality_rules: composite Gopher-style keep/drop battery per document.
# All ratios are int/int double divisions — bit-identical cross-engine.
# ---------------------------------------------------------------------------


def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return gopher_quality_flags(docs)


Q_QUALITY_RULES_SQL = r"""
WITH w AS (
  SELECT doc_id, text,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
base AS (
  SELECT doc_id,
    LEN(words) AS n_words,
    LENGTH(REGEXP_REPLACE(text, '\s+', '', 'g')) * 1.0
      / GREATEST(LEN(words), 1) AS mean_word_len,
    LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
      / GREATEST(LENGTH(text), 1) AS symbol_ratio,
    CASE WHEN LEN(words) < 2 THEN 0.0
         ELSE 1.0 - LEN(LIST_DISTINCT(LIST_TRANSFORM(
                GENERATE_SERIES(1, LEN(words) - 1),
                i -> words[i] || ' ' || words[i+1]))) * 1.0
              / (LEN(words) - 1)
    END AS dup_bigram_frac,
    LEN(LIST_INTERSECT(LIST_TRANSFORM(words, x -> LOWER(x)),
        ['the', 'and', 'with', 'that', 'for'])) > 0 AS has_stopword
  FROM w
),
wc AS (
  SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_word_frac
  FROM (
    SELECT doc_id, word, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST(words) AS word FROM w)
    GROUP BY doc_id, word
  )
  GROUP BY doc_id
)
SELECT base.doc_id, n_words, mean_word_len, symbol_ratio, top_word_frac,
  dup_bigram_frac, has_stopword,
  (n_words BETWEEN 30 AND 100000
   AND mean_word_len BETWEEN 2.0 AND 10.0
   AND symbol_ratio <= 0.10
   AND top_word_frac <= 0.15
   AND dup_bigram_frac <= 0.50
   AND has_stopword) AS keep
FROM base JOIN wc ON base.doc_id = wc.doc_id
"""


# ---------------------------------------------------------------------------
# q_curated_corpus: the END-TO-END curation pipeline — quality rules ->
# eval decontamination -> exact dedup -> LSH near-dup clusters -> chunking
# — as one audited flow. The oracle replays every stage in SQL (the
# recursive CTE does the connected components), so the full pipeline
# composition, not just each operator, is hash-checked.
# ---------------------------------------------------------------------------


def q_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines.curation import curate_corpus

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return curate_corpus(docs)


def _curated_ctes() -> str:
    """The full curation CTE chain (quality -> decontam -> exact dedup
    -> near-dup CC -> chunks); `n_surv` is the final kept set. Shared
    by the status report and the training-export capstone."""
    from .llm_q import _BAND_SELECTS, _SIG_COLS

    bands_on_sh = _BAND_SELECTS
    return rf"""
WITH RECURSIVE
w AS (
  SELECT doc_id, text,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
tw AS (SELECT * FROM w WHERE doc_id % 50 <> 0),
base AS (
  SELECT doc_id,
    LEN(words) AS n_words,
    LENGTH(REGEXP_REPLACE(text, '\s+', '', 'g')) * 1.0
      / GREATEST(LEN(words), 1) AS mean_word_len,
    LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
      / GREATEST(LENGTH(text), 1) AS symbol_ratio,
    CASE WHEN LEN(words) < 2 THEN 0.0
         ELSE 1.0 - LEN(LIST_DISTINCT(LIST_TRANSFORM(
                GENERATE_SERIES(1, LEN(words) - 1),
                i -> words[i] || ' ' || words[i+1]))) * 1.0
              / (LEN(words) - 1)
    END AS dup_bigram_frac,
    LEN(LIST_INTERSECT(LIST_TRANSFORM(words, x -> LOWER(x)),
        ['the', 'and', 'with', 'that', 'for'])) > 0 AS has_stopword
  FROM tw
),
twc AS (
  SELECT doc_id, MAX(c) * 1.0 / SUM(c) AS top_word_frac
  FROM (
    SELECT doc_id, word, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST(words) AS word FROM tw)
    GROUP BY doc_id, word
  ) GROUP BY doc_id
),
qual AS (
  SELECT base.doc_id,
    (n_words BETWEEN 30 AND 100000
     AND mean_word_len BETWEEN 2.0 AND 10.0
     AND symbol_ratio <= 0.10
     AND top_word_frac <= 0.15
     AND dup_bigram_frac <= 0.50
     AND has_stopword) AS keep
  FROM base JOIN twc ON base.doc_id = twc.doc_id
),
q_surv AS (SELECT tw.* FROM tw JOIN qual ON tw.doc_id = qual.doc_id WHERE keep),
g8 AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
      GENERATE_SERIES(1, GREATEST(LEN(words)-7, 0)),
      i -> ARRAY_TO_STRING(words[i:i+7], ' ')))) AS ngram
  FROM w
),
ev AS (SELECT DISTINCT ngram FROM g8 WHERE doc_id % 50 = 0),
contam AS (
  SELECT DISTINCT s.doc_id
  FROM (SELECT g8.* FROM g8 JOIN q_surv ON g8.doc_id = q_surv.doc_id) s
  JOIN ev ON s.ngram = ev.ngram
),
c_surv AS (
  SELECT q_surv.* FROM q_surv
  WHERE doc_id NOT IN (SELECT doc_id FROM contam)
),
fp AS (
  SELECT doc_id, text, words,
    MD5(LOWER(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS f
  FROM c_surv
),
es AS (SELECT f, MIN(doc_id) AS surv FROM fp GROUP BY f),
e_surv AS (
  SELECT fp.doc_id, fp.text, fp.words
  FROM fp JOIN es ON fp.f = es.f AND fp.doc_id = es.surv
),
sh AS (
  SELECT doc_id,
    LIST_DISTINCT(LIST_TRANSFORM(
      GENERATE_SERIES(1, GREATEST(LEN(words) - 1, 0)),
      i -> words[i] || ' ' || words[i+1])) AS s
  FROM e_surv
),
sigs AS (
  SELECT doc_id, {_SIG_COLS} FROM sh
),
bands AS (
{bands_on_sh}
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
    AND a.doc_id < b.doc_id
),
verified AS (
  SELECT id_a, id_b FROM cands
  JOIN sh sa ON sa.doc_id = id_a
  JOIN sh sb ON sb.doc_id = id_b
  WHERE LEN(LIST_INTERSECT(sa.s, sb.s)) * 1.0
        / (LEN(sa.s) + LEN(sb.s) - LEN(LIST_INTERSECT(sa.s, sb.s))) > 0.5
),
sym AS (
  SELECT id_a AS v, id_b AS u FROM verified
  UNION ALL
  SELECT id_b AS v, id_a AS u FROM verified
),
reach(v, r) AS (
  SELECT doc_id, doc_id FROM e_surv
  UNION
  SELECT s.u, reach.r FROM reach JOIN sym s ON s.v = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v),
n_surv AS (
  SELECT e_surv.* FROM e_surv JOIN comp ON e_surv.doc_id = comp.doc_id
  WHERE e_surv.doc_id = comp.cluster_id
),
chunks AS (
  SELECT doc_id,
    CASE WHEN LEN(words) <= 0 THEN 0
         WHEN LEN(words) <= 32 THEN 1
         ELSE 1 + CAST(CEIL((LEN(words) - 32) / 24.0) AS INTEGER)
    END AS n_chunks
  FROM n_surv
)
"""


Q_CURATED_CORPUS_SQL = _curated_ctes() + """
SELECT d.doc_id,
  CASE
    WHEN d.doc_id % 50 = 0 THEN 'eval_holdout'
    WHEN q_surv.doc_id IS NULL THEN 'dropped_quality'
    WHEN contam.doc_id IS NOT NULL THEN 'dropped_contaminated'
    WHEN e_surv.doc_id IS NULL THEN 'dropped_exact_dup'
    WHEN n_surv.doc_id IS NULL THEN 'dropped_near_dup'
    ELSE 'kept'
  END AS status,
  CAST(CASE WHEN d.doc_id % 50 <> 0 AND n_surv.doc_id IS NOT NULL
       THEN COALESCE(chunks.n_chunks, 0) ELSE 0 END AS BIGINT) AS n_chunks
FROM documents d
LEFT JOIN q_surv ON d.doc_id = q_surv.doc_id
LEFT JOIN contam ON d.doc_id = contam.doc_id
LEFT JOIN e_surv ON d.doc_id = e_surv.doc_id
LEFT JOIN n_surv ON d.doc_id = n_surv.doc_id
LEFT JOIN chunks ON d.doc_id = chunks.doc_id
"""


# ---------------------------------------------------------------------------
# q_doc_top_terms: characteristic terms per document — rank terms by
# (tf DESC, df ASC, term ASC): the tf-idf ordering with the idf made
# integer-exact (rarer term wins tf ties), so the whole result is
# hash-checkable with no transcendental math in either engine.
# Per-doc window rank (partitioned by doc_id — parallel, never global).
# ---------------------------------------------------------------------------


def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    from ..operators.text import tokens

    words = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "rank")
    )


Q_DOC_TOP_TERMS_SQL = r"""
WITH words AS (
  SELECT doc_id, UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'),
                                    x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT doc_id, term, tf, df, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
  FROM tf JOIN df ON tf.term = df.term
)
WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# q_repetition_profile: Gopher's line/n-gram repetition filters (the
# rules q_quality_rules' word-level battery doesn't cover). Map-only.
# ---------------------------------------------------------------------------


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import repetition_profile

    docs = t(spark, sf_dir, "documents")
    out = repetition_profile(docs, n=5)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        "dup_line_frac",
        "dup_line_char_frac",
        "dup_ngram_frac",
    )


Q_REPETITION_PROFILE_SQL = r"""
WITH lns AS (
  SELECT doc_id,
    LIST_FILTER(
      LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(text, '\n'), x -> TRIM(x)),
      x -> x <> ''
    ) AS lines
  FROM documents
),
w AS (
  SELECT doc_id,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
g AS (
  SELECT doc_id,
    LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(words)-4, 0)),
                   i -> ARRAY_TO_STRING(words[i:i+4], ' ')) AS grams
  FROM w
)
SELECT l.doc_id,
  CAST(LEN(lines) AS BIGINT) AS n_lines,
  ROUND(CAST(LEN(lines) - LEN(LIST_DISTINCT(lines)) AS DOUBLE)
        / GREATEST(LEN(lines), 1), 6) AS dup_line_frac,
  ROUND(CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(LIST_DISTINCT(lines),
          y -> CASE WHEN LEN(LIST_FILTER(lines, x -> x = y)) > 1
               THEN LEN(LIST_FILTER(lines, x -> x = y)) * LENGTH(y)
               ELSE 0 END)), 0) AS DOUBLE)
        / GREATEST(COALESCE(LIST_SUM(LIST_TRANSFORM(lines, x -> LENGTH(x))), 0), 1),
        6) AS dup_line_char_frac,
  ROUND(CAST(LEN(grams) - LEN(LIST_DISTINCT(grams)) AS DOUBLE)
        / GREATEST(LEN(grams), 1), 6) AS dup_ngram_frac
FROM lns l JOIN g USING (doc_id)
"""


# ---------------------------------------------------------------------------
# q_unigram_lm: CCNet-style LM quality score from the corpus's own
# unigram distribution (mean -log2 p(w) per doc).
# ---------------------------------------------------------------------------


def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import unigram_logprob_score

    docs = t(spark, sf_dir, "documents")
    return unigram_logprob_score(docs)


Q_UNIGRAM_LM_SQL = r"""
WITH w AS (
  SELECT doc_id,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
tok AS (SELECT doc_id, UNNEST(words) AS tk FROM w),
vocab AS (SELECT tk, COUNT(*) AS c FROM tok GROUP BY tk),
tot AS (SELECT SUM(c) AS t FROM vocab),
scored AS (
  SELECT doc_id,
    CAST(ROUND(-LOG2(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 6)
         AS DECIMAL(18,6)) AS nlp
  FROM tok JOIN vocab USING (tk) CROSS JOIN tot
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(nlp) AS DOUBLE) / COUNT(*) AS bits_per_token
FROM scored
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q_bigram_lm: order-2 upgrade of q_unigram_lm — add-one-smoothed
# bigram conditionals p(w2|w1) under the corpus's own bigram counts;
# catches common-words-in-uncommon-ORDER word salad the unigram score
# cannot see. Oracle rebuilds the same model with a positional
# self-join (UNNEST + GENERATE_SUBSCRIPTS).
# ---------------------------------------------------------------------------


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import bigram_logprob_score

    docs = t(spark, sf_dir, "documents")
    return bigram_logprob_score(docs)


Q_BIGRAM_LM_SQL = r"""
WITH w AS (
  SELECT doc_id,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
tok AS (
  SELECT doc_id, UNNEST(words) AS tk,
    GENERATE_SUBSCRIPTS(words, 1) AS pos
  FROM w
),
grams AS (
  SELECT a.doc_id, a.tk || ' ' || b.tk AS g, a.tk AS w1
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bi AS (SELECT g, COUNT(*) AS c2 FROM grams GROUP BY g),
ctx AS (
  SELECT SPLIT_PART(g, ' ', 1) AS w1, SUM(c2) AS c1 FROM bi GROUP BY w1
),
vocab AS (SELECT COUNT(DISTINCT tk) AS v FROM tok),
scored AS (
  SELECT grams.doc_id,
    CAST(ROUND(-LOG2(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)), 6)
         AS DECIMAL(18,6)) AS nlp
  FROM grams JOIN bi USING (g) JOIN ctx USING (w1) CROSS JOIN vocab
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(nlp) AS DOUBLE) / COUNT(*) AS bits_per_bigram
FROM scored
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q_dup_span_removal: Lee-et-al-2022 duplicate-substring removal at
# sliding 8-gram granularity — keep the corpus-wide first occurrence of
# every duplicated 8-token window, delete the positions covered by
# later occurrences, reassemble. The any-alignment companion to
# q_span_dedup's aligned windows. Oracle builds the same grams with a
# LEAD chain and replays first-pick/coverage/anti-join exactly.
# ---------------------------------------------------------------------------


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import remove_duplicate_spans

    docs = t(spark, sf_dir, "documents")
    return remove_duplicate_spans(docs, k=8)


Q_DUP_SPAN_REMOVAL_SQL = r"""
WITH w AS (
  SELECT doc_id,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
tok AS (
  SELECT doc_id, UNNEST(words) AS tk,
    GENERATE_SUBSCRIPTS(words, 1) AS pos
  FROM w
),
grams AS (
  SELECT doc_id, pos,
    tk || ' ' || LEAD(tk, 1) OVER wd || ' ' || LEAD(tk, 2) OVER wd
       || ' ' || LEAD(tk, 3) OVER wd || ' ' || LEAD(tk, 4) OVER wd
       || ' ' || LEAD(tk, 5) OVER wd || ' ' || LEAD(tk, 6) OVER wd
       || ' ' || LEAD(tk, 7) OVER wd AS g,
    doc_id * 1000000 + pos AS ord
  FROM tok WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY LEAD(tk, 7) OVER wd IS NOT NULL
),
firsts AS (
  SELECT g, MIN(ord) AS first_ord, COUNT(*) AS n_occ FROM grams GROUP BY g
),
dup_inst AS (
  SELECT grams.doc_id, grams.pos
  FROM grams JOIN firsts USING (g)
  WHERE n_occ > 1 AND ord <> first_ord
),
covered AS (
  SELECT DISTINCT doc_id, UNNEST(GENERATE_SERIES(pos, pos + 7)) AS pos
  FROM dup_inst
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tk
  FROM tok ANTI JOIN covered
    ON tok.doc_id = covered.doc_id AND tok.pos = covered.pos
),
reassembled AS (
  SELECT doc_id,
    COUNT(*) AS n_kept,
    STRING_AGG(tk, ' ' ORDER BY pos) AS text_clean
  FROM kept GROUP BY doc_id
),
totals AS (
  SELECT doc_id, CAST(LEN(words) AS BIGINT) AS n_tokens FROM w
)
SELECT totals.doc_id, totals.n_tokens,
  CAST(totals.n_tokens - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
  COALESCE(text_clean, '') AS text_clean
FROM totals LEFT JOIN reassembled ON totals.doc_id = reassembled.doc_id
"""


# ---------------------------------------------------------------------------
# q_quality_buckets: CCNet's head/middle/tail carve — per-language
# quality terciles of the unigram-LM score (ntile over a per-lang
# window), summarized per (lang, tier). The step between scoring and
# quality-stratified export. Summary columns are integers + min/max of
# per-doc doubles: order-insensitive, cross-engine exact.
# ---------------------------------------------------------------------------


def q_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import ccnet_quality_buckets

    docs = t(spark, sf_dir, "documents")
    return ccnet_quality_buckets(docs)


Q_QUALITY_BUCKETS_SQL = r"""
WITH w AS (
  SELECT doc_id, lang,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
tok AS (SELECT doc_id, UNNEST(words) AS tk FROM w),
vocab AS (SELECT tk, COUNT(*) AS c FROM tok GROUP BY tk),
tot AS (SELECT SUM(c) AS t FROM vocab),
nlps AS (
  SELECT doc_id,
    CAST(ROUND(-LOG2(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 6)
         AS DECIMAL(18,6)) AS nlp
  FROM tok JOIN vocab USING (tk) CROSS JOIN tot
),
scores AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(nlp) AS DOUBLE) / COUNT(*) AS bits_per_token
  FROM nlps GROUP BY doc_id
),
tiered AS (
  SELECT w.lang, scores.n_tokens, scores.bits_per_token,
    CAST(NTILE(3) OVER (
      PARTITION BY w.lang ORDER BY scores.bits_per_token, scores.doc_id
    ) AS BIGINT) AS bucket
  FROM scores JOIN w ON scores.doc_id = w.doc_id
)
SELECT lang, bucket,
  CASE WHEN bucket = 1 THEN 'head'
       WHEN bucket = 3 THEN 'tail'
       ELSE 'middle' END AS tier,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  MIN(bits_per_token) AS min_bits,
  MAX(bits_per_token) AS max_bits
FROM tiered
GROUP BY lang, bucket
"""


# ---------------------------------------------------------------------------
# q_dsir: Data Selection via Importance Resampling — hashed-bigram
# log-likelihood-ratio importance of every doc against the English
# slice as the target domain.
# ---------------------------------------------------------------------------


def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import dsir_importance

    docs = t(spark, sf_dir, "documents")
    return dsir_importance(docs, F.col("lang") == "en")


Q_DSIR_SQL = r"""
WITH w AS (
  SELECT doc_id, lang,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
g AS (
  SELECT doc_id, lang,
    UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(words)-1, 0)),
                          i -> ARRAY_TO_STRING(words[i:i+1], ' '))) AS gr
  FROM w
),
gb AS (
  SELECT doc_id, lang,
    CAST(('0x' || substr(md5(gr), 1, 15)) AS BIGINT) % 4096 AS b
  FROM g
),
counts AS (
  SELECT b,
    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_b,
    SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS s_b
  FROM gb GROUP BY b
),
tot AS (SELECT SUM(t_b) AS tt, SUM(s_b) AS ss FROM counts),
wts AS (
  SELECT b,
    CAST(ROUND(
      LOG2(CAST(t_b + 1 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE))
      - LOG2(CAST(s_b + 1 AS DOUBLE) / CAST(ss + 4096 AS DOUBLE)), 6)
      AS DECIMAL(18,6)) AS w_b
  FROM counts CROSS JOIN tot
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(SUM(w_b) AS DOUBLE) / COUNT(*) AS importance
FROM gb JOIN wts USING (b)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q_span_dedup: corpus-level exact span dedup (C4/RefinedWeb line-dedup
# shape at 10-token-window granularity) — keep-first, reassemble text.
# ---------------------------------------------------------------------------


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import span_dedup

    docs = t(spark, sf_dir, "documents")
    return span_dedup(docs, span_tokens=10)


Q_SPAN_DEDUP_SQL = r"""
WITH w AS (
  SELECT doc_id,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
s AS (
  SELECT doc_id,
    UNNEST(GENERATE_SERIES(1, CAST(CEIL(LEN(words) / 10.0) AS BIGINT))) - 1 AS pos,
    UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, CAST(CEIL(LEN(words) / 10.0) AS BIGINT)),
                          i -> ARRAY_TO_STRING(words[(i-1)*10+1:i*10], ' '))) AS seg
  FROM w
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM s
),
kept AS (
  SELECT doc_id, COUNT(*) AS n_kept,
    STRING_AGG(seg, ' ' ORDER BY pos) AS text_clean
  FROM r WHERE rn = 1 GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM s GROUP BY doc_id)
SELECT tot.doc_id,
  CAST(n_spans AS BIGINT) AS n_spans,
  CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
  COALESCE(text_clean, '') AS text_clean
FROM tot LEFT JOIN kept USING (doc_id)
"""


# ---------------------------------------------------------------------------
# q_linear_quality: fastText-style hashed linear classifier scoring —
# map-only array HOFs, hash-derived pseudo-weights (model stand-in).
# ---------------------------------------------------------------------------


def q_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import hashed_linear_score

    docs = t(spark, sf_dir, "documents")
    return hashed_linear_score(docs, n_features=1024)


Q_LINEAR_QUALITY_SQL = r"""
WITH w AS (
  SELECT doc_id,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), x -> x <> '') AS words
  FROM documents
),
tok AS (SELECT doc_id, UNNEST(words) AS tk FROM w),
wts AS (
  SELECT doc_id,
    CAST(ROUND(
      CAST((CAST(('0x' || substr(md5(CAST(
            CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) % 1024
          AS VARCHAR)), 1, 15)) AS BIGINT) % 2001) - 1000 AS DOUBLE) / 1000.0,
      6) AS DECIMAL(18,6)) AS wt
  FROM tok
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(wt) AS s
  FROM wts GROUP BY doc_id
)
SELECT w.doc_id,
  CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN 0.0
       ELSE CAST(s AS DOUBLE) / n_tokens END AS score,
  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN FALSE
       ELSE s > 0 END AS label
FROM w LEFT JOIN agg USING (doc_id)
"""


# ---------------------------------------------------------------------------
# q_contamination_bloom: Bloom-bitmap decontamination (production path;
# xxhash64 bitmap not reproducible in DuckDB -> rows-only; the pytest
# pin proves flagged >= exact with zero false negatives).
# ---------------------------------------------------------------------------


def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import contamination_bloom

    docs = t(spark, sf_dir, "documents")
    evalset = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    return contamination_bloom(train, evalset, n=8)


# ---------------------------------------------------------------------------
# q_training_export: the CAPSTONE — the full curation pipeline's kept
# set flowing straight into the training-export manifest (deterministic
# md5 shards + order-insensitive content digest). This is the complete
# warehouse-to-training-cluster handoff in one oracle-gated query:
# quality -> decontam -> exact dedup -> near-dup CC -> shard -> verify.
# ---------------------------------------------------------------------------


def q_training_export(
    spark: SparkSession, sf_dir: str, status: DataFrame | None = None
) -> DataFrame:
    """``status=`` is the amortization hook (the edges=/baskets=/
    tf_index= pattern): a caller that just ran q_curated_corpus passes
    its result and pays only the shard manifest, not a second full
    curation pipeline — at 100 TB the curated status IS a materialized
    table between jobs. The one-shot default keeps the oracle pairing
    self-contained."""
    from ..operators.export import shard_manifest
    from ..pipelines.curation import curate_corpus

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    if status is None:
        status = curate_corpus(docs)
    kept = docs.join(
        status.where(F.col("status") == "kept").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return shard_manifest(kept, "doc_id", "text", n_shards=4)


Q_TRAINING_EXPORT_SQL = _curated_ctes() + """
SELECT shard,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(LENGTH(text)) AS BIGINT) AS n_payload_chars,
  CAST(SUM(row_h) % 1152921504606846976 AS BIGINT) AS content_digest
FROM (
  SELECT
    CAST((CAST(('0x' || substr(md5('exp1|' || CAST(doc_id AS VARCHAR)), 1, 15))
      AS BIGINT) % 10000) % 4 AS INTEGER) AS shard,
    text,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
      || COALESCE(text, '')), 1, 15)) AS BIGINT) AS row_h
  FROM n_surv
)
GROUP BY shard ORDER BY shard
"""
