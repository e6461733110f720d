"""Corpus-curation operators — decontamination, boilerplate detection,
composite quality rules (Gopher-style).

These are the corpus-level gates an LLM training-data pipeline runs
after per-document scoring (`operators/text.py`) and before dedup
sampling (`operators/sampling.py`):

- **decontamination**: flag training documents that share any word
  n-gram with an evaluation/benchmark set (the GPT-3/PaLM "13-gram
  collision" method, public in Brown et al. 2020 §C). At 100 TB the
  eval side is tiny (benchmarks are MBs) — broadcast its n-gram set
  and the whole check is one map-side join plus a per-doc groupBy;
  the train corpus is never shuffled by anything wider than doc_id.
- **boilerplate n-gram stats**: corpus-wide n-gram document frequency
  (the CCNet/C4 signal for boilerplate stripping). Two-level
  aggregation — (ngram, doc) partial counts, then ngram totals — so
  the map-side combine absorbs per-doc repetition before the wide
  shuffle; the final shuffle key is the ngram itself, skew handled by
  AQE (common n-grams are exactly the skewed keys).
- **quality rules**: Rae et al. 2021 (Gopher §A1.1) style keep/drop
  rule battery: word count bounds, mean word length, symbol ratio,
  stopword evidence, top-word concentration, duplicate-bigram
  fraction. All but top-word-fraction are pure per-row expressions;
  top-word-fraction is an explode + two-level agg + 1:1 join back on
  doc_id.

Everything is oracle-checkable: md5 is the only hash, counts and
int/int double divisions are bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_from_tokens
from .text import ngram_list, tokens


def _doc_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int, out: str = "ngram"
) -> DataFrame:
    """(id, ngram) exploded rows, ngrams DISTINCT per document."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    return toked.select(
        id_col, F.explode(shingles_from_tokens(F.col("_toks"), n)).alias(out)
    )


def contamination_report(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-train-document n-gram collisions against an eval set.

    Returns one row per train document:
      (doc_id, n_ngrams, n_overlap, n_eval_docs, contaminated)

    Scale shape: eval n-grams are broadcast (benchmarks are small by
    construction); the only wide shuffle is the per-doc groupBy, keyed
    by doc_id — no skew (each doc contributes its own distinct grams).

    Measured negative result (r13, kept for the record): replacing the
    totals leg's second gram pass with a map-side
    ``size(shingles_from_tokens(...))`` per row was 2.3x SLOWER at
    sf0.1 (interleaved A/B, 1.42 -> 3.22 s median): materializing the
    full n-gram array as one row value costs more than the streamed
    explode+partial-count it replaces, and the totals groupBy's
    partial aggregation already collapses to one row per doc map-side,
    so the "saved" pass was the cheap one. The two-pass exploded form
    stays.
    """
    train_g = _doc_ngrams(train, id_col, text_col, n)
    eval_g = (
        _doc_ngrams(evalset, id_col, text_col, n)
        .withColumnRenamed(id_col, "_eval_id")
        .distinct()
    )
    hits = (
        train_g.join(F.broadcast(eval_g), "ngram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("ngram").alias("n_overlap"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
    )
    totals = train_g.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.coalesce("n_eval_docs", F.lit(0)).alias("n_eval_docs"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def ngram_doc_frequency(
    df: DataFrame,
    n: int = 3,
    min_doc_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide n-gram stats: (ngram, doc_freq, total_occurrences).

    Boilerplate phrases surface as high doc_freq. Occurrences are
    counted with repetition (non-distinct n-grams); doc_freq counts
    each document once.

    Two-level agg: (ngram, doc) partials combine map-side, then the
    ngram-level rollup shuffles once on the ngram key.
    """
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    m = F.greatest(F.size(F.col("_toks")) - (n - 1), F.lit(0))
    parts = [F.slice(F.col("_toks"), i + 1, m) for i in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda a, b: F.concat(a, F.lit(" "), b))
    all_grams = toked.select(id_col, F.explode(acc).alias("ngram"))
    per_doc = all_grams.groupBy(id_col, "ngram").agg(F.count("*").alias("c"))
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("c").alias("total_occurrences"),
        )
        .where(F.col("doc_freq") >= min_doc_freq)
    )


# Gopher-style rule thresholds (public: Rae et al. 2021, §A1.1),
# adapted to word-level signals computable identically in two engines.
MIN_WORDS = 30
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.10
MAX_TOP_WORD_FRAC = 0.15
MAX_DUP_BIGRAM_FRAC = 0.50
STOPWORDS = ("the", "and", "with", "that", "for")


def gopher_quality_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Composite keep/drop rule battery per document.

    Returns (doc_id, n_words, mean_word_len, symbol_ratio,
    top_word_frac, dup_bigram_frac, has_stopword, keep) — the numeric
    signals are exposed so downstream thresholds can be re-tuned
    without recomputing the corpus pass.

    Entirely map-side (guide §2.4: remove shuffles outright): every
    signal including top_word_frac is a per-row expression, so the
    corpus is scanned once and never shuffled. top_word_frac — the max
    token multiplicity over the token count — is the longest equal-run
    in the doc's SORTED token array (sorting groups equal tokens
    adjacently), one native array_sort + one linear fold per row,
    replacing the former explode → (doc, word) groupBy → doc groupBy →
    join-back (two wide shuffles of every token in the corpus plus a
    corpus-sized join, all to compute a per-doc scalar).
    """
    c = F.col(text_col)
    toked = df.select(F.col(id_col), c.alias("_text"), tokens(text_col).alias("_toks"))
    # zero-token docs contribute no (doc, word) rows in the exploded
    # form and so dropped out of its inner join-back — keep that
    # contract explicitly
    toked = toked.where(F.size("_toks") > 0)
    # longest equal-run over the sorted tokens == max multiplicity;
    # acc = (prev token, current run, best run), one pass, native HOF
    top_count = F.aggregate(
        F.array_sort("_toks"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    base = toked.select(
        id_col,
        F.size("_toks").alias("n_words"),
        # total non-whitespace chars / words — identical to averaging
        # per-token lengths because tokens are the non-space runs
        (
            F.length(F.regexp_replace("_text", r"\s+", "")).cast("double")
            / F.greatest(F.size("_toks"), F.lit(1))
        ).alias("mean_word_len"),
        (
            F.length(F.regexp_replace("_text", r"[A-Za-z0-9\s]", "")).cast("double")
            / F.greatest(F.length("_text"), F.lit(1))
        ).alias("symbol_ratio"),
        F.when(F.size("_toks") < 2, F.lit(0.0))
        .otherwise(
            F.lit(1.0)
            - F.size(shingles_from_tokens(F.col("_toks"), 2)).cast("double")
            / (F.size("_toks") - 1)
        )
        .alias("dup_bigram_frac"),
        F.arrays_overlap(
            F.transform(F.col("_toks"), lambda x: F.lower(x)),
            F.array(*[F.lit(s) for s in STOPWORDS]),
        ).alias("has_stopword"),
        # max multiplicity / token count — the sum of per-word counts
        # IS the token count, so the denominator needs no aggregation
        (top_count.cast("double") / F.size("_toks")).alias("top_word_frac"),
    )
    out = base
    keep = (
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_word_len").between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= MAX_SYMBOL_RATIO)
        & (F.col("top_word_frac") <= MAX_TOP_WORD_FRAC)
        & (F.col("dup_bigram_frac") <= MAX_DUP_BIGRAM_FRAC)
        & F.col("has_stopword")
    )
    return out.select(
        id_col,
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "top_word_frac",
        "dup_bigram_frac",
        "has_stopword",
        keep.alias("keep"),
    )


def unigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality score (Wenzek et al. 2020),
    with the corpus's own unigram distribution standing in for the
    pretrained KenLM this container can't ship: per document, the mean
    negative log2-probability of its tokens under corpus unigram
    frequencies — natural prose scores low (common words), gibberish
    and codes score high. Downstream: keep the head/middle of the
    per-language score distribution, like CCNet's head/middle/tail.

    Shapes at 100 TB: the vocabulary is one token groupBy (map-side
    combined), the scoring join is a token equi-join against that
    vocab (AQE broadcasts it when small), and the per-doc fold is a
    groupBy on the doc key. Cross-engine determinism: each token's
    log2 rounds to 6 decimals and sums as DECIMAL — the plans/common
    policy — so DuckDB reproduces the score bit-for-bit.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    scored = toks.join(vocab, "w").crossJoin(F.broadcast(total)).select(
        id_col,
        F.round(
            -F.log2(F.col("c").cast("double") / F.col("t").cast("double")), 6
        )
        .cast("decimal(18,6)")
        .alias("nlp"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        (F.sum("nlp").cast("double") / F.count("*"))
        .alias("bits_per_token"),
    )


def bigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram upgrade of :func:`unigram_logprob_score` — the KenLM-ish
    order-2 model CCNet actually wants: per document, the mean negative
    log2 of add-one-smoothed conditional probabilities

        p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

    where ``c(w1 w2)`` is the corpus bigram count, ``c(w1 ·)`` the count
    of positions where ``w1`` has a successor, and ``V`` the unigram
    vocabulary size. Word-salad that reuses common tokens in uncommon
    ORDER — invisible to the unigram score — scores high here, which is
    the whole point of raising the model order for quality filtering.

    Documents with fewer than two tokens have no bigram positions and
    drop out (no conditional to score).

    Shapes at 100 TB: bigram construction is a map-only slice+zip
    (``ngram_list``), the bigram table and its per-context fold are two
    map-side-combined groupBys, the scoring join is an equi-join on the
    bigram string (AQE broadcasts the model side when it fits), and V
    is a 1-row broadcast scalar. Same DECIMAL-rounding determinism
    policy as the unigram score.

    Join geometry (guide §2.3/§3): the per-position ``grams`` table is
    the corpus-sized side; the model tables (``bi``, ``ctx``) are
    vocabulary-sized. The context count folds INTO the bigram table
    first (model ⨝ model), so the corpus side crosses exactly one
    join — attaching ``ctx`` to ``grams`` in a second big-side join
    would shuffle the positions table twice for the same output.
    """
    grams = df.select(
        F.col(id_col), F.explode(ngram_list(tokens(text_col), 2)).alias("g")
    )
    bi = grams.groupBy("g").agg(F.count("*").alias("c2"))
    ctx = (
        bi.withColumn("w1", F.split(F.col("g"), " ").getItem(0))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    model = (
        bi.withColumn("w1", F.split(F.col("g"), " ").getItem(0))
        .join(ctx, "w1")
        .select("g", "c2", "c1")
    )
    vocab_size = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    scored = (
        grams.join(model, "g")
        .crossJoin(F.broadcast(vocab_size))
        .select(
            id_col,
            F.round(
                -F.log2(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("nlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (F.sum("nlp").cast("double") / F.count("*"))
        .alias("bits_per_bigram"),
    )


# Per-document token bound for the packed (doc, start) BIGINT ordinal
# in remove_duplicate_spans: start must fit in one slot or cross-doc
# first-occurrence ordering silently corrupts.
_ORD_SLOT = 1_000_000


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Token-level duplicate-substring removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") at
    ``k``-gram granularity: every SLIDING window of ``k`` consecutive
    tokens that occurs more than once corpus-wide keeps only its first
    occurrence (first = min (doc, start) order); all token positions
    covered by a later occurrence are deleted and the surviving tokens
    reassembled. Unlike :func:`span_dedup` (window-ALIGNED segments,
    the C4 line-dedup shape), this catches duplicated substrings at ANY
    alignment — the suffix-array use case, served here by rolling
    windows instead of a suffix array (the distributed-friendly form).

    Returns (id, n_tokens, n_removed, text_clean).

    100 TB shape: gram construction is a map-only slice+zip with
    positions; the first-occurrence pick is a groupBy-min on the gram
    (an agg, not a window — hot boilerplate grams collapse map-side);
    coverage expansion explodes at most k offsets per DUPLICATE
    instance (tracks duplication mass, not corpus size) and collapses
    straight into ONE per-doc position-set aggregation; the removal
    itself is map-side — a doc-level join attaches each doc's covered
    position set and a native array filter drops those positions, so
    no token-level row ever crosses a shuffle (the former shape
    anti-joined every token position in the corpus and re-assembled
    docs through a collect_list groupBy: two corpus-wide token-level
    shuffles plus a per-doc sort, all replaced by per-row array ops —
    guide §2.4). The covered-set join is doc-level and sized by
    duplication mass; AQE broadcasts it when small. Per-doc removal
    cost is O(n_tokens · |covered|) array probes, bounded by the
    packed-ordinal doc-size cap below. Nothing collects to the driver.
    """
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    # packed (doc, start) ordinal below: one BIGINT min instead of a
    # struct min — same comparator on both engines. Valid only while
    # every doc has < 1e6 tokens (start stays inside its slot); an
    # oversized doc must fail loudly, not corrupt cross-doc ordering.
    toked = toked.withColumn(
        "_toks",
        F.when(
            F.size("_toks") < _ORD_SLOT, F.col("_toks")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "remove_duplicate_spans: document exceeds the "
                        f"{_ORD_SLOT}-token packed-ordinal bound: id="
                    ),
                    F.col(id_col).cast("string"),
                )
            )
        ),
    )
    grams = toked.select(
        id_col, F.posexplode(ngram_list(F.col("_toks"), k)).alias("start", "g")
    )
    ordc = (F.col(id_col) * F.lit(_ORD_SLOT) + F.col("start")).alias("ord")
    occ = grams.select("g", ordc)
    firsts = occ.groupBy("g").agg(
        F.min("ord").alias("first_ord"), F.count("*").alias("n_occ")
    )
    dup_inst = (
        grams.select(id_col, "start", "g", ordc)
        .join(firsts.where(F.col("n_occ") > 1), "g")
        .where(F.col("ord") != F.col("first_ord"))
    )
    covered_sets = (
        dup_inst.select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(k - 1))
            ).alias("pos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_cov"))
    )
    # kept positions = ordinals minus the covered set. array_except
    # hashes its second argument once per row (O(n_tokens + |covered|)),
    # where the former per-token array_contains probe was
    # O(n_tokens × |covered|) — a large, heavily self-duplicated doc
    # near the packed-ordinal cap made a single row quadratic on one
    # executor thread (ADVICE r13). array_except preserves first-arg
    # order and ordinals are distinct, so the kept list stays ascending
    # and the gather below reproduces the filter exactly. The
    # covered-set branch only runs when _cov is non-null, which implies
    # n_tokens >= k >= 1, so the ordinal sequence is never empty.
    kept_pos = F.array_except(
        F.sequence(F.lit(0), F.size("_toks") - 1), F.col("_cov")
    )
    kept_arr = F.when(F.col("_cov").isNull(), F.col("_toks")).otherwise(
        F.transform(kept_pos, lambda p: F.element_at("_toks", p + F.lit(1)))
    )
    return (
        toked.join(covered_sets, id_col, "left")
        .select(
            F.col(id_col),
            F.size("_toks").cast("bigint").alias("n_tokens"),
            kept_arr.alias("_kept"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.size("_kept")).cast("bigint").alias("n_removed"),
            F.array_join(F.col("_kept"), " ").alias("text_clean"),
        )
    )


def ccnet_quality_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's head/middle/tail carve (Wenzek et al. 2020): bucket each
    language's documents into ``n_buckets`` quality terciles of the
    LM score (:func:`unigram_logprob_score`; lower bits = more natural
    prose = head), then summarize each (lang, tier) cell. Downstream
    pipelines keep head+middle and drop tail — the canonical
    quality-stratified sampling step between scoring and export.

    Output per (lang, tier): doc count, total tokens, and the score
    range covered — integers and min/max of per-doc doubles, all
    order-insensitive, so the summary is cross-engine exact.

    Shapes at 100 TB: scoring is the unigram pass (see its docstring);
    the tercile split is ntile over a per-LANGUAGE window — partitioned
    by the natural parallelism key, never a global sort — and the
    summary is one tiny groupBy.
    """
    from pyspark.sql.window import Window

    scores = unigram_logprob_score(df, id_col=id_col, text_col=text_col)
    joined = scores.join(df.select(id_col, lang_col), id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.asc("bits_per_token"), F.asc(id_col)
    )
    tiered = joined.withColumn(
        "bucket", F.ntile(n_buckets).over(w).cast("bigint")
    ).withColumn(
        "tier",
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == n_buckets, "tail")
        .otherwise("middle"),
    )
    return tiered.groupBy(lang_col, "bucket", "tier").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min("bits_per_token").alias("min_bits"),
        F.max("bits_per_token").alias("max_bits"),
    )


def dsir_importance(
    df: DataFrame,
    target_cond: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    ngram_n: int = 2,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023):
    score every document by how target-domain-like its hashed n-gram
    profile is, for selecting pretraining data that matches a target
    distribution (here ``target_cond`` marks the target rows, e.g.
    ``F.col('lang') == 'en'``).

    Features are word-``ngram_n``-grams hashed into ``n_buckets``
    (md5 -> bucket, the cross-engine idiom). Bucket weight is the
    add-one-smoothed log-likelihood ratio
    ``log2((t_b+1)/(T+B)) - log2((s_b+1)/(S+B))`` of target vs source
    (non-target) counts; a document's importance is the mean weight of
    its n-grams. Resampling = keep the top-k / sample proportional to
    exp(score) downstream.

    Shapes: two bucket-level groupBys (B=4096 rows each — broadcast
    back), one explode-join per doc n-gram, one per-doc fold. No
    all-pairs anything; the bucket table is tiny by construction.
    Same DECIMAL-rounding determinism policy as the other scores.
    """
    grams = df.select(
        F.col(id_col),
        target_cond.alias("_is_target"),
        F.explode(ngram_list(tokens(text_col), ngram_n)).alias("g"),
    ).withColumn(
        "b",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("long"),
            F.lit(n_buckets),
        ),
    )
    counts = grams.groupBy("b").agg(
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("t_b"),
        F.sum(F.when(F.col("_is_target"), 0).otherwise(1)).alias("s_b"),
    )
    totals = counts.agg(
        F.sum("t_b").alias("T"), F.sum("s_b").alias("S")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log2((F.col("t_b") + 1).cast("double") / (F.col("T") + n_buckets).cast("double"))
            - F.log2((F.col("s_b") + 1).cast("double") / (F.col("S") + n_buckets).cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("w_b"),
    )
    return (
        grams.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            (F.sum("w_b").cast("double") / F.count("*")).alias("importance"),
        )
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 10,
) -> DataFrame:
    """Corpus-level exact span dedup (C4 / RefinedWeb line-dedup shape,
    Lee et al. 2021 "Deduplicating Training Data" at fixed-window
    granularity): segment every document into consecutive
    ``span_tokens``-word spans, keep only the FIRST occurrence of each
    distinct span corpus-wide (first = min (doc, position)), and
    reassemble the surviving text. Real web corpora split on newlines;
    the span window is the structure-free equivalent this synthetic
    corpus supports, and the parameterization is the same operator.

    Returns (id, n_spans, n_kept, text_clean) — documents whose spans
    are all duplicates survive with ``text_clean = ''`` so the caller
    can drop or quarantine them.

    100 TB shape: one groupBy-min keyed by the span string (map-side
    combinable — hot boilerplate spans collapse before the shuffle),
    one equi-join back on the span, one per-doc reassembly groupBy.
    Nothing is ever collected; no window over a skewed partition (the
    first-occurrence pick is an agg, not a ROW_NUMBER over hot spans).
    """
    spans_arr = "_spans"
    n_sp = F.ceil(F.size("_toks") / F.lit(float(span_tokens))).cast("int")
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks")).select(
        id_col,
        F.when(F.size("_toks") == 0, F.array().cast("array<string>"))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), n_sp),
                lambda i: F.array_join(
                    F.slice(
                        F.col("_toks"),
                        (i - F.lit(1)) * span_tokens + F.lit(1),
                        F.lit(span_tokens),
                    ),
                    " ",
                ),
            )
        )
        .alias(spans_arr),
    )
    sp = toked.select(id_col, F.posexplode(spans_arr).alias("pos", "seg"))
    firsts = sp.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
            "_first"
        )
    )
    kept = (
        sp.join(firsts, "seg")
        .where(
            (F.col(id_col) == F.col("_first.d")) & (F.col("pos") == F.col("_first.p"))
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("text_clean"),
        )
    )
    totals = sp.groupBy(id_col).agg(F.count("*").alias("n_spans"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        F.col("n_spans").cast("bigint").alias("n_spans"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
) -> DataFrame:
    """fastText-style hashed linear classifier scoring (Joulin et al.
    2017): bag-of-words features hashed into ``n_features`` buckets, a
    per-bucket weight, document score = mean bucket weight, label =
    score > 0. The container ships no trained model, so bucket weights
    are hash-derived pseudo-weights in [-1, 1] — the md5 idiom keeps
    them bit-identical in DuckDB, and swapping in trained weights is a
    broadcast-join on the bucket id with the identical plan shape.

    Entirely map-only: the feature hash, weight lookup, and mean fold
    are per-row array HOFs — zero shuffles, embarrassingly parallel at
    any corpus size. DECIMAL(18,6) weight rounding is the plans/common
    determinism policy.
    """

    def _md5_long(c: Column) -> Column:
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    def _weight(tok: Column) -> Column:
        bucket = F.pmod(_md5_long(tok), F.lit(n_features))
        raw = F.pmod(_md5_long(bucket.cast("string")), F.lit(2001)) - 1000
        return F.round(raw.cast("double") / 1000.0, 6).cast("decimal(18,6)")

    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    w_sum = F.aggregate(
        F.transform(F.col("_toks"), _weight),
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, x: acc + x,
    )
    n_toks = F.size("_toks")
    return toked.select(
        id_col,
        n_toks.cast("bigint").alias("n_tokens"),
        F.when(n_toks == 0, F.lit(0.0))
        .otherwise(w_sum.cast("double") / n_toks)
        .alias("score"),
        F.when(n_toks == 0, F.lit(False))
        .otherwise(w_sum > 0)
        .alias("label"),
    )


def bloom_bitmap(
    grams: DataFrame, gram_col: str = "ngram", m_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Bloom-filter bitmap of a gram set as (word_idx, bits) rows —
    ``m_bits`` bits packed into ``m_bits/64`` longs, ``k`` xxhash64
    probes per gram. Built with one explode + one bit_or groupBy; the
    result is a table, never a driver-side object, so the filter can be
    arbitrarily large and still broadcast-join like any small dim
    (2^30 bits = 16M rows ~ 128 MB: exactly Spark's broadcast sweet
    spot for a fleet-wide membership gate)."""
    pos = grams.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(gram_col), F.lit(seed)), F.lit(m_bits))
                    for seed in range(k)
                ]
            )
        ).alias("p")
    )
    return (
        pos.select(
            F.shiftright("p", 6).alias("word_idx"),
            # shiftleft needs a literal shift in the Python API; the
            # column-shift form goes through expr
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def contamination_bloom(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Production-path decontamination: probe train n-grams against a
    Bloom bitmap of the eval set instead of broadcasting the raw gram
    strings (`contamination_report`). Zero false negatives by
    construction — every truly contaminated document is flagged; a
    tunable false-positive tail over-flags (safe direction for
    decontamination). At 100 TB the bitmap is ~10 bits/gram vs ~50+
    bytes/gram of strings: a 1e9-gram eval battery broadcasts as
    ~1.25 GB of longs instead of an un-broadcastable 50 GB set.

    Returns (doc_id, n_grams, n_flagged, contaminated); xxhash64 is
    not reproducible in DuckDB, so this is a rows-only query — the
    pytest pin proves flagged ⊇ exact and bounds the FP excess.
    """
    eval_g = _doc_ngrams(evalset, id_col, text_col, n).select("ngram").distinct()
    bloom = bloom_bitmap(eval_g, m_bits=m_bits, k=k)
    train_g = _doc_ngrams(train, id_col, text_col, n)
    probes = train_g.select(
        id_col,
        "ngram",
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("ngram"), F.lit(seed)), F.lit(m_bits))
                    for seed in range(k)
                ]
            )
        ).alias("p"),
    ).select(
        id_col,
        "ngram",
        F.shiftright("p", 6).alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("mask"),
    )
    hit = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            id_col,
            "ngram",
            F.coalesce(
                F.col("bits").bitwiseAND(F.col("mask")) != 0, F.lit(False)
            ).alias("bit_set"),
        )
        .groupBy(id_col, "ngram")
        .agg(F.min(F.col("bit_set").cast("int")).alias("all_set"))
    )
    return hit.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.sum("all_set").cast("bigint").alias("n_flagged"),
        (F.sum("all_set") > 0).alias("contaminated"),
    )
