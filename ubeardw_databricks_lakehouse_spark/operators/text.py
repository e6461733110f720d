"""Text-analysis operators for LLM training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language-ID,
quality scoring, token counting, and document fingerprinting over a
``documents(doc_id, text, ...)`` table.

Everything here is pure Column expressions — JVM-side, codegen'd,
shuffle-free (per-row), so a 100 TB corpus is embarrassingly parallel
at whatever partitioning the scan produced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WHITESPACE = r"\s+"

# tiny per-language stopword marker sets (n-gram heuristic lang-ID)
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|with|for|that)\b",
    "fr": r"\b(le|la|les|des|une)\b",
    "es": r"\b(el|los|las|una|que)\b",
    "de": r"\b(der|die|und|das|ist)\b",
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, WHITESPACE), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish count: split on whitespace AND letter/digit boundaries
    (a cheap stand-in for BPE tokenization, ~deterministic everywhere)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"[\s]+|(?<=[a-z])(?=[0-9])"), lambda x: x != ""))


def lang_id(col: Column | str) -> Column:
    """First-match stopword heuristic; 'und' (undetermined) otherwise."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for lang, pattern in LANG_MARKERS.items():
        branch = F.lower(c).rlike(pattern)
        expr = F.when(branch, lang) if expr is None else expr.when(branch, lang)
    return expr.otherwise("und")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1))


def digit_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    )


def stopword_ratio(col: Column | str) -> Column:
    """Share of tokens that are (English) stopwords — quality signal."""
    stop = F.array(*[F.lit(w) for w in ["the", "and", "of", "to", "a", "in", "is"]])
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, F.lower(x))))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite 0-1 quality score: long enough, low punct/digit noise,
    some-but-not-all stopwords. Deterministic integer-derived doubles."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio(c) * 10, F.lit(1.0)))
        + F.lit(0.3) * (F.lit(1.0) - F.least(digit_ratio(c) * 10, F.lit(1.0)))
    )


def fingerprint(col: Column | str) -> Column:
    """Whitespace-normalized md5 content fingerprint (exact-dup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(c, WHITESPACE, " ")))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    out_col: str = "winnow_sel",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS scheme): hash every character k-gram, slide a w-hash
    window, keep each window's minimum; the selected set survives
    partial edits, so shared selections expose partial overlap that a
    whole-document hash cannot.

    Adds ``out_col``: the sorted distinct selection as an array of
    fixed-width hash strings. The per-gram hash is the first 15 hex
    chars of md5 — a rolling (Rabin-Karp) hash computes the same
    selection O(1) per step; md5 keeps it reproducible in any engine,
    and min-over-hex == min-over-value at fixed width.

    Two projections on purpose: the k-gram hash array lands as a real
    column before the window pass references it — inlined into the
    window lambdas, Catalyst re-derives the whole array per window
    (no CSE across lambdas; measured O(n²) md5 blowup, ~50x slower).
    Map-only at corpus scale either way.
    """
    c = F.col(text_col)
    n = F.length(c) - F.lit(k - 1)  # number of k-grams
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )
    hashed = df.withColumn(
        "_wh",
        F.when(n >= 1, F.transform(grams, lambda g: F.substring(F.md5(g), 1, 15))),
    )
    hs = F.col("_wh")
    m = F.size(hs)  # -1 for NULL (empty doc)
    # with fewer grams than the window, one window covers them all
    n_windows = F.when(m >= w, m - F.lit(w - 1)).when(m >= 1, F.lit(1)).otherwise(
        F.lit(0)
    )
    minima = F.transform(
        F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
        lambda i: F.array_min(F.slice(hs, i, w)),
    )
    sel = F.when(
        n_windows >= 1, F.array_sort(F.array_distinct(minima))
    ).otherwise(F.array().cast("array<string>"))
    return hashed.withColumn(out_col, sel).drop("_wh")


def winnow_selections(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    w: int = 8,
) -> DataFrame:
    """Winnow selections as ROWS — (id_col, h), distinct.

    Same selection as ``winnow_fingerprints`` but computed with a
    row-level window-min instead of array lambdas: posexplode the
    k-gram hashes, ``min(h) OVER (PARTITION BY doc ORDER BY pos ROWS
    w-1 FOLLOWING)``, keep window-start rows, distinct. This is the
    join-ready shape (overlap detection equi-joins on ``h``) and the
    one that composes safely: array-lambda winnowing referenced from
    several join branches re-inlines the hash derivation into every
    window lambda (Catalyst has no CSE across lambdas — measured
    O(n²) md5 blowup); here each hash is computed once per pass and
    the window is a single per-doc sort.
    """
    from pyspark.sql.window import Window

    c = F.col(text_col)
    n = F.length(c) - F.lit(k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )
    hashed = df.select(
        F.col(id_col),
        F.when(
            n >= 1, F.transform(grams, lambda g: F.substring(F.md5(g), 1, 15))
        ).alias("_wh"),
    )
    ex = hashed.select(
        id_col,
        F.size("_wh").alias("_n"),
        F.posexplode("_wh").alias("_pos", "_h"),
    )
    wspec = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        ex.withColumn("_m", F.min("_h").over(wspec))
        .where(F.col("_pos") <= F.greatest(F.col("_n") - w, F.lit(0)))
        .select(F.col(id_col), F.col("_m").alias("h"))
        .distinct()
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full per-document analysis column set."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_chars_obs", F.length(c))
        .withColumn("predicted_lang", lang_id(c))
        .withColumn("punct_ratio", punct_ratio(c))
        .withColumn("digit_ratio", digit_ratio(c))
        .withColumn("quality", quality_score(c))
        .withColumn("fingerprint", fingerprint(c))
    )


# --- PII scrubbing -------------------------------------------------------
# Training corpora scrub contact info before anything else sees the
# text. Patterns stick to syntax Java regex and RE2/DuckDB agree on
# (no lookarounds, no backrefs) so the scrub is oracle-reproducible;
# order matters — emails before phones (the phone pattern would eat
# digit runs inside an address), IPs before phones (dotted quads parse
# as the phone charset).

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{6,}[0-9]", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace emails/phones/IPs with typed placeholder tokens."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """One ``n_{kind}`` count column per PII pattern (pre-redaction)."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    cur = c
    for kind, pat, token in PII_PATTERNS:
        out.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, token)  # count on the scrubbed rest
    return out


def ngram_list(toks: Column, n: int) -> Column:
    """ALL word n-grams in order (duplicates kept) — the counting twin
    of ``dedup.shingles_from_tokens``, same slice+zip construction
    minus the distinct."""
    if n == 1:
        return toks
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return acc


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Gopher's repetition filters (Rae et al. 2021, §A1.1), the rules
    ``gopher_quality_flags`` doesn't already cover: machine-generated
    and boilerplate text repeats itself at the line and n-gram level
    long before word-frequency stats notice.

    Per document:
      n_lines            non-empty lines
      dup_line_frac      fraction of lines that are repeats of an
                         earlier-seen line (1 - distinct/total)
      dup_line_char_frac character mass sitting in duplicated lines /
                         total line characters
      dup_ngram_frac     fraction of word ``n``-grams that are repeats

    Every metric is a pure per-row column expression (array HOFs over
    the doc's own lines/grams) — map-only, no shuffle, so the corpus
    pass is one scan at any scale. The char-mass metric is O(L^2) in
    lines-per-doc via nested filter, fine for L in the hundreds;
    explode+groupBy is the fallback if documents ever carry 10k+ lines.
    """
    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    toked = df.select(
        F.col(id_col),
        lines.alias("_lines"),
        ngram_list(tokens(text_col), n).alias("_grams"),
    )
    n_lines = F.size("_lines")
    n_dist = F.size(F.array_distinct("_lines"))
    line_chars = F.aggregate(
        F.col("_lines"), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    dup_chars = F.aggregate(
        F.array_distinct("_lines"),
        F.lit(0),
        lambda acc, l: acc
        + F.when(
            F.size(F.filter(F.col("_lines"), lambda x: x == l)) > 1,
            F.size(F.filter(F.col("_lines"), lambda x: x == l)) * F.length(l),
        ).otherwise(F.lit(0)),
    )
    n_grams = F.size("_grams")
    return toked.select(
        id_col,
        n_lines.alias("n_lines"),
        F.round(
            (n_lines - n_dist).cast("double") / F.greatest(n_lines, F.lit(1)), 6
        ).alias("dup_line_frac"),
        F.round(
            dup_chars.cast("double") / F.greatest(line_chars, F.lit(1)), 6
        ).alias("dup_line_char_frac"),
        F.round(
            (n_grams - F.size(F.array_distinct("_grams"))).cast("double")
            / F.greatest(n_grams, F.lit(1)),
            6,
        ).alias("dup_ngram_frac"),
    )
