"""Mergeable t-digest quantile sketch — the bounded-size percentile
summary the 100 TB warehouse stores and merges instead of re-scanning
raw values (Dunning & Ertl, "Computing Extremely Accurate Quantiles
Using t-Digests", own implementation from the paper).

The battery already covers exact grouped quantiles (applyInPandas) and
Spark's built-in ``percentile_approx`` (one-shot GK inside an
aggregate), but neither yields a REUSABLE summary: a t-digest is a
kilobyte-sized row (centroid means + weights + min/max/total) that

- builds in one distributed pass (per-Arrow-batch partial digests via
  mapInPandas, merged per group via applyInPandas — the treeAggregate
  shape: the shuffle carries only partial digests, never raw values);
- MERGES associatively: per-day / per-source / per-shard digests
  re-cluster into coarser rollups without touching the data again
  (``tdigest_merge``), the property count sketches (CMS/KMV/HLL) have
  for counts and nothing in the battery had for quantiles;
- answers any quantile at read time (``tdigest_quantiles``).

Accuracy: clustering uses the k1 scale function
k(q) = (delta / 2*pi) * asin(2q - 1); cluster sizes taper toward the
tails, so rank error is ~O(1/delta) in the middle and far tighter at
extreme quantiles — pytest pins assert rank error <= 1.5/delta on
uniform/lognormal/adversarial inputs and that shard-merge estimates
stay within the same bound. min/max/total are EXACT under build and
merge (pinned).

Estimates are implementation-defined (no DuckDB twin) — the registry
entry is rows-only by design with the pytest error pins, same policy
as q_approx_profile.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIGEST_FIELDS = (
    "means array<double>, weights array<double>, "
    "tmin double, tmax double, total double"
)


def _k(q, delta: float):
    """k1 scale function — numpy-vectorized, clipped to the open
    domain of asin."""
    import numpy as np

    return delta / (2.0 * math.pi) * np.arcsin(
        np.clip(2.0 * q - 1.0, -1.0, 1.0)
    )


def _compress(means, weights, delta: float):
    """Re-cluster a centroid multiset: sort by mean, assign each
    centroid the k-index of its mid-rank quantile, merge per index.
    Every output cluster spans <= 1 k-unit of its INPUT centroids
    (boundary straddles can push the realized span slightly past one
    unit — absorbed by the pinned error bound), preserving the
    taper-at-the-tails size profile. Vectorized numpy groupby — no
    Python loop over centroids."""
    import numpy as np

    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    order = np.argsort(means, kind="mergesort")
    m, w = means[order], weights[order]
    total = w.sum()
    if total <= 0 or len(m) == 0:
        return m, w
    mid_rank = np.cumsum(w) - w / 2.0
    kidx = np.floor(_k(mid_rank / total, delta)).astype(np.int64)
    # groupby consecutive k-index (kidx is sorted because k and
    # cumsum are monotone)
    first = np.ones(len(kidx), dtype=bool)
    first[1:] = kidx[1:] != kidx[:-1]
    gid = np.cumsum(first) - 1
    n_out = gid[-1] + 1
    out_w = np.zeros(n_out)
    out_mw = np.zeros(n_out)
    np.add.at(out_w, gid, w)
    np.add.at(out_mw, gid, m * w)
    return out_mw / out_w, out_w


def _quantile(means, weights, tmin, tmax, total, q: float):
    """Interpolated quantile over a digest: centroids anchor at their
    mid-rank, min/max anchor ranks 0 and total (exact by
    construction), np.interp between anchors."""
    import numpy as np

    if total is None or total <= 0:
        return None
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    cum = np.cumsum(weights) - weights / 2.0
    xs = np.concatenate(([0.0], cum, [float(total)]))
    ys = np.concatenate(([float(tmin)], means, [float(tmax)]))
    return float(np.interp(q * float(total), xs, ys))


def tdigest_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    delta: float = 200.0,
) -> DataFrame:
    """One digest row per group: (group_cols..., means, weights, tmin,
    tmax, total). Nulls in ``value_col`` are excluded (SQL aggregate
    semantics); an all-null group yields no row.

    100 TB shape: mapInPandas emits one PARTIAL digest per (Arrow
    batch, group) — bounded memory, no shuffle of raw values — then
    one groupBy shuffles the kilobyte partials and applyInPandas
    merges each group. Build once, store the row, merge forever.
    """
    import pandas as pd

    groups = list(group_cols or [])
    src = df.select(
        *[F.col(c) for c in groups], F.col(value_col).alias("_v")
    ).where(F.col(value_col).isNotNull())
    partial_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name != "_v"
    )
    partial_schema = (
        f"{partial_schema}, {_DIGEST_FIELDS}" if groups else _DIGEST_FIELDS
    )

    d = float(delta)

    def build_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            if groups:
                grouped = pdf.groupby(groups, dropna=False, sort=False)
            else:
                grouped = [((), pdf)]
            rows = []
            for key, g in grouped:
                v = g["_v"].to_numpy(dtype="float64")
                m, w = _compress(v, [1.0] * len(v), d)
                key = key if isinstance(key, tuple) else (key,)
                rows.append(
                    (*key, list(m), list(w), float(v.min()),
                     float(v.max()), float(len(v)))
                )
            yield pd.DataFrame(
                rows,
                columns=groups
                + ["means", "weights", "tmin", "tmax", "total"],
            )

    partials = src.mapInPandas(build_partials, partial_schema)
    return _merge_digest_rows(partials, groups, d)


def tdigest_merge(
    digests: DataFrame,
    group_cols: list[str] | None = None,
    delta: float = 200.0,
) -> DataFrame:
    """Merge digest rows to a coarser grouping (``group_cols`` must be
    a subset of the digests' group columns; [] or None = one global
    digest). The input rows' centroids form the multiset to
    re-cluster — the data they summarize is never touched."""
    return _merge_digest_rows(digests, list(group_cols or []), float(delta))


def _merge_digest_rows(
    partials: DataFrame, groups: list[str], delta: float
) -> DataFrame:
    import pandas as pd

    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in partials.schema.fields
            if f.name in groups
        )
        + (", " if groups else "")
        + _DIGEST_FIELDS
    )

    def merge(key, pdf):
        import numpy as np

        m = np.concatenate([np.asarray(x, dtype="float64") for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype="float64") for x in pdf["weights"]])
        mm, ww = _compress(m, w, delta)
        return pd.DataFrame(
            [(*key, list(mm), list(ww), float(pdf["tmin"].min()),
              float(pdf["tmax"].max()), float(pdf["total"].sum()))],
            columns=groups + ["means", "weights", "tmin", "tmax", "total"],
        )

    if groups:
        return partials.groupBy(*groups).applyInPandas(merge, out_schema)
    # global: one group — the reducer's INPUT is O(partitions) partial
    # digests (kilobytes each), the treeAggregate root, not a data path
    return partials.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda key, pdf: merge((), pdf), out_schema
    )


def tdigest_quantiles(
    digests: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Read quantiles off digest rows: one output row per (group, q)
    — (group_cols..., q, value). Pure per-row math over kilobyte
    summaries (a pandas UDF pass, no shuffle)."""
    import pandas as pd

    groups = list(group_cols or [])
    qs = [float(q) for q in quantiles]
    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in digests.schema.fields
            if f.name in groups
        )
        + (", " if groups else "")
        + "q double, value double"
    )

    def read(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for q in qs:
                    rows.append(
                        (*[getattr(r, g) for g in groups], q,
                         _quantile(r.means, r.weights, r.tmin, r.tmax,
                                   r.total, q))
                    )
            yield pd.DataFrame(rows, columns=groups + ["q", "value"])

    return digests.mapInPandas(read, out_schema)
