"""As-of (point-in-time) join — attach the most recent right-side row
at or before each left row's timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
range-join formulation (l JOIN r ON key AND r.ts <= l.ts, then keep
the max r.ts) explodes to |l|x|r| pairs per key before pruning. The
scale-correct shape is union + window: interleave both sides on
(key, ts), carry the right side's payload forward with
last(ignorenulls) over an unbounded-preceding frame, then keep the
left rows. One shuffle on the key, a per-key sort, zero row
amplification — the same plan Flink's temporal join and kdb's aj
lower to.

Tie semantics: a right row at exactly the left row's timestamp DOES
match (the right side orders first at equal ts) — matching DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Backward as-of join. ``right`` columns other than the keys and
    timestamp are carried onto each ``left`` row from the latest right
    row with ``right_ts <= left_ts`` (NULLs when none exists yet).

    Right-side payload columns must not collide with left column names
    (alias them before the call) — the join validates this.
    """
    payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join payload collides with left columns: {sorted(clash)}")

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    for c in payload:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    r_tagged = (
        right.withColumn("_ts", F.col(right_ts))
        .withColumn("_side", F.lit(0))
    )
    for c in left.columns:
        if c not in on and c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    cols = on + ["_ts", "_side"] + payload + [
        c for c in left.columns if c not in on
    ]
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    # right rows order before left at equal ts so ties match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *on,
        "_side",
        *[c for c in left.columns if c not in on],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
