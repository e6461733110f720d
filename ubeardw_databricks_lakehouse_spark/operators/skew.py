"""Salted joins for skewed keys.

AQE's skew-join splitting handles most skew at runtime, but it only
helps sort-merge joins and only after a shuffle has already placed the
hot key's rows; a planned salt is still the tool when one key carries
an outsized share (null-heavy foreign keys, celebrity users, empty-doc
fingerprints) and the join must stay a hash join. The recipe:

- fact side: append a random-ish salt in [0, n_salts) derived from a
  UNIQUE column (never ``rand()`` — see F13; hash-derived salt keeps
  runs reproducible),
- dim side: explode each row into all n_salts copies,
- join on (key, salt) — the hot key now spreads over n_salts tasks.

Results are identical to the unsalted join (the salt is a pure
partitioning artifact), which is exactly what the oracle query checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_from: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated over ``n_salts`` salt
    values. ``salt_from`` names fact column(s) (ideally unique
    together) whose hash spreads the hot key's rows across salts
    deterministically.

    Dim-side cost is |dim| x n_salts rows of shuffle — keep n_salts
    near (hot-key rows / target task rows), and keep the dim the
    smaller side.
    """
    cols = [salt_from] if isinstance(salt_from, str) else list(salt_from)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")
    f = fact.withColumn("_salt", salt)
    # sequence(int, int) yields array<int>, matching the fact salt type;
    # a generator cannot sit inside another expression (no cast here)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [*on, "_salt"], how).drop("_salt")
