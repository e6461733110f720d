"""Fine-grained access control — row filters + column masks applied at
read time (the governance layer of the reference's platform:
cf. Databricks Lakeguard, SIGMOD 2025, and Unity Catalog row
filters/column masks; same concept as Spark's view-based security).

Policies are DECLARATIVE SQL expressions attached per (principal,
table) and folded into the plan BEFORE any user operator sees the
frame — Catalyst pushes the row filter into the scan like any other
predicate (zero-cost governance: a filtered read prunes partitions
and row groups exactly as a WHERE would), and masks are column
expressions that whole-stage-compile with the rest of the projection.
Nothing is copied, nothing is post-processed.

Scale shape: policy application is plan rewriting, not data movement —
the only runtime cost is whatever the filter/mask expressions
themselves cost, which the optimizer sees and can push down.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TablePolicy:
    """row_filter: SQL boolean over the table's columns (None = all
    rows). column_masks: {column -> SQL expression over the table's
    columns} replacing the column's value for this principal."""

    row_filter: str | None = None
    column_masks: dict[str, str] = field(default_factory=dict)


def apply_policy(df: DataFrame, policy: TablePolicy) -> DataFrame:
    """Fold a policy into the plan: filter first (so masks cannot leak
    filtered rows through error channels), then mask columns in place
    — the output schema is unchanged, values are governed.

    All masks are built in ONE select over the pre-mask frame, matching
    Unity Catalog semantics: every mask expression evaluates against
    the ORIGINAL row, so a mask referencing another masked column sees
    that column's unmasked value (sequential withColumn would feed it
    the already-masked one)."""
    if policy.row_filter:
        df = df.where(F.expr(policy.row_filter))
    if not policy.column_masks:
        return df
    dtypes = dict(df.dtypes)
    cols = []
    for col in df.columns:
        if col in policy.column_masks:
            cols.append(
                F.expr(policy.column_masks[col]).cast(dtypes[col]).alias(col)
            )
        else:
            cols.append(F.col(col))
    unknown = set(policy.column_masks) - set(df.columns)
    if unknown:
        raise ValueError(f"mask targets unknown column(s) {sorted(unknown)!r}")
    return df.select(*cols)


class PolicyCatalog:
    """Per-(principal, table) policy grants; ``read_as`` is the
    governed read path. No policy granted = no access (deny by
    default, the Lakeguard/UC posture); an explicit ``TablePolicy()``
    grants unrestricted read."""

    def __init__(self, lake):
        self.lake = lake
        self._grants: dict[tuple[str, str], TablePolicy] = {}

    def grant(self, principal: str, table: str, policy: TablePolicy) -> None:
        self._grants[(principal, table)] = policy

    def revoke(self, principal: str, table: str) -> None:
        self._grants.pop((principal, table), None)

    def read_as(self, principal: str, table: str) -> DataFrame:
        key = (principal, table)
        if key not in self._grants:
            raise PermissionError(
                f"principal {principal!r} has no grant on {table!r}"
            )
        return apply_policy(self.lake.read(table), self._grants[key])
