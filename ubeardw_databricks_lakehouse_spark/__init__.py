"""ubeardw_databricks_lakehouse_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and
data-processing capabilities of the reference lakehouse
(kpatc/uBearDW-databricks-lakehouse): a medallion (Bronze -> Silver ->
Gold) CDC warehouse with SCD Type-2 dimensions, a trip-lifecycle fact
pivot, data-quality expectations, and maintenance utilities — plus
LLM-training-data pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Everything here is declarative DataFrame/SQL first: Catalyst plans the
physical execution; Python stays out of the hot path (Arrow-batched
pandas UDFs only where built-ins genuinely cannot express the
semantics).
"""

__version__ = "0.1.0"
