"""real_time_fraud_revenue_intelligence_lakehouse_spark
======================================================

A brand-new PySpark-native analytics engine with the query and
data-processing capabilities of the reference lakehouse
(Prudhvirajrekula/Real-Time-Fraud-Revenue-Intelligence-Lakehouse):
medallion-style cleansing, enrichment joins, velocity/window features,
KPI aggregations, star-schema marts, data-quality predicates, and
streaming ingest semantics — re-expressed as a composable DataFrame
operator library designed for 100 TB scale, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal columns).

Everything is declarative DataFrame/SQL so Catalyst handles predicate
pushdown, column pruning, broadcast selection and AQE re-planning;
Python UDFs are banned from the relational core (pandas UDFs appear
only in `ext/` where vectorized Arrow execution is the idiomatic tool).
"""

__version__ = "0.1.0"

from real_time_fraud_revenue_intelligence_lakehouse_spark.session import get_spark  # noqa: F401
