from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    all_oracles,
    query,
)
