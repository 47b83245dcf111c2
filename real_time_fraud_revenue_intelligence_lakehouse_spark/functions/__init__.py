from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import (  # noqa: F401
    amount_tier,
    epoch_ms,
    exact_avg,
    exact_sum,
    mask_dotted,
    rate,
    surrogate_key,
)
