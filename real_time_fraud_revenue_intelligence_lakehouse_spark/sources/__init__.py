from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table, TABLES  # noqa: F401
