"""Delta table maintenance — OPTIMIZE / VACUUM / history / time travel.

Re-expresses the reference's maintenance surface
(`spark_jobs/utils/delta_utils.py:78-116`): S9 time-travel read, S13
OPTIMIZE (plus the Z-ORDER variant the reference documents but never
shipped — SURVEY §2.11), S14 VACUUM with retention, S15 history.

delta-spark is not installed in the verification container, so every
entry point degrades with a single, explicit ``DeltaUnavailableError``
rather than an import crash — the API is cluster-ready and the error
is testable. Nothing here is oracle-checkable (table maintenance has
no relational result); tests assert the gating behavior and the
generated SQL strings.

100 TB notes: OPTIMIZE targets the small-file problem the reference
quantifies (~2,400 files/day-partition at 10M events/day,
`README.md:398-406`); Z-ORDER on the high-selectivity filter columns
(user_id) converts data skipping from partition-level to file-level;
VACUUM retention must exceed the longest downstream time-travel
reader (168 h default, `delta_utils.py:101-109`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class DeltaUnavailableError(ImportError):
    """Raised when a Delta-only operation runs without delta-spark."""


def _require_delta(spark: SparkSession) -> None:
    try:
        import delta  # noqa: F401
    except ImportError as e:
        raise DeltaUnavailableError(
            "delta-spark is not installed in this environment; Delta "
            "maintenance ops are cluster-only (see module docstring)"
        ) from e


def optimize_sql(path: str, zorder_by: list[str] | None = None) -> str:
    """The OPTIMIZE statement (`delta_utils.py:95-98`), extended with
    the documented-but-unshipped Z-ORDER clause (SURVEY §2.11)."""
    stmt = f"OPTIMIZE delta.`{path}`"
    if zorder_by:
        stmt += " ZORDER BY (" + ", ".join(zorder_by) + ")"
    return stmt


def vacuum_sql(path: str, retain_hours: int = 168) -> str:
    """`VACUUM … RETAIN n HOURS` (`delta_utils.py:101-109`)."""
    return f"VACUUM delta.`{path}` RETAIN {retain_hours} HOURS"


def optimize_table(
    spark: SparkSession, path: str, zorder_by: list[str] | None = None
) -> DataFrame:
    _require_delta(spark)
    return spark.sql(optimize_sql(path, zorder_by))  # pragma: no cover


def vacuum_table(spark: SparkSession, path: str, retain_hours: int = 168) -> DataFrame:
    _require_delta(spark)
    return spark.sql(vacuum_sql(path, retain_hours))  # pragma: no cover


def table_history(spark: SparkSession, path: str, limit: int | None = None) -> DataFrame:
    """`DeltaTable.forPath(...).history()` (`delta_utils.py:112-116`)."""
    _require_delta(spark)
    from delta.tables import DeltaTable  # pragma: no cover

    h = DeltaTable.forPath(spark, path).history()  # pragma: no cover
    return h.limit(limit) if limit else h  # pragma: no cover
