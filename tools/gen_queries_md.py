"""Generate QUERIES.md — the declared-query inventory, from the
registry itself (so the doc can't drift from the code).

Usage: python tools/gen_queries_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry  # noqa: E402


def main() -> None:
    specs = registry.specs()
    lines = [
        "# QUERIES — declared-query inventory",
        "",
        "Auto-generated from `plans/registry.py` by `tools/gen_queries_md.py`;",
        "do not edit by hand. Every row is a PySpark callable in",
        "`__spark_entry__.queries()`; ✔ rows also carry a DuckDB oracle twin",
        "in `oracle_sql()` and are value-hash-checked by the driver",
        "(rows-only queries are checked for execution + row count).",
        "",
        f"**{len(specs)} queries** "
        f"({sum(1 for s in specs.values() if s.oracle)} oracle-checked, "
        f"{sum(1 for s in specs.values() if not s.oracle)} rows-only).",
        "",
        "| query id | tags | oracle | summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        doc = " ".join((s.doc or "").split())
        first = doc.split(". ")[0].rstrip(".")[:140]
        tags = ", ".join(s.tags) or "—"
        lines.append(f"| `{name}` | {tags} | {'✔' if s.oracle else 'rows-only'} | {first}. |")
    (REPO / "QUERIES.md").write_text("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(specs)} queries")


if __name__ == "__main__":
    main()
