"""bench.py ↔ BASELINE.md contracts.

The host-drift sentinel gate (BASELINE.md "Host-drift governance")
divides measured timings by the sentinel pair's RECORDED rows; if
either row is ever re-recorded in BASELINE.md without updating
bench.SENTINEL_ROWS, the gate silently grades against stale baselines
(ADVICE r14). This test pins the two to each other so a drift is a
red test, not a silent mis-grade.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _baseline_row(query_id: str) -> float:
    """First float in the BASELINE.md per-query table row for
    ``query_id`` (rows may carry adjudication prose after the
    number, e.g. q_logreg_train_score)."""
    text = (REPO / "BASELINE.md").read_text()
    pat = re.compile(
        r"^\|\s*" + re.escape(query_id) + r"\s*\|\s*([0-9]+\.[0-9]+)", re.M
    )
    m = pat.search(text)
    assert m, f"no BASELINE.md table row found for {query_id}"
    return float(m.group(1))


def test_sentinel_rows_match_baseline_md():
    import bench

    assert set(bench.SENTINEL_ROWS) == {"q_clean_filter", "q_pricing_summary"}
    for qid, row in bench.SENTINEL_ROWS.items():
        assert _baseline_row(qid) == row, (
            f"bench.SENTINEL_ROWS[{qid!r}]={row} disagrees with the "
            f"recorded BASELINE.md row {_baseline_row(qid)} — update "
            "bench.py when a sentinel row is re-recorded"
        )


def test_sentinel_prose_matches_constants():
    """The governance prose in BASELINE.md spells the constants out
    inside the sentinel_ratio formula — keep that in sync too."""
    import bench

    text = (REPO / "BASELINE.md").read_text()
    for row in bench.SENTINEL_ROWS.values():
        assert f"/ {row}" in text or f"/{row}" in text
