"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = _entry_mod().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "gmv" in df.columns


def test_every_oracle_has_query():
    mod = _entry_mod()
    qs, oracles = mod.queries(), mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_queries_run_on_smoke_sf(spark, sf_dir):
    qs = _entry_mod().queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
