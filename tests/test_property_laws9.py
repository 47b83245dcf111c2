"""Property-based law tests, batch 9: corpus-hygiene passes and the
reference-convention scalars.

pii_stats, cleanup_text, and contamination_check are the passes that
gate what enters a training corpus — their claims are pure regex/set
algebra, replayed here in Python (same patterns, same replacement
order, same 60-bit shingle sets) over composed adversarial texts.
The scalar helpers (tier ladder, dotted masking, surrogate keys, the
ε-guarded rate) are the reference's hash-visible conventions — pinned
against direct Python ports of the cited reference formulas.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

PII_PIECES = [
    "bob@x.io",
    "a.b+tag@mail.co.uk",
    "123-45-6789",
    "555-123-4567",
    "555.123.4567",
    "plain",
    "a@b",          # not an email (no dot-TLD)
    "12-345-6789",  # not an SSN (wrong group widths)
    "9555-123-4567",  # \b boundary probe
]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(PII_PIECES), min_size=0, max_size=5),
        min_size=1,
        max_size=5,
    )
)
@SETTINGS
def test_pii_stats_equals_regex_twin(spark, docs):
    """pii_stats == Python re over the same patterns: per-category
    match counts and the redacted text with the email→ssn→phone
    replacement order — including the traps (no-TLD non-emails,
    wrong-width non-SSNs, digit-prefixed \\b boundary probes)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import pii_stats

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ssns"], r["n_pii"], r["redacted_text"])
        for r in pii_stats(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        e = len(re.findall(PII_EMAIL_RE, t))
        p = len(re.findall(PII_PHONE_RE, t))
        s = len(re.findall(PII_SSN_RE, t))
        red = re.sub(
            PII_PHONE_RE,
            "<PHONE>",
            re.sub(PII_SSN_RE, "<SSN>", re.sub(PII_EMAIL_RE, "<EMAIL>", t)),
        )
        assert got[i] == (e, p, s, e + p + s, red), (i, t, got[i])


CLEAN_PIECES = ["https://x.co/a?b=1", "http://y.io", "word", "W0rd.", "​", "  "]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(CLEAN_PIECES), min_size=0, max_size=6),
        min_size=1,
        max_size=5,
    )
)
@SETTINGS
def test_cleanup_text_equals_regex_twin(spark, docs):
    """cleanup_text == the Python pipeline URL→space, zero-width
    strip, whitespace collapse, trim — with exact n_urls counts and
    the changed flag — on texts mixing URLs, zero-width junk, and
    whitespace runs."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import URL_RE, ZWSP_RE, cleanup_text

    texts = ["".join(ws) for ws in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_urls"], r["clean_text"], r["changed"])
        for r in cleanup_text(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        n = len(re.findall(URL_RE, t))
        cleaned = re.sub(r"\s+", " ", re.sub(ZWSP_RE, "", re.sub(URL_RE, " ", t))).strip()
        assert got[i] == (n, cleaned, cleaned != t), (i, t, got[i])


# --- contamination gate == distinct-shingle set twin -------------------------


def _shingle_hashes(t: str, n: int = 3) -> set[int]:
    normed = re.sub(r"\s+", " ", t).strip().lower()
    toks = normed.split(" ")
    if len(toks) >= n:
        sh = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        sh = [" ".join(toks)]
    return {int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh}


@given(
    corpus=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=6), min_size=1, max_size=5
    ),
    bench=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=6), min_size=1, max_size=3
    ),
)
@SETTINGS
def test_contamination_check_equals_set_twin(spark, corpus, bench):
    """contamination_check == Python set intersection over each doc's
    DISTINCT 3-shingle hashes vs the benchmark's union — counts, the
    det_round(·,6) rate, and the >= 0.5 gate — with the tiny alphabet
    forcing full, partial, and zero contamination plus short-doc
    whole-text fallback shingles."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import contamination_check

    ctexts = [" ".join(ws) for ws in corpus]
    btexts = [" ".join(ws) for ws in bench]
    cdf = spark.createDataFrame(list(enumerate(ctexts)), "doc_id LONG, text STRING")
    bdf = spark.createDataFrame(list(enumerate(btexts)), "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contamination_rate"], r["is_contaminated"])
        for r in contamination_check(cdf, bdf, "doc_id", "text").collect()
    }
    bset = set().union(*(_shingle_hashes(t) for t in btexts))
    for i, t in enumerate(ctexts):
        mine = _shingle_hashes(t)
        cont = len(mine & bset)
        rate = math.floor(cont / max(len(mine), 1) * 1e6 + 0.5) / 1e6
        assert got[i] == (len(mine), cont, rate, rate >= 0.5), (i, t, got[i])


# --- reference-convention scalars == cited-formula ports ---------------------


@given(
    rows=st.lists(
        st.tuples(
            st.floats(0, 10_000, allow_nan=False),          # amount
            st.integers(0, 300),                            # num
            st.integers(0, 300),                            # den
            st.one_of(st.none(), st.integers(0, 99)),       # nullable key part
        ),
        min_size=1,
        max_size=10,
    )
)
@SETTINGS
def test_reference_scalars_equal_formula_twins(spark, rows):
    """amount_tier's 50/200/1000/5000 ladder, mask_dotted's keep-2
    octet masking, surrogate_key's md5 over '-'-joined coalesced
    casts (NULL → ''), and rate's round(x/(y+0.001), 4) convention
    all equal direct Python ports of the cited reference formulas —
    including boundary amounts and NULL key parts."""
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import (
        amount_tier,
        mask_dotted,
        rate,
        surrogate_key,
    )

    data = [(i, a, "10.20.30.40", n, d, kp) for i, (a, n, d, kp) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "row_id LONG, amount DOUBLE, ip STRING, num INT, den INT, kp INT"
    )
    got = {
        r["row_id"]: (r["tier"], r["masked"], r["sk"], r["rt"])
        for r in df.select(
            "row_id",
            amount_tier("amount").alias("tier"),
            mask_dotted("ip").alias("masked"),
            surrogate_key("row_id", "kp").alias("sk"),
            rate(F.col("num"), F.col("den")).alias("rt"),
        ).collect()
    }
    for i, (a, n, d, kp) in enumerate(rows):
        tier = (
            "micro" if a < 50 else "low" if a < 200 else "medium" if a < 1000 else
            "high" if a < 5000 else "premium"
        )
        sk = hashlib.md5(f"{i}-{kp if kp is not None else ''}".encode()).hexdigest()
        rt = math.floor(n / (d + 0.001) * 1e4 + 0.5) / 1e4
        assert got[i] == (tier, "10.20.*.*", sk, rt), (i, got[i])


@given(
    st.lists(st.sampled_from(list("abcdefgh")), min_size=0, max_size=80),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=9),
)
@SETTINGS
def test_misra_gries_merge_laws(stream, k, batch_size):
    """The MG fold behind q_misra_gries / running_heavy_hitters, over
    arbitrary streams, capacities, and batch splits: (1) ≤ k counters
    survive; (2) one-sided — estimate ≤ exact for EVERY item, tracked
    or dropped; (3) total under-count ≤ N/(k+1) (mergeable-summaries
    bound over a left-deep merge tree); (4) canonical emission order
    (count desc, item asc); (5) batch-split invariance is NOT claimed
    (MG summaries are split-dependent) — but the bound must hold for
    every split, which is what varying batch_size exercises."""
    from collections import Counter

    from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.stateful import _mg_merge

    items, counts = [], []
    exact = Counter()
    for i in range(0, len(stream), batch_size):
        batch = Counter(stream[i : i + batch_size])
        exact += batch
        items, counts = _mg_merge(items, counts, dict(batch), k)
    assert len(items) <= k
    pairs = list(zip(items, counts))
    assert pairs == sorted(pairs, key=lambda kv: (-kv[1], kv[0]))
    summary = dict(pairs)
    n = len(stream)
    for it, c in exact.items():
        est = summary.get(it, 0)
        assert 0 <= est <= c, (it, est, c)
        assert c - est <= n / (k + 1), (it, est, c, n, k)


@given(st.integers(min_value=10, max_value=10**12))
@SETTINGS
def test_decimal_log_histogram_bucket_laws(v):
    """The (digit-count, two-leading-digit) bucketing shared by
    q_quantile_sketch / q_quantile_by_key / running_value_histogram:
    containment (lo ≤ v < hi), bounded relative width (the < 1/11
    error source: hi/lo = (lead2+1)/lead2 ≤ 11/10), monotonicity in
    v, and two significant digits exactly."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.stateful import _qh_lo

    lo = _qh_lo(v)
    s = str(v)
    lead2 = int(s[:2])
    hi = (lead2 + 1) * 10 ** (len(s) - 2)
    assert lo <= v < hi
    assert (v - lo) / v < 1 / 11
    assert _qh_lo(v + 1) >= lo
    assert str(lo).rstrip("0") == str(lead2).rstrip("0")
