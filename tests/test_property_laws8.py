"""Property-based law tests, batch 8: the text-analysis metrics.

The text tier's claims are that every metric is a deterministic,
engine-portable function of the characters — regex counts, set
algebra over whitespace tokens, fixed-weight composites, smoothed
TF-IDF with round-before-rank. These tests replay the definitions in
plain Python over ASCII-adversarial texts (punctuation storms,
repeated tokens, whitespace-only, stopword ties across languages)
and require exact equality. ASCII alphabets on purpose: Java and
CPython agree on \\w/\\s for ASCII (re.ASCII mirrors Java's default
non-Unicode classes), which is the regime the engine's oracle parity
already operates in.
"""

from __future__ import annotations

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

ASCII_TEXT = st.text(alphabet="abTZ09 .,!?;_", max_size=24)


def _toks(t: str) -> list[str]:
    return re.split(r"\s+", t.strip())


# --- scalar metrics == regex/set twins --------------------------------------


@given(texts=st.lists(ASCII_TEXT, min_size=1, max_size=6))
@SETTINGS
def test_text_metrics_equal_python_twins(spark, texts):
    """token_count_ws / token_count_bpe / punct_ratio /
    unique_token_ratio / quality_score all equal their definitional
    Python twins exactly — whitespace-token splits (empty text = one
    empty token), the \\w+|[^\\w\\s] BPE pre-tokenizer count, char-
    length-normalized punctuation, distinct-token ratio, and the
    0.4/0.3/0.3 composite in the same left-to-right float order."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext import text as X

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["nws"], r["nbpe"], r["pr"], r["ur"], r["q"])
        for r in df.select(
            "doc_id",
            X.token_count_ws(df["text"]).alias("nws"),
            X.token_count_bpe(df["text"]).alias("nbpe"),
            X.punct_ratio(df["text"]).alias("pr"),
            X.unique_token_ratio(df["text"]).alias("ur"),
            X.quality_score(df["text"]).alias("q"),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = _toks(t)
        nws = len(toks)
        nbpe = len(re.findall(r"\w+|[^\w\s]", t, re.ASCII))
        pr = len(re.findall(r"[^\w\s]", t, re.ASCII)) / max(len(t), 1)
        ur = len(set(toks)) / max(len(toks), 1)
        q = 0.4 * min(nws / 64.0, 1.0) + 0.3 * (1.0 - min(4.0 * pr, 1.0)) + 0.3 * ur
        assert got[i] == (nws, nbpe, pr, ur, q), (i, t, got[i])


# --- lang_id == the stopword-vote twin ---------------------------------------

LANG_WORDS = ["the", "a", "of", "la", "le", "el", "und", "ist", "es", "xx"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(LANG_WORDS), min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    )
)
@SETTINGS
def test_lang_id_equals_vote_twin(spark, docs):
    """lang_id == argmax of distinct-stopword hits with insertion-
    order tie-break and 'und' when nothing scores — on token mixes
    built FROM the stopword lists, which force cross-language ties
    ('la' is French AND Spanish; 'es' is Spanish AND German-absent)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import LANG_STOPWORDS, lang_id

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", lang_id(df["text"]).alias("lang")).collect()
    }
    for i, t in enumerate(texts):
        toks = set(_toks(re.sub(r"\s+", " ", t).strip().lower()))
        scores = [(lang, len(toks & set(ws))) for lang, ws in LANG_STOPWORDS.items()]
        best = max(s for _, s in scores)
        want = "und"
        if best > 0:
            want = next(lang for lang, s in scores if s == best)
        assert got[i] == want, (i, t, got[i], want)


# --- tfidf_top_terms == smoothed-idf twin with round-before-rank ------------


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=6),
        min_size=1,
        max_size=5,
    ),
    top_n=st.integers(1, 3),
)
@SETTINGS
def test_tfidf_equals_python_twin(spark, docs, top_n):
    """tfidf_top_terms == the Python replay: per-doc term counts over
    whitespace tokens, idf = ln((N+1)/(df+1)), det_round(·, 6) BEFORE
    ranking, (tfidf DESC, term ASC) row_number, keep top_n — single-
    letter vocab forces shared terms, repeated terms, and rounded-
    score ties decided by the term tie-break."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import tfidf_top_terms

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["tfidf"], r["term_rank"])
        for r in tfidf_top_terms(df, "doc_id", "text", top_n=top_n).collect()
    )

    toks = {i: _toks(re.sub(r"\s+", " ", t).strip().lower()) for i, t in enumerate(texts)}
    n_docs = float(len(texts))
    df_counts: dict[str, int] = {}
    for ts in toks.values():
        for term in set(ts):
            df_counts[term] = df_counts.get(term, 0) + 1
    want = []
    for i, ts in toks.items():
        tf: dict[str, int] = {}
        for term in ts:
            tf[term] = tf.get(term, 0) + 1
        scored = [
            (
                term,
                c,
                math.floor(c * math.log((n_docs + 1.0) / (df_counts[term] + 1.0)) * 1e6 + 0.5) / 1e6,
            )
            for term, c in tf.items()
        ]
        scored.sort(key=lambda t: (-t[2], t[0]))
        want.extend(
            (i, term, c, s, rk) for rk, (term, c, s) in enumerate(scored[:top_n], start=1)
        )
    assert got == sorted(want)
