"""Property-based golden test (SURVEY §7 risk register): Spark's
`split(col, '\\s+', -1)` must agree with Python's `re.split(r'\\s+', s)`
on arbitrary text — including the edge-empty-token behavior the
conservation invariant depends on. One Spark job evaluates the whole
generated batch (hypothesis drives generation only, so the property
run stays fast)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# whitespace-heavy alphabet incl. Arabic letters and diacritics so the
# tokenizer sees the reference's real input classes
_ALPHA = st.sampled_from(
    list("ab z\t\n\r  αβ12.,!؟") + ["كتب", "يَكْتُبُ", "ً", "   ", ""]
)
_TEXTS = st.lists(_ALPHA, min_size=0, max_size=30).map("".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_TEXTS, min_size=40, max_size=40))
def test_spark_split_matches_re_split(spark, texts):
    expected = [re.split(r"\s+", t) for t in texts]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r.i: list(r.toks)
        for r in df.select(
            "i", F.split("t", r"\s+", -1).alias("toks")
        ).collect()
    }
    for i, exp in enumerate(expected):
        assert got[i] == exp, (
            f"tokenizer parity broken for {texts[i]!r}: "
            f"spark={got[i]!r} python={exp!r}"
        )


def test_conservation_under_edge_tokens(spark):
    """The conservation invariant's exact edge case: leading/trailing
    whitespace produces empty tokens that ARE counted (reference
    text.py:35-37 — ''.isspace() is False so the filter passes them)."""
    texts = ["  leading", "trailing  ", "  both  ", "", "   ", "a b"]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    spark_counts = [
        r.n
        for r in df.select(F.size(F.split("t", r"\s+", -1)).alias("n")).collect()
    ]
    py_counts = [len(re.split(r"\s+", t)) for t in texts]
    assert spark_counts == py_counts
