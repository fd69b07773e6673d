"""Equivalence pin for the r14 `_shingled_docs` Arrow rewrite
(dedup_queries.py, guide §4.2, VERDICT r13 item 3).

Keeps the r13 Generate-barrier JVM lowering VERBATIM and asserts the
Arrow stage produces byte-identical output — including the shingle
ARRAY ORDER (array_distinct's first-occurrence order) — at two SFs,
with and without the bench salt column, plus adversarial edge rows
(NULL text, sub-3-token docs, İ/U+0130, Java-\\s edge whitespace,
NBSP which Java \\s does NOT split on).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.plans.dedup_queries import (
    _shingled_docs,
    _tokens,
)


def _shingled_docs_r13(d):
    """The pre-r14 lowering, verbatim (dedup_queries.py @ bf54c07)."""
    from tiny_etl_multiproc_bigdata_spark.functions.text import word_ngrams

    carry = ["doc_id"] + (["salt"] if "salt" in d.columns else [])
    t = d.select(
        *carry, F.explode(F.array(_tokens(F.col("text")))).alias("toks")
    )
    s = t.select(
        *carry,
        F.explode(
            F.array(F.array_distinct(word_ngrams(F.col("toks"), 3)))
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    if "salt" in d.columns:
        s = s.withColumn(
            "shingles",
            F.transform(
                "shingles", lambda sh: F.concat_ws("|", sh, F.col("salt"))
            ),
        )
    return s.select("doc_id", "shingles")


def _as_map(df):
    rows = df.collect()
    out = {}
    for r in rows:
        assert r["doc_id"] not in out
        out[r["doc_id"]] = list(r["shingles"])
    return out


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_shingled_docs_bit_identical(spark, sf):
    d = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    assert _as_map(_shingled_docs(d)) == _as_map(_shingled_docs_r13(d))


def test_shingled_docs_with_salt(spark):
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .withColumn("salt", (F.col("doc_id") % 3).cast("string"))
    )
    assert _as_map(_shingled_docs(d)) == _as_map(_shingled_docs_r13(d))


def test_shingled_docs_edge_rows(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "one two"),
        (4, "  leading and trailing   space  "),
        (5, "a\tb\x0bc\rd\ne f"),
        (6, "İstanbul İ five six seven"),  # Spark lower -> i+U+0307
        (7, "nbsp is not a separator here ok"),  # Java \\s excl. NBSP
        (8, "dup dup dup dup dup"),  # one distinct shingle
        (9, "x " * 2000),  # long doc, all-duplicate shingles
        (10, "ça VA über ÉTÉ mixed CASE words"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    new, old = _as_map(_shingled_docs(d)), _as_map(_shingled_docs_r13(d))
    assert new == old
    assert 1 not in new and 2 not in new and 3 not in new
    assert new[8] == ["dup dup dup"]
    # NBSP must stay INSIDE a token (Java \\s is ASCII-only)
    assert any(" " in s for s in new[7])
