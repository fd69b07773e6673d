"""Semantic invariants for the corpus-construction operators
(plans/corpus_ops.py) — the oracle gate (test_correctness.py) pins
cross-engine equality; these pin the properties the oracle equality
alone wouldn't catch if both engines drifted together."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.text import (
    tokenize_words_nonempty,
)
from tiny_etl_multiproc_bigdata_spark.plans.corpus_ops import (
    _BIN_TARGET,
    _CHUNK_S,
    _CHUNK_W,
    _SEG,
    bm25_doc_scores,
    chunk_sliding_tokens,
    compaction_binpack,
    dedup_corpus_segments,
)


def _doc_token_counts(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(tokenize_words_nonempty("text")).alias("n")
        ).collect()
    }


def test_segment_dedup_conservation(spark, sf_dir):
    ntok = _doc_token_counts(spark, sf_dir)
    rows = dedup_corpus_segments(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == {
        d for d, n in ntok.items() if n >= 1
    }
    for r in rows:
        n = ntok[r["doc_id"]]
        assert r["n_segments"] == math.ceil(n / _SEG)
        assert 0 <= r["n_dup_segments"] <= r["n_segments"]
        # kept_tokens + dropped tokens == total tokens; dropped segments
        # account for at most _SEG tokens each
        assert r["kept_tokens"] <= n
        assert n - r["kept_tokens"] <= r["n_dup_segments"] * _SEG


def test_chunking_covers_every_token_exactly(spark, sf_dir):
    ntok = _doc_token_counts(spark, sf_dir)
    rows = chunk_sliding_tokens(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        n = ntok[doc_id]
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(
            range(math.ceil(n / _CHUNK_S))
        )
        for c in chunks:
            start = c["chunk_idx"] * _CHUNK_S  # 0-based
            assert c["n_chunk_tokens"] == min(_CHUNK_W, n - start)
        # stride < width => consecutive chunks overlap; every token is
        # inside at least one chunk (last chunk reaches the end)
        last = chunks[-1]
        assert last["chunk_idx"] * _CHUNK_S + last["n_chunk_tokens"] == n


def test_compaction_bins_are_bounded_first_fit(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    max_file = d.agg(F.max("n_chars")).collect()[0][0]
    rows = compaction_binpack(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, bins in by_src.items():
        bins.sort(key=lambda r: r["bin_id"])
        # bin ids start at 0 and are unique-ascending; a single file
        # LARGER than the target legitimately skips the bins it spans
        # (no file starts inside them), so contiguity is NOT asserted
        ids = [b["bin_id"] for b in bins]
        assert ids[0] == 0 and ids == sorted(set(ids))
        for b in bins:
            # a bin holds files whose START offset is inside it, so its
            # bytes are < target + one max-sized straddling file
            assert b["bytes"] < _BIN_TARGET + max_file
            assert b["n_files"] >= 1


def test_winnowing_guarantees_on_constructed_docs(spark):
    from tiny_etl_multiproc_bigdata_spark.plans.corpus_ops import (
        _WIN_K,
        _WIN_W,
        winnow_fingerprints,
    )

    t = _WIN_W + _WIN_K - 1  # guarantee threshold: shared substring len
    shared = "zqxjkvwpb"  # t=8 chars needed; 9 to be safe, rare letters
    assert len(shared) >= t
    doc_a = "the quick brown fox " + shared + " jumps over it"
    doc_b = "completely different prefix text " + shared + " and suffix"
    doc_c = "no overlap with either of the other documents at all"
    base = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, low string"
    )
    sels = winnow_fingerprints(base, rollup=False).collect()
    by_doc = {}
    for r in sels:
        by_doc.setdefault(r["doc_id"], set()).add(r["kgram_hash"])
    # SWA03 Theorem: docs sharing a substring of >= w+k-1 chars share a
    # selected fingerprint
    assert by_doc[1] & by_doc[2]
    # density guarantee: at least one selection per w+k-1 char span
    for doc, text in ((1, doc_a), (2, doc_b), (3, doc_c)):
        assert len(by_doc[doc]) >= (len(text) - _WIN_K + 1) // (
            _WIN_W + _WIN_K - 1
        )
    # rollup is deterministic and distinct for distinct content
    fp = {r["doc_id"]: r["fingerprint"] for r in winnow_fingerprints(base).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in winnow_fingerprints(base).collect()}
    assert fp == fp2 and len(set(fp.values())) == 3


def test_bm25_scores_positive_and_bounded(spark, sf_dir):
    rows = bm25_doc_scores(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # Lucene idf variant is strictly positive, so scores are too
    assert all(s > 0 for s in scores)


def _winnow_reference(text: str, k: int, w: int):
    """Literal SWA03 winnowing in pure Python: hash every k-gram,
    slide a w-window, keep the min hash (rightmost on ties), dedup
    selected (pos, hash)."""
    import hashlib

    low = text
    m = len(low) - k + 1
    if m < w:
        return set()
    hs = [
        hashlib.md5(low[i : i + k].encode()).hexdigest() for i in range(m)
    ]
    sel = set()
    for j in range(m - w + 1):
        window = hs[j : j + w]
        mn = min(window)
        # rightmost occurrence of the min
        off = max(i for i, h in enumerate(window) if h == mn)
        sel.add((j + off + 1, mn))  # 1-based pos, matching the engine
    return sel


def test_winnowing_short_docs_select_nothing(spark):
    """Docs shorter than w+k-1 chars can't hold one full window: the
    helper must return no selections for them (matching the Python
    reference) instead of crashing on a descending sequence() bound
    (r6 review finding)."""
    from tiny_etl_multiproc_bigdata_spark.plans.corpus_ops import (
        winnow_fingerprints,
    )

    base = spark.createDataFrame(
        [(1, ""), (2, "abc"), (3, "abcdefg"), (4, "long enough text here")],
        "doc_id long, low string",
    )
    rows = winnow_fingerprints(base, rollup=False).collect()
    assert {r["doc_id"] for r in rows} == {4}
    assert winnow_fingerprints(base).count() == 1


def test_winnowing_matches_python_reference(spark):
    """Engine selections == the literal algorithm, including the
    rightmost-min tie rule — exercised on adversarial inputs where ties
    actually occur (constant and periodic strings repeat k-grams, so
    equal hashes land in one window)."""
    import random

    from tiny_etl_multiproc_bigdata_spark.plans.corpus_ops import (
        _WIN_K,
        _WIN_W,
        winnow_fingerprints,
    )

    rng = random.Random(20260814)
    docs = [
        "a" * 40,  # all k-grams identical: every window is a 4-way tie
        "ab" * 25,  # period-2: alternating equal hashes
        "abcde" * 10,  # period-k: every k-gram repeats every k chars
        "xyzzy plugh " * 6,
        "short8ch",  # exactly the minimum admissible length
    ] + [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(8, 120)))
        for _ in range(40)
    ]
    base = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, low string"
    )
    got: dict[int, set] = {i: set() for i in range(len(docs))}
    for r in winnow_fingerprints(base, rollup=False).collect():
        got[r["doc_id"]].add((r["pos"], r["kgram_hash"]))
    for i, text in enumerate(docs):
        assert got[i] == _winnow_reference(text, _WIN_K, _WIN_W), (
            i,
            text[:40],
        )


def test_semantic_dedup_cluster_cap_raises(spark, sf_dir, monkeypatch):
    """The SemDeDup pair stage must refuse a degenerate clustering
    instead of building |cluster|² pairs (same contract as
    dedup_embedding_cosine's block cap)."""
    import pytest

    from tiny_etl_multiproc_bigdata_spark.plans import ivf_kmeans

    monkeypatch.setattr(ivf_kmeans, "_SEM_CLUSTER_CAP", 1)
    with pytest.raises(ValueError, match="largest cluster"):
        ivf_kmeans.dedup_semantic_kmeans(spark, sf_dir)


def test_repetition_strip_constructed_docs(spark):
    """Constructed-document invariants for text_repetition_strip: a
    repeated trigram's second occurrence is removed span-wise; fully
    unique docs pass through untouched; the kept-stream hash matches
    the hand-computed survivor list."""
    from tiny_etl_multiproc_bigdata_spark.plans.quality import (
        text_repetition_strip,
    )
    import hashlib
    import tempfile

    rows = [
        # duplicate trigram "a b c" at positions 1 and 6 → tokens 6,7,8
        # removed; kept = a b c d e (positions 1-5)
        (1, "a b c d e a b c"),
        # all-unique trigrams → nothing removed
        (2, "p q r s t u"),
        # under 3 tokens → no grams, nothing removed
        (3, "x y"),
        # overlapping self-pair "x x x x": grams [xxx, xxx]; gram 2 dup →
        # tokens 2,3,4 removed; kept = [x]
        (4, "x x x x"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {
            r["doc_id"]: r
            for r in text_repetition_strip(spark, tmp).collect()
        }
    def h(tokens):
        return hashlib.md5(" ".join(tokens).encode()).hexdigest()

    assert got[1]["n_removed"] == 3
    assert got[1]["kept_hash"] == h(["a", "b", "c", "d", "e"])
    assert got[2]["n_removed"] == 0
    assert got[2]["kept_hash"] == h(["p", "q", "r", "s", "t", "u"])
    assert got[3]["n_removed"] == 0
    assert got[4]["n_removed"] == 3
    assert got[4]["kept_hash"] == h(["x"])
