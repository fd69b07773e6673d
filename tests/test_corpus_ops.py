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
        # bins are contiguous from 0 (start-offset binning can't skip a
        # bin: offsets are a running sum)
        assert [b["bin_id"] for b in bins] == list(range(len(bins)))
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
