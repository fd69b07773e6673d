"""Pipeline DSL, file sources and sinks: the reference-parity API
surface (SURVEY §2.1/§2.2/§2.7), exercised on real temp files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_corpus(tmp_path) -> str:
    root = tmp_path / "books"
    (root / "sub").mkdir(parents=True)
    (root / "a.txt").write_text("the cat sat\nthe mat\n", encoding="utf-8")
    (root / "sub" / "b.txt").write_text("big data small data\n", encoding="utf-8")
    (root / "ignore.md").write_text("not a text file", encoding="utf-8")
    return str(root)


def test_files_list(spark, tmp_path):
    from tiny_etl_multiproc_bigdata_spark.sources.files import files_list

    df = files_list(spark, _write_corpus(tmp_path), ".txt")
    paths = sorted(r.file_path for r in df.collect())
    assert len(paths) == 2  # .md filtered during listing
    assert paths[0].endswith("a.txt") and paths[1].endswith("b.txt")


def test_read_whole_files_and_lines(spark, tmp_path):
    from tiny_etl_multiproc_bigdata_spark.sources.files import (
        read_file_lines,
        read_whole_files,
    )

    root = _write_corpus(tmp_path)
    whole = read_whole_files(spark, root, ".txt")
    contents = {os.path.basename(r.file_path): r.content for r in whole.collect()}
    assert contents["a.txt"] == "the cat sat\nthe mat\n"

    lines = read_file_lines(spark, root, ".txt")
    assert sorted(r.line for r in lines.collect()) == [
        "big data small data",
        "the cat sat",
        "the mat",
    ]


def test_pipeline_dsl_flagship_shape(spark, tmp_path):
    """The reference flagship (example/main.py:59-137) via the DSL:
    tokenize → per-file count + per-file distinct — single pass."""
    from tiny_etl_multiproc_bigdata_spark.operators.pipeline import (
        Pipeline,
        tokenize_words,
        unique_filter,
    )
    from tiny_etl_multiproc_bigdata_spark.sources.files import read_whole_files

    root = _write_corpus(tmp_path)
    collected = []
    pipe = Pipeline(
        extract=lambda s: read_whole_files(s, root, ".txt"),
        transformers=[
            tokenize_words("content", "word", keep=("file_path",),
                           mappers=(F.trim,)),
            unique_filter("file_path", "word", normalizers=(F.lower,)),
        ],
        loaders=[lambda df: collected.extend(df.collect())],
    )
    pipe.run(spark)
    by_file = {}
    for r in collected:
        by_file.setdefault(os.path.basename(r.file_path), set()).add(r.word)
    # 'the' deduped within a.txt; trailing-newline empty token kept
    # (re.split edge parity, SURVEY §7)
    assert by_file["a.txt"] == {"the", "cat", "sat", "mat", ""}
    assert by_file["b.txt"] == {"big", "data", "small", ""}


def test_unique_filter_duplicates_only(spark):
    from tiny_etl_multiproc_bigdata_spark.operators.pipeline import unique_filter

    df = spark.createDataFrame(
        [("f1", "a"), ("f1", "a"), ("f1", "b"), ("f2", "a")], ["bag", "val"]
    )
    dups = unique_filter("bag", "val", yield_unique=False)(df)
    rows = [(r.bag, r.val) for r in dups.collect()]
    assert rows == [("f1", "a")]  # one re-occurrence


def test_csv_sink_and_tee(spark, tmp_path):
    from tiny_etl_multiproc_bigdata_spark.sinks import (
        Projection,
        conditional_load,
        csv_load,
        noop_load,
        tee_load,
    )

    df = spark.createDataFrame(
        [(1, "x", None), (2, "y", "ok"), (3, None, "ok")],
        ["id", "name", "status"],
    )
    proj = Projection([("ID", "id", True), ("NAME", "name", True)])
    out_dir = str(tmp_path / "csv")
    csv_load(df, out_dir, projection=proj, n_shards=2)
    part_files = [f for f in os.listdir(out_dir) if f.endswith(".csv")]
    # L6 shard-parallel writers: empty round-robin partitions produce no
    # file, so with 2 surviving rows we get 1-2 part files
    assert 1 <= len(part_files) <= 2
    body = "".join(
        open(os.path.join(out_dir, f), encoding="utf-8").read() for f in part_files
    )
    assert "3" not in body.replace("NAME", "")  # required-null row dropped

    assert noop_load(df, proj) == 2

    fired = []
    assert conditional_load(df, False, lambda d: fired.append(1)) is False
    assert not fired
    assert conditional_load(df, lambda: True, lambda d: fired.append(1)) is True
    assert fired == [1]

    counts = []
    tee_load(df, [lambda d: counts.append(d.count()), lambda d: counts.append(d.count())])
    assert counts == [3, 3]


def test_multimodal_decode_stub_real_raises():
    from tiny_etl_multiproc_bigdata_spark.operators.multimodal import (
        decode_image_real,
    )
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_cc_labels_transitive_chain(spark):
    """A-B, B-C, C-D collapse to one component labeled by the min id,
    even though A and D share no edge; unrelated pair keeps its own."""
    from tiny_etl_multiproc_bigdata_spark.plans.dedup_groups import _cc_labels

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src bigint, dst bigint"
    )
    got = {r.doc_id: r.group_id for r in _cc_labels(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_prefix_filter_is_complete(spark, sf_dir, duck):
    """The PPJoin prefix filter must be exactness-preserving: its
    output equals the UNFILTERED all-pairs Jaccard join at the same
    threshold (the filter may only prune non-candidates)."""
    from tiny_etl_multiproc_bigdata_spark.plans.registry import queries

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in queries()["dedup_jaccard_prefix_filter"](
            spark, sf_dir
        ).collect()
    }
    want = {
        (a, b): j
        for a, b, j in duck.execute(
            r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS l
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(1, len(l) - 1),
                       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS tok
              FROM toks WHERE len(l) >= 3
            ), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT da, db,
                   (floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000 + 0.5)
                    / 10000) AS j
            FROM inter
            JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.6
            """
        ).fetchall()
    }
    assert got == want


def test_embedding_cosine_guard_raises_on_oversized_block(spark, sf_dir, monkeypatch):
    """The dedup_embedding_cosine block-size cap must actually refuse
    oversized label blocks (VERDICT r04 item 5 asked for a mechanical
    guard, not a docstring) — exercised by shrinking the cap below the
    fixture's largest label block."""
    import pytest

    from tiny_etl_multiproc_bigdata_spark.plans import dedup_queries

    monkeypatch.setattr(dedup_queries, "_COSINE_BLOCK_CAP", 1)
    with pytest.raises(ValueError, match="dedup_embedding_lsh"):
        dedup_queries.dedup_embedding_cosine(spark, sf_dir)


def test_listagg_guard_raises_on_oversized_group(spark, sf_dir, monkeypatch):
    """agg_listagg_ordered's payload cap must refuse a group whose
    concatenated string would land on one executor (VERDICT r05 item
    7) — exercised by shrinking the cap below the fixture's largest
    group payload, mirroring the embedding-cosine guard test."""
    import pytest

    from tiny_etl_multiproc_bigdata_spark.plans import advanced

    monkeypatch.setattr(advanced, "_LISTAGG_PAYLOAD_CAP", 1)
    with pytest.raises(ValueError, match="collect_set"):
        advanced.agg_listagg_ordered(spark, sf_dir)


def test_cogroup_asof_includes_exact_timestamp_ties(spark):
    """merge_asof's backward direction includes a click at EXACTLY the
    purchase's timestamp (click_us <= t_us); the oracle's RANGE-frame
    window has the same peer semantics. Pin the engine side on
    constructed ties — the fixtures contain no duplicate (user, t_us)
    pairs, so the sweep alone can't exercise this (r6 review finding)."""
    from tiny_etl_multiproc_bigdata_spark.operators.grouped_pandas import (
        cogroup_asof_from,
    )

    purchases = spark.createDataFrame(
        [
            (1, 10, 100_000_000),  # tied with a click at the same t_us
            (1, 11, 50_000_000),  # no click at or before
            (2, 20, 200_000_000),  # strictly-later than its click
        ],
        "user_id long, event_id long, t_us long",
    )
    clicks = spark.createDataFrame(
        [(1, 100_000_000), (2, 150_000_000), (3, 1_000_000)],
        "user_id long, t_us long",
    )
    rows = {
        r["event_id"]: (r["last_click_epoch"], r["secs_since_click"])
        for r in cogroup_asof_from(purchases, clicks).collect()
    }
    assert rows == {
        10: (100, 0),  # exact tie matched, zero seconds since
        20: (150, 50),
    }


def test_ps_merge_asof_backward_constructed_semantics(spark):
    """The r10 scale-safe merge_asof lowering must keep pandas'
    backward contract on constructed edges the fixture can't exercise:
    a right row at EXACTLY the left timestamp matches (at-or-before is
    inclusive), an earlier right row is superseded by a later one, and
    a left row with no right row at-or-before keeps NULL."""
    from tiny_etl_multiproc_bigdata_spark.plans.sql_surface import (
        _ps_merge_asof_backward,
    )

    left = spark.createDataFrame(
        [
            (1, 10, 100),  # signup at exactly 100 → inclusive match
            (1, 11, 50),   # before any signup → NULL
            (1, 12, 300),  # two signups before → the LATER one (200)
            (2, 20, 500),  # other user's signups must not leak
        ],
        "user_id long, purchase_id long, ts long",
    ).pandas_api()
    right = spark.createDataFrame(
        [(1, 900, 100), (1, 901, 200), (3, 902, 1)],
        "user_id long, signup_id long, ts long",
    ).pandas_api()
    out = _ps_merge_asof_backward(
        left, right, on="ts", by="user_id", right_value="signup_id"
    )
    got = {
        r["purchase_id"]: r["signup_id"]
        for r in out.to_spark().collect()
    }
    assert got == {10: 900, 11: None, 12: 901, 20: None}
