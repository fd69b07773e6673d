"""Deterministic sf1-scale bench fixture, derived from the sf0.1 driver
fixture (VERDICT r06 item 3).

The ×16 in-memory amplification scales COMPUTE but replicates the same
key spaces (replica independence comes from a salt column, so e.g. the
shingle space is 16 disjoint copies of the same 1× space). What it
cannot test is distinct-key GROWTH — shingle/segment/orderkey/partkey
cardinality rising with input, which is what sizes hash tables, shuffle
partitions, and dedup state at 100 TB. This module materializes a
10×-sf0.1 ("sf1") fixture whose key spaces genuinely grow:

- relational tables: every key column is remapped ``key*REP + r`` per
  replica ``r`` — 10× distinct orders/parts/suppliers with referential
  integrity preserved (lineitem, orders, supplier, part remap in
  lockstep; nation/region are scale-invariant dimensions and copy
  through).
- documents: ``doc_id`` remaps the same way and the TEXT of replica
  ``r`` is rotated through a bijective letter substitution
  (``translate`` over the 10 highest-frequency English letters). A
  bijection on characters is a bijection on tokens and on k-gram
  shingles, so within-replica pairwise Jaccard/minhash structure —
  including the fixture's planted near-dups — is preserved EXACTLY,
  while replicas share (almost) no shingles with each other: the
  corpus-wide shingle/segment space grows ~10× with no salt column.

Generation is pure column arithmetic on the driver fixture (no RNG, no
timestamps), so the output is bit-stable across runs; a ``_BENCH_OK``
sentinel makes the cache idempotent. ~15 MB in, ~150 MB out, seconds to
build — per-round bench runs reuse the cache.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REP = 10

# the 10 most frequent English letters; replica r maps letter i to
# letter (i + r) mod 10 — r=0 is the identity, so replica 0 IS sf0.1
_ROT_SRC = "etaonisrhl"

_KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}


# Output files per table. The sf0.1 inputs are single small files, so
# an explode-and-write would produce ONE output file with ONE giant row
# group — and parquet scans parallelize by row group, so every sf1
# read would be effectively single-threaded no matter how many splits
# the scheduler cuts (observed: 18 of 19 q1 scan tasks empty, 14s
# single-task decode). Repartitioning before write yields _N_FILES row
# groups → full scan parallelism, the layout a real 100 TB table has.
_N_FILES = 32


def _replicate(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """rep× the rows, remapping every key column into a replica-disjoint
    range. Explode of a 10-element literal array — map-only until the
    final round-robin repartition that sets the output file count."""
    out = df.select(
        F.explode(F.array(*[F.lit(r) for r in range(REP)])).alias("_r"), "*"
    )
    for c in key_cols:
        out = out.withColumn(c, F.col(c) * REP + F.col("_r"))
    return out.repartition(_N_FILES)


def _case_over_replicas(r_col, branch_fn):
    """CASE over the REP literal branches of ``branch_fn(r)``: the
    per-replica transforms (translate mappings, slice offsets) must be
    foldable, and a 10-arm CASE on a tiny int stays codegen-friendly."""
    expr = None
    for r in range(REP):
        branch = branch_fn(r)
        expr = (
            F.when(r_col == r, branch)
            if expr is None
            else expr.when(r_col == r, branch)
        )
    return expr


def _rotated_text(r_col, text_col):
    """Apply the replica-indexed letter rotation."""
    return _case_over_replicas(
        r_col,
        lambda r: F.translate(text_col, _ROT_SRC, _ROT_SRC[r:] + _ROT_SRC[:r]),
    )


# bump to invalidate stale fixture caches when the generation rules
# change (v2: replica 0 keeps the ORIGINAL source value — r11, VERDICT
# r10 item 2: suffixing ALL replicas emptied roc_auc_eval's positive
# class, whose label is source == target; with replica 0 the identity,
# both classes survive at sf1 while source cardinality still grows
# ~10x for the source-keyed entries). One version covers EVERY
# sentinel in this module — a bump rebuilds all fixtures, which is
# cheap, idempotent, and avoids the unversioned-sentinel trap that
# kept a stale documents cache alive until v2.
_FIXTURE_VERSION = "v2"


def _fresh(sentinel: str) -> bool:
    try:
        with open(sentinel) as f:
            return f.read().strip() == _FIXTURE_VERSION
    except OSError:
        return False


def _stamp(sentinel: str) -> None:
    with open(sentinel, "w") as f:
        f.write(_FIXTURE_VERSION + "\n")


def ensure_sf1(spark: SparkSession, sf01_dir: str, out_dir: str) -> None:
    """Materialize the sf1 fixture under out_dir if not already cached."""
    sentinel = os.path.join(out_dir, "_BENCH_OK")
    if _fresh(sentinel):
        return
    os.makedirs(out_dir, exist_ok=True)

    for name, keys in _KEY_COLS.items():
        df = spark.read.parquet(f"{sf01_dir}/{name}.parquet")
        _replicate(df, keys).drop("_r").write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )

    for name in ("nation", "region"):
        spark.read.parquet(f"{sf01_dir}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")

    docs = spark.read.parquet(f"{sf01_dir}/documents.parquet")
    rep_docs = _replicate(docs, ["doc_id"])
    # replica 0 is the identity for source exactly as it is for text:
    # suffixing ALL replicas would rename every source value away from
    # the fixture's label targets (roc_auc_eval's positive class is
    # source == target — it emptied at sf1 until r11)
    rep_docs = rep_docs.select(
        "doc_id",
        F.when(F.col("_r") == 0, F.col("source"))
        .otherwise(
            F.concat_ws("#", "source", F.col("_r").cast("string"))
        )
        .alias("source"),
        *[c for c in docs.columns if c not in ("doc_id", "source", "text")],
        _rotated_text(F.col("_r"), F.col("text")).alias("text"),
    )
    rep_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    _stamp(sentinel)


def ensure_sf1_events(
    spark: SparkSession, sf01_dir: str, out_dir: str
) -> None:
    """Materialize sf1 events (r08, VERDICT r07 item 5: the new-tier
    sf1 battery needs the events table, which the r07 fixture omitted).
    ``event_id``/``user_id`` remap ``key*REP + r`` like the relational
    keys; ``ts`` copies through unchanged, so the time range is
    constant and event DENSITY grows 10x — which is how real traffic
    growth hits windowed aggregations and stream-stream join state.
    Guarded by its own sentinel so existing ``_BENCH_OK`` caches
    upgrade in place."""
    sentinel = os.path.join(out_dir, "_BENCH_OK_EVENTS")
    if _fresh(sentinel):
        return
    os.makedirs(out_dir, exist_ok=True)
    # pyarrow, not a Spark write: streaming entries locate the fixture
    # via pathGlobFilter on the literal FILE name "events.parquet"
    # (streaming/jobs._events_stream), so the sf1 copy must be one file
    # like the driver fixture — with explicit row groups so batch scans
    # still parallelize.
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = pq.read_table(f"{sf01_dir}/events.parquet")
    parts = []
    for r in range(REP):
        t = src
        for c in ("event_id", "user_id"):
            t = t.set_column(
                t.schema.get_field_index(c),
                c,
                pc.add(pc.multiply(t[c], pa.scalar(REP)), pa.scalar(r)),
            )
        parts.append(t)
    out = pa.concat_tables(parts)
    pq.write_table(
        out,
        f"{out_dir}/events.parquet",
        row_group_size=max(1, out.num_rows // _N_FILES),
    )
    _stamp(sentinel)


_EMB_DIM = 64


def ensure_sf1_embeddings(
    spark: SparkSession, sf01_dir: str, out_dir: str
) -> None:
    """Materialize sf1 embeddings (r11, VERDICT r10 item 2: the 34
    vector/ANN entries were the one registry tier with no sf1 timing
    row because the fixture lacked embeddings.parquet).

    ``vec_id`` and ``label`` both remap ``key*REP + r`` — 10x distinct
    vectors AND 10x label blocks of constant size, which is how a real
    corpus grows (more clusters, not fatter ones); it also keeps
    ``dedup_embedding_cosine``'s by-design per-block quadratic under
    its hard cap at sf1. The vector of replica ``r`` is cyclically
    shifted by ``r`` dimensions — the letter-rotation trick's vector
    twin: a coordinate permutation is orthogonal, so within-replica
    norms, cosines, and the planted near-dup pairs are preserved
    EXACTLY (replica 0 is the identity = sf0.1), while cross-replica
    cosines scramble to ~0 — the embedding space genuinely grows ~10x
    instead of becoming 10 stacked copies whose LSH buckets would pair
    quadratically. Pure column arithmetic, bit-stable; own sentinel so
    existing caches upgrade in place."""
    sentinel = os.path.join(out_dir, "_BENCH_OK_EMB")
    if _fresh(sentinel):
        return
    os.makedirs(out_dir, exist_ok=True)
    emb = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")

    def _shifted(r_col, vec_col):
        return _case_over_replicas(
            r_col,
            lambda r: vec_col
            if r == 0
            else F.concat(
                F.slice(vec_col, r + 1, _EMB_DIM - r), F.slice(vec_col, 1, r)
            ),
        )

    rep = _replicate(emb, ["vec_id", "label"]).select(
        "vec_id",
        _shifted(F.col("_r"), F.col("embedding")).alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    rep.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    _stamp(sentinel)


def ensure_layouts(spark: SparkSession, sf1_dir: str, out_dir: str) -> None:
    """Materialize the two lineitem storage layouts for the BENCH
    layout section (r08, VERDICT r07 item 6) if not already cached.

    ``arrival/`` rewrites sf1 lineitem exactly as read — the replica-
    interleaved key order ``_replicate`` produced, the layout a real
    multi-writer ingest leaves behind. ``sorted/`` is the remedy the
    r07 sf1 audit prescribed: one range shuffle on (l_shipdate,
    l_orderkey) + sortWithinPartitions, so each row group holds a
    narrow key range and dictionary/RLE encoding density survives the
    10x key growth. Both go through the SAME writer in the same
    session, so any size/scan-rate delta is purely row order. bench.py
    times identical probes over both and reports the recovery."""
    sentinel = os.path.join(out_dir, "_LAYOUT_OK")
    if _fresh(sentinel):
        return
    os.makedirs(out_dir, exist_ok=True)
    li = spark.read.parquet(f"{sf1_dir}/lineitem.parquet")
    li.write.mode("overwrite").parquet(os.path.join(out_dir, "arrival"))
    (
        li.repartitionByRange(_N_FILES, "l_shipdate", "l_orderkey")
        .sortWithinPartitions("l_shipdate", "l_orderkey")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "sorted"))
    )
    _stamp(sentinel)
