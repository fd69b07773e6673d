"""Engine-independent twin for embedding_power_iteration: the same
integer recurrence simulated with exact Python big-ints must reproduce
the Spark result bit-for-bit. This pins the MATH (centering identity,
both contractions, the renormalization) independently of the DuckDB
oracle — a bug mirrored into the oracle SQL would pass the hash compare
but fail here. Big-ints, not float64: the second contraction reaches
~3e24 at fixture scale, far past 2^53."""

from __future__ import annotations

import math

import numpy as np

from conftest import SF_DIR


def test_power_iteration_matches_numpy_twin(spark):
    from tiny_etl_multiproc_bigdata_spark.plans.vector_queries import (
        _PCA_ITERS,
        _PCA_SCALE,
        embedding_power_iteration,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Q = np.floor(X * _PCA_SCALE + 0.5).astype(np.int64)
    n, dim = Q.shape
    S = Q.sum(axis=0)  # int64, exact
    Y = [[int(n) * int(Q[r, i]) - int(S[i]) for i in range(dim)] for r in range(n)]

    v = [_PCA_SCALE] * dim
    for _ in range(_PCA_ITERS):
        s = [sum(Y[r][i] * v[i] for i in range(dim)) for r in range(n)]
        w = [sum(Y[r][i] * s[r] for r in range(n)) for i in range(dim)]
        m = max(abs(x) for x in w)
        # the engines renormalize through correctly-rounded double
        # casts — float(int) reproduces that exactly
        v = [
            math.floor(float(w[i]) / float(m) * _PCA_SCALE + 0.5)
            for i in range(dim)
        ]

    got = {
        r["pos"]: r["component_micro"]
        for r in embedding_power_iteration(spark, SF_DIR).collect()
    }
    assert len(got) == dim
    for pos, comp in got.items():
        assert comp == v[pos], (pos, comp, v[pos])
