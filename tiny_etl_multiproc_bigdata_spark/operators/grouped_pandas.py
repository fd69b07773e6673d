"""Grouped Pandas execution surface: applyInPandas (grouped map) and
applyInPandasWithState (custom stateful streaming operator) — the two
escape hatches for semantics built-ins can't express (reference §2.9:
arbitrary Python callables are its only extension mechanism).

Like every Python-side function in this engine, the UDFs are local
closures (by-value pickling; workers don't import this package) and
Arrow-batched. These are cold paths by design — see README.
"""

from __future__ import annotations

from typing import Iterator, Tuple  # module-level: pandas_udf resolves
# string type hints against module globals, not closure locals

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_etl_multiproc_bigdata_spark.catalog import table
from tiny_etl_multiproc_bigdata_spark.functions.timedomain import (
    epoch_us_ntz,
    stream_kernel_time_domain_sql,
)
from tiny_etl_multiproc_bigdata_spark.functions.jsonpath import (
    duck_json_bigint,
    json_bigint,
)
from tiny_etl_multiproc_bigdata_spark.functions.numerics import in_grid_domain
from tiny_etl_multiproc_bigdata_spark.plans.registry import register


@register(
    "grouped_map_zscore",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)   AS sx,
             CAST(sum(CAST(l_quantity AS DECIMAL(30,4))
                      * CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber,
           CASE WHEN sxx / n - (sx / n) * (sx / n) = 0 THEN 0.0
                ELSE (floor((l_quantity - sx / n)
                            / sqrt(sxx / n - (sx / n) * (sx / n))
                            * 10000 + 0.5) / 10000) END AS qty_zscore
    FROM lineitem l JOIN s USING (l_returnflag)
    """,
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map: per-returnflag z-score normalization
    of quantities — whole-group semantics (mean/std of the group) that
    per-row expressions can't see without a window. Each group arrives
    as one Arrow-backed pandas frame; output schema is declared.

    Scale note: the whole group must fit one executor's memory — the
    grouped-map contract. For unbounded groups use the window/power-sum
    formulation (which is also the oracle here)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        q = pdf["l_quantity"].astype("float64")
        mean = q.sum() / len(q)
        var = (q * q).sum() / len(q) - mean * mean
        if var == 0:  # constant group: oracle emits 0.0, pandas would NaN
            z = q * 0.0
        else:
            # portable half-up rounding — pandas .round is half-even and
            # engine round() diverges on ratio values (functions/rounding.py)
            z = np.floor((q - mean) / (var ** 0.5) * 10000 + 0.5) / 10000
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "qty_zscore": z,
            }
        )

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        zscore, "l_orderkey long, l_linenumber int, qty_zscore double"
    )




# The r13 --timeskew KERNEL-domain twin of a shared batch oracle: the
# pandas-stateful streaming entries reuse their batch twins' oracle
# text verbatim (state-equals-batch is the property under test), but
# their ENGINE side additionally rides the streaming kernel time
# domain (applyInPandasWithState converts every batch through
# Arrow→pandas datetime64[ns]: an in-portable-domain year-9999 event
# crashes the worker; a pre-epoch event is dropped by the watermark
# clock, which starts at 0). This injects the matching conjunct into
# the one standardized grid-domain subquery — asserted exact, so an
# oracle refactor cannot silently detach the twin.
_GRID_SUBQUERY = (
    "(SELECT * FROM events WHERE value IS NULL OR "
    "(value > -9007199254.740992 AND value < 9007199254.740992))"
)


def _with_kernel_time_domain(batch_oracle: str) -> str:
    assert batch_oracle.count(_GRID_SUBQUERY) == 1, "grid subquery drifted"
    return batch_oracle.replace(
        _GRID_SUBQUERY,
        "(SELECT * FROM events WHERE (value IS NULL OR "
        "(value > -9007199254.740992 AND value < 9007199254.740992))"
        f" AND {stream_kernel_time_domain_sql()})",
    )


@register(
    "streaming_stateful_counter",
    oracle=f"""
    SELECT user_id, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 2) AS total_value
    FROM (SELECT * FROM events WHERE (value IS NULL OR (value > -9007199254.740992 AND value < 9007199254.740992)) AND {stream_kernel_time_domain_sql()}) events GROUP BY user_id
    """,
)
def streaming_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, value-sum) state updated batch-by-batch —
    the hand-rolled analog of what groupBy.agg does with managed state,
    and the hook for arbitrary state machines (sessionizers, CEP,
    decaying counters). Bounded replay in one batch ⇒ the final
    emission equals the batch aggregate (the oracle)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from tiny_etl_multiproc_bigdata_spark.streaming.jobs import (
        _events_stream,
        _run_to_memory,
    )

    def update_counts(key, pdf_iter, state: GroupState):
        import numpy as np

        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            count += len(pdf)
            # per-row decimal-cent rounding keeps the sum exact and
            # order-independent, matching the oracle's DECIMAL(30,2)
            # cast — which rounds half AWAY FROM ZERO, so pandas
            # .round() (half-even) is wrong on exact half-cents.
            # Deliberately NOT rounding.py's round_half_up
            # (floor(x*s+0.5) = half-toward-+inf): that disagrees with
            # the DECIMAL cast on NEGATIVE half-cents (-12.5 → -12,
            # oracle says -13), hence the sign/abs form.
            v = pdf["value"]
            cents = np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)
            total += int(cents.sum())
        state.update((count, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [count],
                "total_value": [round(total / 100.0, 2)],
            }
        )

    ev = _events_stream(spark, sf_dir, require_measure_domain=True, require_kernel_time_domain=True).select("user_id", "value", "ts")
    out = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_counts,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="count long, total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_memory(out, spark, "stream_stateful_counter", "update")


@register(
    "grouped_arrow_value_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 2) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM (SELECT * FROM events WHERE value IS NULL OR (value > -9007199254.740992 AND value < 9007199254.740992)) events
    GROUP BY event_type
    """,
)
def grouped_arrow_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow grouped map (Spark 4): the zero-copy sibling of
    applyInPandas — each group arrives as a pyarrow.Table, skipping the
    pandas conversion entirely (no index materialization, no NumPy
    roundtrip), which matters when the per-group payload is large
    binary/tensor data. The summation quantizes each value to int64
    cents (half away from zero, mirroring the engines'
    CAST(double AS DECIMAL(30,2))) and sums the integers — exact and
    order-independent — before the final double cast.
    Same contract as applyInPandas: one group must fit
    one executor; unbounded groups belong in plain aggregations (the
    oracle's form)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(t: "pa.Table") -> "pa.Table":
        v = t.column("value")
        # half-AWAY-FROM-ZERO integer-cent quantization, matching the
        # engines' CAST(double AS DECIMAL(30,2)) — Arrow's pc.round and
        # Python's round() are half-even and would diverge on .xx5
        v64 = v.cast(pa.float64())
        sign = pc.sign(v64).cast(pa.int64())
        cents = pc.multiply(
            pc.floor(pc.add(pc.multiply(pc.abs(v64), 100.0), 0.5)).cast(
                pa.int64()
            ),
            sign,
        )
        # SQL sum over an all-NULL group is NULL, not 0 — `or 0` would
        # diverge from the oracle exactly on that group
        total_cents = pc.sum(cents).as_py()
        return pa.table(
            {
                # explicit string type: a NULL event_type group would
                # otherwise infer an all-null column as type null and
                # fail RESULT_COLUMN_TYPES_MISMATCH — SQL GROUP BY
                # keeps the NULL group (r11 NULL-parity audit)
                "event_type": pa.array(
                    [t.column("event_type")[0].as_py()], pa.string()
                ),
                "n": pa.array([t.num_rows], pa.int64()),
                # explicit float64 like event_type above: an all-NULL
                # value group would infer null-typed min/max columns
                "sum_value": pa.array(
                    [None if total_cents is None else total_cents / 100.0],
                    pa.float64(),
                ),
                "min_value": pa.array([pc.min(v).as_py()], pa.float64()),
                "max_value": pa.array([pc.max(v).as_py()], pa.float64()),
            }
        )

    e = table(spark, sf_dir, "events").filter(in_grid_domain(F.col("value"))).select("event_type", "value")
    return e.groupBy("event_type").applyInArrow(
        stats,
        schema=(
            "event_type string, n bigint, sum_value double, "
            "min_value double, max_value double"
        ),
    )


@register(
    "arrow_map_discount_bands",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_discount * 100 AS DECIMAL(18,0)) AS BIGINT) // 2 * 2
             AS discount_band
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def arrow_map_discount_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (non-grouped): per-PARTITION Arrow RecordBatch
    transform — completes the Python execution quartet beside
    pandas_udf (scalar), applyInPandas/applyInArrow (grouped) and
    mapInPandas (per-partition pandas). The Arrow path skips pandas
    Series materialization entirely — right when batches carry wide
    binary/tensor payloads. The computation (2-point discount banding)
    quantizes through decimal-style integer cents half-away-from-zero
    so the Arrow-side arithmetic matches the oracle's DECIMAL cast
    exactly. Zero shuffle: filter pushes to the scan, batches map in
    place."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def band(batches):  # noqa: ANN001
        for b in batches:
            d = pc.multiply(b.column("l_discount").cast(pa.float64()), 100.0)
            sign = pc.sign(d).cast(pa.int64())
            cents = pc.multiply(
                pc.floor(pc.add(pc.abs(d), 0.5)).cast(pa.int64()), sign
            )
            bands = pc.multiply(
                pc.floor(pc.divide(cents.cast(pa.float64()), 2.0)).cast(
                    pa.int64()
                ),
                2,
            )
            yield pa.record_batch(
                {
                    "l_orderkey": b.column("l_orderkey"),
                    "l_linenumber": b.column("l_linenumber"),
                    "discount_band": bands,
                }
            )

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.select("l_orderkey", "l_linenumber", "l_discount").mapInArrow(
        band, "l_orderkey long, l_linenumber int, discount_band long"
    )


@register(
    "cogroup_asof_pandas",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS t_us,
             -- default RANGE frame: PEERS at the same t_us are included,
             -- matching merge_asof's click_us <= t_us semantics exactly
             -- (a ROWS frame with an event_id tiebreak would exclude a
             -- same-microsecond click ordered after the purchase)
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC)
               AS last_click_us
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id, event_id,
           CAST(floor(last_click_us / 1000000) AS BIGINT)
             AS last_click_epoch,
           CAST(floor((t_us - last_click_us) / 1000000) AS BIGINT)
             AS secs_since_click
    FROM marked
    WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
    """,
)
def cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the one Arrow-UDF API shape the
    pandas/Arrow quartet doesn't cover: TWO DataFrames grouped on the
    same key arrive at one Python function as a pair of per-key pandas
    frames. The canonical use is per-key ``pd.merge_asof`` (purchases ⨝
    most-recent click at-or-before, per user), and the DuckDB oracle is
    the same running-MAX window as the native ``asof_last_signup`` —
    so the cogroup path is value-pinned against the declarative as-of
    twin's semantics, including exact-timestamp ties (merge_asof's
    allow_exact_matches ≡ the window's <=).

    100 TB shape: cogroup shuffles BOTH sides once on the key into
    co-located Arrow batches; per-group state is one user's clicks +
    purchases. Prefer the native window twin when semantics allow —
    this entry exists because real pipelines reach cogroup for logic
    only pandas has (merge_asof tolerances, interpolation, model
    scoring against per-key reference frames).

    Input contract (r11 NULL-parity audit): merge_asof requires
    sortable keys — NULL-ts rows excluded on both engines (pandas
    raises on NaN merge keys in the worker otherwise)."""
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    t_us = (
        epoch_us_ntz("ts")
    ).alias("t_us")
    base = e.select("user_id", "event_id", "event_type", t_us)
    clicks = base.filter(F.col("event_type") == "click").select(
        "user_id", "t_us"
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "t_us"
    )
    return cogroup_asof_from(purchases, clicks)


def cogroup_asof_from(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Cogroup + per-key merge_asof core over (user_id, event_id, t_us)
    purchases and (user_id, t_us) clicks — split out so the
    exact-timestamp tie semantics are testable on constructed frames
    (tests/test_operators.py). The UDF stays a local closure
    (module-level functions of this package pickle by reference and
    break under the external driver's session)."""

    def asof_merge(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        # r13 optimization round (guide §4.2 "vectorized native work
        # inside the UDF"): the per-group pd.merge_asof (two stable
        # sorts + the full merge machinery per USER) is replaced by one
        # numpy searchsorted — backward as-of with exact matches over
        # sorted click times is ct[searchsorted(ct, pt, 'right') - 1].
        # Ties on t_us collapse to the same time VALUE, so which tie
        # index searchsorted lands on is immaterial, exactly the
        # argument the mergesort sort made before. int64 throughout
        # (the old float64 NaN detour was exact too: t_us ~1.7e15 <
        # 2^53). Bit-identical at two SFs (sf0.001, sf0.01) +
        # constructed tie/empty frames: tests/test_cogroup_rewrite.py.
        if len(p) == 0 or len(c) == 0:
            return pd.DataFrame(
                columns=[
                    "user_id",
                    "event_id",
                    "last_click_epoch",
                    "secs_since_click",
                ]
            )
        pt = p["t_us"].to_numpy()
        ct = np.sort(c["t_us"].to_numpy())
        idx = np.searchsorted(ct, pt, side="right") - 1
        keep = idx >= 0
        click = ct[idx[keep]]
        t = pt[keep]
        return pd.DataFrame(
            {
                "user_id": p["user_id"].to_numpy()[keep],
                "event_id": p["event_id"].to_numpy()[keep],
                "last_click_epoch": click // 1_000_000,
                "secs_since_click": (t - click) // 1_000_000,
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof_merge,
            "user_id long, event_id long, last_click_epoch long, "
            "secs_since_click long",
        )
    )


def _register_streaming_anomaly_zscore() -> None:
    # import-order guard: reuse the batch twin's oracle verbatim — the
    # two entries MUST stay value-identical (same trailing-6 frame,
    # same power-sum double arithmetic, same rounding)
    from tiny_etl_multiproc_bigdata_spark.plans import windows  # noqa: F401
    from tiny_etl_multiproc_bigdata_spark.plans.registry import REGISTRY

    zscore_oracle = _with_kernel_time_domain(
        REGISTRY["anomaly_rolling_zscore"].oracle
    )

    @register("streaming_anomaly_zscore", oracle=zscore_oracle)
    def streaming_anomaly_zscore(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Stateful-streaming twin of anomaly_rolling_zscore via
        applyInPandasWithState: per user, each event is scored against
        the mean/std of its previous ≤6 values, with the ≤6-element
        value tail carried in the state store so a later micro-batch
        continues the trailing window exactly where the previous one
        ended (the state is the window, nothing else). Bounded
        availableNow replay in one batch ⇒ output equals the batch
        window plan, so this STATEFUL entry carries the full
        value-hash oracle — shared verbatim with the batch twin.

        Exactness: values quantize to integer cents (half away from
        zero, the DECIMAL(30,2) cast), trailing sums are integer, and
        the mean/var/sqrt run in IEEE doubles identical to both
        engines' arithmetic; NaN/short/zero-variance cases emit SQL
        NULL via a nullable Float64 extension array (plain float64
        NaN would reach Spark as NaN, not NULL)."""
        import numpy as np

        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )

        from tiny_etl_multiproc_bigdata_spark.streaming.jobs import (
            _events_stream,
            _run_to_memory,
        )

        _WIN = 6

        def score(key, pdf_iter, state: GroupState):
            # state: the ≤6 most recent cent values, nulls as the
            # int64-min sentinel (state arrays can't hold SQL NULLs)
            SENT = -(2**63)
            tail = list(state.get[0]) if state.exists else []
            frames = []
            for pdf in pdf_iter:
                frames.append(pdf)
            pdf = pd.concat(frames).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            v = pdf["value"].to_numpy(dtype="float64")
            valid = ~np.isnan(v)
            cents = np.where(
                valid, np.sign(v) * np.floor(np.abs(v) * 100 + 0.5), 0
            ).astype("int64")
            # prepend the carried tail
            t_c = np.array(
                [0 if t == SENT else t for t in tail], dtype="int64"
            )
            t_v = np.array([t != SENT for t in tail], dtype=bool)
            c_all = np.concatenate([t_c, cents])
            m_all = np.concatenate([t_v, valid])
            off = len(tail)
            n = len(v)
            zs = np.full(n, np.nan)
            ks = np.zeros(n, dtype="int64")
            for j in range(n):
                lo = max(0, off + j - _WIN)
                w_c = c_all[lo : off + j]
                w_m = m_all[lo : off + j]
                k = int(w_m.sum())
                ks[j] = k
                if k >= 3 and valid[j]:
                    S = int(w_c[w_m].sum())
                    T = int((w_c[w_m].astype(object) ** 2).sum())
                    sx = float(S) / 100.0
                    sxx = float(T) / 10000.0
                    var = (sxx - sx * sx / k) / (k - 1)
                    if var > 0:
                        zs[j] = (v[j] - sx / k) / np.sqrt(var)
            new_tail = [
                int(c_all[i]) if m_all[i] else SENT
                for i in range(max(0, off + n - _WIN), off + n)
            ]
            state.update((new_tail,))
            z_round = np.floor(zs * 10000 + 0.5) / 10000
            zcol = pd.array(
                [None if np.isnan(z) else z for z in z_round],
                dtype="Float64",
            )
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "value": pdf["value"].to_numpy(),
                    "n_baseline": ks,
                    "zscore": zcol,
                    "is_anomaly": [
                        (not np.isnan(z)) and abs(z) > 3 for z in zs
                    ],
                }
            )

        ev = _events_stream(spark, sf_dir, require_measure_domain=True, require_kernel_time_domain=True).select(
            "user_id", "event_id", "value", "ts"
        )
        out = (
            ev.withWatermark("ts", "1 hour")
            .groupBy("user_id")
            .applyInPandasWithState(
                score,
                outputStructType=(
                    "user_id long, event_id long, value double, "
                    "n_baseline long, zscore double, is_anomaly boolean"
                ),
                stateStructType="tail array<long>",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        return _run_to_memory(out, spark, "stream_anomaly_zscore", "update")


_register_streaming_anomaly_zscore()


def _register_streaming_cusum_alert() -> None:
    # import-order guard: share the batch twin's oracle verbatim — the
    # two entries MUST stay value-identical (same k/h constants, same
    # integer recurrence)
    from tiny_etl_multiproc_bigdata_spark.plans import windows
    from tiny_etl_multiproc_bigdata_spark.plans.registry import REGISTRY

    cusum_oracle = _with_kernel_time_domain(
        REGISTRY["cusum_alert_path"].oracle
    )

    @register("streaming_cusum_alert", oracle=cusum_oracle)
    def streaming_cusum_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Stateful-streaming twin of cusum_alert_path via
        applyInPandasWithState: per event_type, the one-sided CUSUM
        g_t = max(0, g_{t-1} + x_t − k) advances event by event with
        TWO integers of carried state — (running sum S, running min of
        S) — exactly the closed form the batch entry computes with
        stacked windows. Bounded availableNow replay in one micro-batch
        ⇒ output equals the batch plan, so this stateful entry carries
        the full value-hash oracle, shared verbatim with the batch
        twin.

        100 TB shape: O(1) state per monitored series regardless of
        stream length (contrast the z-score twin's ≤6-value tail) —
        the state store stays series-count-sized forever; this is the
        canonical "detector as two accumulators" pattern that makes
        CUSUM deployable on unbounded streams."""
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )

        from tiny_etl_multiproc_bigdata_spark.streaming.jobs import (
            _events_stream,
            _run_to_memory,
        )

        K = windows._CUSUM_K
        H = windows._CUSUM_H

        def advance(key, pdf_iter, state: GroupState):
            s_run, s_min, seen = (
                state.get if state.exists else (0, 0, False)
            )
            frames = [pdf for pdf in pdf_iter]
            pdf = pd.concat(frames).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            v = pdf["value"].to_numpy(dtype="float64")
            import numpy as np

            # NULL values contribute NOTHING to the running sums (SQL
            # sum skips NULL d — no -K either) but still emit a row
            # with the current g; astype(int64) on NaN is undefined
            # garbage, so mask first. Rows before the FIRST non-null
            # value see an all-NULL running sum — g and alert are NULL
            # there, exactly like the shared oracle (DuckDB least()
            # ignores NULLs, so g = NULL - 0 = NULL). (r11 NULL-parity
            # audit)
            valid = ~np.isnan(v)
            cents = (
                np.sign(np.nan_to_num(v))
                * np.floor(np.abs(np.nan_to_num(v)) * 100 + 0.5)
            ).astype("int64")
            gs: list = []
            for j in range(len(v)):
                if valid[j]:
                    seen = True
                    s_run += int(cents[j]) - K
                    s_min = min(s_min, s_run)
                gs.append(s_run - min(0, s_min) if seen else None)
            state.update((s_run, s_min, seen))
            g_col = pd.array(gs, dtype="Int64")
            yield pd.DataFrame(
                {
                    "event_type": pdf["event_type"].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "g": g_col,
                    "alert": pd.array(
                        [None if g is None else g > H for g in gs],
                        dtype="boolean",
                    ),
                }
            )

        # event-time contract mirrored in the shared batch oracle
        ev = _events_stream(
            spark, sf_dir, require_event_time=True,
            require_measure_domain=True, require_kernel_time_domain=True,
        ).select("event_type", "event_id", "value", "ts")
        out = (
            ev.withWatermark("ts", "1 hour")
            .groupBy("event_type")
            .applyInPandasWithState(
                advance,
                outputStructType=(
                    "event_type string, event_id long, g long, "
                    "alert boolean"
                ),
                # STATE-SCHEMA BREAK (r11, documented per ADVICE r11):
                # 'seen boolean' was added to the pre-r11 (s_run,
                # s_min) layout for the leading-NULL contract. A
                # checkpoint written by the old layout cannot restore
                # against this one (the state-store deserializer
                # rejects the row count before Python could default
                # it), so a production upgrade must restart from a
                # fresh checkpoint dir or replay the source; the
                # registry twin is unaffected (ephemeral availableNow
                # + in-memory sink, no persisted checkpoint survives).
                stateStructType="s_run long, s_min long, seen boolean",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        return _run_to_memory(out, spark, "stream_cusum_alert", "update")


_register_streaming_cusum_alert()


def _register_streaming_sprt_decision() -> None:
    # share the batch oracle verbatim — same constants, same recurrence
    from tiny_etl_multiproc_bigdata_spark.plans import advanced
    from tiny_etl_multiproc_bigdata_spark.plans.registry import REGISTRY

    sprt_oracle = _with_kernel_time_domain(
        REGISTRY["sprt_sequential_test"].oracle
    )

    @register("streaming_sprt_decision", oracle=sprt_oracle)
    def streaming_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Stateful-streaming twin of sprt_sequential_test: the SPRT
        walk advances per event with THREE integers of state (n, llr,
        decided) and a cohort's decision row is emitted EXACTLY ONCE —
        in the micro-batch where the bound is first crossed; after
        that the state is a tombstone and later batches emit nothing,
        which is precisely the always-valid early-stopping contract
        (peeking is free because each observation's test is the
        decision rule). Undecided cohorts never emit, matching the
        batch entry's crossing-only output, so the full value-hash
        oracle is shared verbatim.

        100 TB shape: O(1) state per monitored series, decision rows
        ≤ one per series over the stream's lifetime — the cheapest
        possible continuous-experimentation readout."""
        import numpy as np

        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )

        from tiny_etl_multiproc_bigdata_spark.streaming.jobs import (
            _events_stream,
            _run_to_memory,
        )

        LA = advanced._SPRT_LA
        LB = advanced._SPRT_LB
        BOUND = advanced._SPRT_BOUND
        HI = advanced._SPRT_HI

        def advance(key, pdf_iter, state: GroupState):
            n, llr, decided = state.get if state.exists else (0, 0, 0)
            frames = [pdf for pdf in pdf_iter]
            pdf = pd.concat(frames).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            out = None
            if not decided:
                v = pdf["value"].to_numpy(dtype="float64")
                cents = (
                    np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)
                ).astype("int64")
                for c in cents:
                    n += 1
                    llr += LA if int(c) > HI else LB
                    if llr >= BOUND or llr <= -BOUND:
                        decided = 1
                        out = pd.DataFrame(
                            {
                                "cohort": [int(key[0])],
                                "n_at_decision": [n],
                                "llr_micro": [llr],
                                "decision": [
                                    "accept_h1"
                                    if llr >= BOUND
                                    else "accept_h0"
                                ],
                            }
                        )
                        break
            state.update((n, llr, decided))
            if out is not None:
                yield out

        ev = _events_stream(spark, sf_dir, require_measure_domain=True, require_kernel_time_domain=True).select(
            (F.col("user_id") % 2).alias("cohort"),
            "event_id",
            "value",
            "ts",
        )
        out = (
            ev.withWatermark("ts", "1 hour")
            .groupBy("cohort")
            .applyInPandasWithState(
                advance,
                outputStructType=(
                    "cohort long, n_at_decision long, llr_micro long, "
                    "decision string"
                ),
                stateStructType="n long, llr long, decided long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        return _run_to_memory(out, spark, "stream_sprt_decision", "update")


_register_streaming_sprt_decision()


# ---- Holt linear smoothing (sequential recurrence per group) -------------


@register(
    "holt_linear_forecast",
    oracle="""
    WITH RECURSIVE monthly AS (
      SELECT n_name, date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    idx AS (
      SELECT n_name, x,
             row_number() OVER (PARTITION BY n_name ORDER BY mon) AS i
      FROM monthly
    ),
    cnt AS (SELECT n_name, max(i) AS mx FROM idx GROUP BY 1),
    s AS (
      SELECT n_name, i, x AS l, CAST(0 AS BIGINT) AS b
      FROM idx WHERE i = 1
      UNION ALL
      SELECT i2.n_name, i2.i,
             CAST(floor((i2.x + 3 * (s.l + s.b)) / 4.0) AS BIGINT) AS l,
             CAST(floor((CAST(floor((i2.x + 3 * (s.l + s.b)) / 4.0)
                              AS BIGINT) - s.l + s.b) / 2.0) AS BIGINT) AS b
      FROM s JOIN idx i2 ON i2.n_name = s.n_name AND i2.i = s.i + 1
    )
    SELECT s.n_name,
           s.l AS level_cents,
           s.b AS trend_cents,
           CAST(s.l + 3 * s.b AS BIGINT) AS forecast3_cents
    FROM s JOIN cnt ON s.n_name = cnt.n_name AND s.i = cnt.mx
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend) over each
    nation's monthly order revenue, 3-months-ahead forecast — a
    GENUINELY sequential recurrence (each step's state feeds the next
    through a floor, so no prefix-sum closed form exists, unlike
    ewma_fixed_horizon / cusum_alert_path). Exact across engines by
    construction: alpha=1/4 and beta=1/2 are powers of two, so every
    smoothing step is an integer floor-division both sides compute
    bit-identically —
        l_t = (x_t + 3*(l+b)) // 4,  b_t = (l_t - l + b) // 2.
    The oracle drives the same recurrence through a recursive CTE;
    the engine runs it as a per-group pandas loop (the canonical
    applyInPandas use: per-key sequential state, parallel across
    keys).

    100 TB shape: the heavy part — orders x customer join + monthly
    rollup — is fully distributed with map-side partial sums; the
    recurrence then runs over the AGGREGATED series (|months| rows
    per nation, bounded by calendar time, not data size), shard-
    parallel across nations. State never touches the driver."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.trunc("o_orderdate", "month").alias("mon"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("x")
        )
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("mon")
        xs = [int(v) for v in pdf["x"]]
        level, trend = xs[0], 0
        for x in xs[1:]:
            new_level = (x + 3 * (level + trend)) // 4
            trend = (new_level - level + trend) // 2
            level = new_level
        return pd.DataFrame(
            {
                "n_name": [pdf["n_name"].iloc[0]],
                "level_cents": [level],
                "trend_cents": [trend],
                "forecast3_cents": [level + 3 * trend],
            }
        )

    return monthly.groupBy("n_name").applyInPandas(
        holt,
        schema=(
            "n_name string, level_cents long, trend_cents long, "
            "forecast3_cents long"
        ),
    )


@register(
    "streaming_state_timeout_sessions",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS t_us FROM events
      WHERE ts IS NOT NULL AND {stream_kernel_time_domain_sql()}
    ),
    wm AS (
      SELECT (SELECT epoch_us(max(ts)) // 1000 FROM events
              WHERE {stream_kernel_time_domain_sql()}) - 3600000 AS ms
    ),
    flagged AS (
      SELECT user_id, t_us,
             CASE WHEN lag(t_us) OVER w IS NULL
                       OR t_us - lag(t_us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
      SELECT user_id, t_us,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY t_us ASC
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    agg AS (
      SELECT user_id, session_id,
             min(t_us) AS start_us, max(t_us) AS last_us,
             count(*) AS n_events,
             max(session_id) OVER (PARTITION BY user_id) AS last_sid
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(start_us // 1000000 AS BIGINT) AS session_start_epoch,
           CAST(n_events AS BIGINT) AS n_events
    FROM agg, wm
    WHERE session_id < last_sid
       OR (last_us + 1800000000) // 1000 < wm.ms
    """,
)
def streaming_state_timeout_sessions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Arbitrary stateful sessionization with EVENT-TIME TIMEOUTS
    (applyInPandasWithState + GroupStateTimeout.EventTimeTimeout) —
    the feature the managed session_window hides: the operator's own
    state machine folds events into 30-min-gap sessions, emits a
    session the moment a later event CLOSES it, and registers a
    timeout at last_event + gap so the watermark — not a future event
    — flushes the final open session. The oracle states both emission
    paths: every non-final session unconditionally, the final session
    only where its timeout precedes the terminal watermark (max event
    time - 1h delay, ms floor). The hasTimedOut branch is exactly the
    code path a CEP/TTL operator needs and the NoTimeout counter
    entry cannot exercise.

    100 TB shape: state is one (start, last, n) triple per user;
    timeouts evict it, so idle keys cost nothing after gap + delay.
    Partitioned by user across the shuffle like every stateful op."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from tiny_etl_multiproc_bigdata_spark.streaming.jobs import (
        _events_stream,
        _run_to_memory,
    )

    gap_us = 1_800_000_000

    def sessionize(key, pdf_iter, state: GroupState):
        rows = []
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            rows.append((key[0], start // 1_000_000, n))
        else:
            start, last, n = state.get if state.exists else (None, None, 0)
            import pandas as _pd

            batches = [pdf for pdf in pdf_iter]
            if batches:
                df = _pd.concat(batches).sort_values("t_us")
                for t in df["t_us"]:
                    t = int(t)
                    if start is None:
                        start, last, n = t, t, 1
                    elif t - last > gap_us:
                        rows.append((key[0], start // 1_000_000, n))
                        start, last, n = t, t, 1
                    else:
                        last, n = t, n + 1
            if start is not None:
                state.update((start, last, n))
                # event-time timeout: watermark passing last+gap flushes
                state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield pd.DataFrame(
            rows, columns=["user_id", "session_start_epoch", "n_events"]
        )

    # event-time contract mirrored in the oracle (state machine with
    # event-time timeouts)
    ev = (
        _events_stream(spark, sf_dir, require_event_time=True,
                       require_kernel_time_domain=True)
        .select(
            "user_id",
            "ts",
            # exact LTZ instant micros (the old unix_timestamp*1e6 +
            # SSSSSS reconstruction double-counts pre-epoch fractions;
            # r13 --timeskew)
            F.unix_micros("ts").alias("t_us"),
        )
    )
    out = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=(
                "user_id long, session_start_epoch long, n_events long"
            ),
            stateStructType="start long, last long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return _run_to_memory(out, spark, "stream_state_timeout_sessions", "append")


@register(
    "pandas_grouped_agg_udf",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             {duck_json_bigint("props", "$.k")} AS vol
      FROM events
      WHERE {duck_json_bigint("props", "$.k")} IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CASE WHEN sum(vol) = 0 THEN NULL
                ELSE (floor(CAST(sum(cents * vol) AS DOUBLE) / sum(vol)
                            * 10000 + 0.5) / 10000) END AS wavg_cents
    FROM v GROUP BY event_type
    """,
)
def pandas_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the third pandas-UDF shape (scalar and
    grouped-map are registered elsewhere): a vectorized aggregate that
    consumes each group's columns as pandas Series and returns ONE
    scalar, usable inside .agg() alongside built-ins. The UDF computes
    a volume-weighted mean with int64 accumulation inside pandas
    (exact, order-independent — a float dot product would vary with
    row order across shuffles) and quantizes before returning, so the
    double that crosses Arrow is already deterministic.

    100 TB shape: unlike built-in aggregates, grouped-agg pandas UDFs
    do NOT partial-aggregate — each group's full column set ships to
    one python worker. Correct tool for modest group counts with
    heavy per-group math; for token-stream scale the built-in
    sum(cents*vol)/sum(vol) (the oracle's form) is the hot path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(cents: pd.Series, vol: pd.Series) -> float:
        num = int((cents.astype("int64") * vol.astype("int64")).sum())
        den = int(vol.astype("int64").sum())
        if den == 0:
            return None
        import math

        return math.floor(num / den * 10000 + 0.5) / 10000

    @pandas_udf("long")
    def n_rows(cents: pd.Series) -> int:
        # grouped-agg UDFs cannot mix with built-in aggregates in one
        # .agg() (INVALID_PANDAS_UDF_PLACEMENT) — the count rides as a
        # second pandas aggregate instead
        return len(cents)

    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
            "cents"
        ),
        json_bigint("props", "$.k").alias("vol"),
    ).filter(F.col("vol").isNotNull())
    return v.groupBy("event_type").agg(
        n_rows("cents").alias("n"),
        wavg("cents", "vol").alias("wavg_cents"),
    )


@register(
    "pandas_iter_udf_scoring",
    oracle="""
    SELECT event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT)
           * CASE event_type WHEN 'click' THEN 2 WHEN 'view' THEN 1
                             WHEN 'purchase' THEN 10 WHEN 'signup' THEN 5
                             ELSE 0 END AS score
    FROM (SELECT * FROM events WHERE value IS NULL OR (value > -9007199254.740992 AND value < 9007199254.740992)) events
    """,
)
def pandas_iter_udf_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar pandas UDF (Iterator[Series] ->
    Iterator[Series]) — the UDF shape built for MODEL INFERENCE: the
    expensive initialization (here a weight table standing in for a
    loaded model/tokenizer) runs ONCE per python worker, then every
    Arrow batch streams through the hot loop — the exact pattern for
    embedding models or quality classifiers scoring a 100 TB corpus,
    where per-batch model loading (what a plain scalar UDF does per
    call-site misuse) dominates cost. Scoring itself is integer
    (cents x per-type weight), so the oracle is pure SQL and the
    comparison exact.

    100 TB shape: Arrow-batched, partition-parallel; init cost is
    O(workers), not O(batches). The multimodal decode entries use the
    mapInPandas sibling; this pins the scalar-expression form."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def score(
        it: Iterator[Tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        # one-time init per worker (the "model load")
        weights = {"click": 2, "view": 1, "purchase": 10, "signup": 5}
        for cents, etype in it:
            w = etype.map(weights).fillna(0).astype("int64")
            # nullable Int64, not int64: a NULL value arrives as NaN
            # (pandas upcasts the int column) and must yield a NULL
            # score like the oracle's NULL*CASE — plain astype("int64")
            # raises on NaN in the worker (r11 NULL-parity audit)
            yield cents.astype("Int64") * w

    e = table(spark, sf_dir, "events").filter(in_grid_domain(F.col("value")))
    return e.select(
        "event_id",
        score(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
            F.col("event_type"),
        ).alias("score"),
    )
