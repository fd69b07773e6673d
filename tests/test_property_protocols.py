"""Hypothesis cross-checks for the session-3 protocol constants and
credit/allocation arithmetic — pure-Python brute force against the
closed forms the SQL uses, no Spark session needed.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st


def test_rbo_tail_weights_equal_direct_depth_sum():
    """Per-document tail-weight contribution == the textbook per-depth
    overlap sum, for every possible (ra, rb) placement: summing W(m)
    over documents must equal summing w_d * overlap@d over depths."""
    from tiny_etl_multiproc_bigdata_spark.plans.quality import (
        _RBO_DEPTH,
        _RBO_TAIL,
        _RBO_W,
    )

    import itertools

    for n_docs in (1, 3, 10, 15):
        # rankings are permutations; try a few deterministic shuffles
        docs = list(range(n_docs))
        for shift in range(min(n_docs, 4)):
            ra = {d: i + 1 for i, d in enumerate(docs)}
            rb = {
                d: ((i + shift) % n_docs) + 1 for i, d in enumerate(docs)
            }
            direct = 0
            for d in range(1, _RBO_DEPTH + 1):
                top_a = {x for x in docs if ra[x] <= d}
                top_b = {x for x in docs if rb[x] <= d}
                direct += _RBO_W[d] * len(top_a & top_b)
            via_tail = sum(
                _RBO_TAIL[max(ra[x], rb[x])]
                for x in docs
                if max(ra[x], rb[x]) <= _RBO_DEPTH
            )
            assert direct == via_tail


@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=40)
)
@settings(max_examples=200, deadline=None)
def test_largest_remainder_conserves_budget(counts):
    """Hamilton apportionment: sum(alloc) == K exactly, every alloc in
    {base, base+1}, and base == floor(K * cnt / N)."""
    k = 10_000
    n = sum(counts)
    base = [(k * c) // n for c in counts]
    rem = [k * c - b * n for c, b in zip(counts, base)]
    extra = k - sum(base)
    order = sorted(
        range(len(counts)), key=lambda i: (-rem[i], i)
    )
    alloc = list(base)
    for i in order[:extra]:
        alloc[i] += 1
    assert sum(alloc) == k
    assert all(a - b in (0, 1) for a, b in zip(alloc, base))
    assert 0 <= extra <= len(counts)


@given(st.integers(min_value=1, max_value=200))
@settings(max_examples=200, deadline=None)
def test_ushaped_credit_sums_to_unit(n):
    """The 40/20/40 integer split with floor-remainder on pos=2 is
    exactly conservative for every touch count."""
    if n == 1:
        credits = [1_000_000]
    elif n == 2:
        credits = [500_000, 500_000]
    else:
        mid = 200_000 // (n - 2)
        leftover = 200_000 - (n - 2) * mid
        credits = [400_000]
        for pos in range(2, n):
            credits.append(mid + (leftover if pos == 2 else 0))
        credits.append(400_000)
    assert sum(credits) == 1_000_000
    assert len(credits) == n


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(
    st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60),
    st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60),
)
@settings(max_examples=100, deadline=None)
def test_bloom_construction_has_no_false_negatives(members, probes):
    """The md5 position construction used by bloom_membership_fpr can
    over-approximate but never miss: every member probe is positive."""
    m_bits, k = 4096, 3

    def positions(key: int) -> set[int]:
        return {
            _md5_long(f"{i}|{key}") % m_bits for i in range(k)
        }

    bits = set()
    for key in members:
        bits |= positions(key)
    for key in probes & members:
        assert positions(key) <= bits


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50
    )
)
@settings(max_examples=200, deadline=None)
def test_holt_integer_recurrence_is_shift_invariant(xs):
    """Adding a constant C to every input shifts the Holt level by
    exactly C and leaves the trend unchanged — the linearity property
    the powers-of-two floors must not break when C is a multiple of 4
    (floor-division exactness)."""
    c = 4_000

    def run(series):
        level, trend = series[0], 0
        for x in series[1:]:
            nl = (x + 3 * (level + trend)) // 4
            trend = (nl - level + trend) // 2
            level = nl
        return level, trend

    l1, b1 = run(xs)
    l2, b2 = run([x + c for x in xs])
    assert l2 == l1 + c
    assert b2 == b1
