"""Property-based tests (hypothesis) for the determinism-critical kernels.

These run the pure-Python mirror of what the Column expressions compute and
assert the algebraic properties the engine relies on; the expression↔python
equivalence itself is covered by the example-based tests and the DuckDB
gate.
"""

import math

from hypothesis import given, settings, strategies as st

from inferdb_spark.functions.hashing import MERSENNE_P, perm_params
from inferdb_spark.operators.binning import BinSpec


def _bin_py(x: float, splits: list[float]) -> int:
    return sum(1 for s in splits if x > s)


@given(
    st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=6, unique=True),
    st.floats(-2e6, 2e6),
)
def test_binspec_monotone_and_bounded(splits, x):
    splits = sorted(splits)
    b = _bin_py(x, splits)
    assert 0 <= b <= len(splits)
    # monotonicity: larger x never gets a smaller bin
    assert _bin_py(x + 1.0, splits) >= b


@given(st.floats(-1e6, 1e6), st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=5, unique=True))
def test_binspec_boundary_is_lower_bin(x, splits):
    splits = sorted(splits)
    # a value exactly ON a split belongs to the lower bin (x > s strict)
    for i, s in enumerate(splits):
        assert _bin_py(s, splits) == i


@given(st.integers(0, 2**52 - 1), st.integers(1, 64))
def test_perm_hash_stays_in_field(h, n):
    for a, b in perm_params(n):
        v = (a * (h % MERSENNE_P) + b) % MERSENNE_P
        assert 0 <= v < MERSENNE_P
        # no int64 overflow in the intermediate product
        assert a * (h % MERSENNE_P) + b < 2**63


@given(
    st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=40),
    st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=40),
)
@settings(max_examples=50)
def test_minhash_collision_tracks_jaccard(sa, sb):
    """P(min-perm equal) == Jaccard in expectation; check the exact-set
    identities: J=1 -> all slots equal; disjoint sets rarely all-equal."""
    params = perm_params(16)

    def h(s: str) -> int:
        import hashlib

        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16) % MERSENNE_P

    def sig(ss):
        return [min((a * h(x) + b) % MERSENNE_P for x in ss) for a, b in params]

    assert sig(sa) == sig(sa)  # deterministic
    if sa == sb:
        assert sig(sa) == sig(sb)
    inter = len(sa & sb)
    union = len(sa | sb)
    eq_slots = sum(1 for u, v in zip(sig(sa), sig(sb)) if u == v)
    if inter == union:  # identical sets
        assert eq_slots == 16
    if inter == 0 and union >= 20:
        assert eq_slots <= 8  # disjoint largish sets shouldn't collide much


@given(st.lists(st.integers(-5, 5), min_size=1, max_size=30))
def test_simhash_py_model_bits_bounded(votes):
    # fingerprint reconstruction: bit j set iff vote > 0 — sanity on the fold
    n_bits = 8
    fp = 0
    for j in range(n_bits):
        v = votes[j % len(votes)]
        if v > 0:
            fp += 2**j
    assert 0 <= fp < 2**n_bits


@given(st.floats(0.01, 700.0))
def test_crazy_exp_model(x):
    # the clamp spec: <0 -> 0, >=700 -> exp(700)
    assert math.exp(min(x, 700.0)) <= math.exp(700.0)


def test_binspec_expr_matches_python_model(spark):
    import random

    random.seed(7)
    splits = sorted(random.uniform(-100, 100) for _ in range(5))
    xs = [random.uniform(-150, 150) for _ in range(200)] + list(splits)
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    spec = BinSpec(column="x", splits=splits)
    got = [r[0] for r in df.select(spec.expr()).collect()]
    want = [_bin_py(x, splits) for x in xs]
    assert got == want


def _auc_bruteforce(pairs):
    """O(n²) pair counting: wins + 0.5*ties over pos×neg pairs."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return num / (len(pos) * len(neg))


def _auc_ranksum(pairs):
    """Pure-python mirror of metrics.binary_auc (integer half-unit ranks)."""
    from collections import Counter

    cnt = Counter()
    posc = Counter()
    for s, y in pairs:
        cnt[s] += 1
        posc[s] += y
    cum = 0
    rank_sum2 = 0
    for s in sorted(cnt):
        cum += cnt[s]
        rank_sum2 += posc[s] * (2 * cum - cnt[s] + 1)
    npos = sum(posc.values())
    nneg = sum(cnt.values()) - npos
    if npos == 0 or nneg == 0:
        return None
    return (rank_sum2 / 2.0 - npos * (npos + 1) / 2.0) / (npos * nneg)


@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 1)), min_size=2, max_size=60
    )
)
def test_auc_ranksum_equals_bruteforce(pairs):
    want = _auc_bruteforce(pairs)
    got = _auc_ranksum(pairs)
    if want is None:
        assert got is None
    else:
        assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 3_000)), max_size=20),
    st.integers(60, 1200),
)
def test_interval_banding_model_complete(points, intervals, band):
    """The banding construction loses no matches: a point in [s, e) always
    shares at least one band bucket with its interval (pure-python mirror
    of relational_ext.interval_join's bucket math)."""
    for t in points:
        for s, length in intervals:
            e = s + length
            if s <= t < e:
                span = range(s // band, e // band + 1)
                assert t // band in span
