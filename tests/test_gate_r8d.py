"""Third-implementation checks for the STAGED round-8 batch-4 gates
(inferdb_spark/gate_r8d.py): literal per-user sequence scans for the
funnel and retention gates, and a sklearn-free MI + greedy replay for
mRMR — all independent of the Spark plans and DuckDB oracles.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest


def _user_sequences(sf_dir):
    ev = duckdb.sql(
        f"""select user_id, event_type,
                   cast(epoch_us(ts) // 1000000 as bigint) * 4294967296
                     + event_id as p
            from '{sf_dir}/events.parquet'"""
    ).fetchall()
    seqs = defaultdict(list)
    for uid, et, p in ev:
        seqs[uid].append((p, et))
    for items in seqs.values():
        items.sort()
    return seqs


def test_funnel_matches_literal_scan(spark, sf_dir):
    from inferdb_spark.gate_r8d import _FUNNEL_STEPS, q_funnel_conversion_analysis

    out = {r["step"]: r for r in q_funnel_conversion_analysis(spark, sf_dir).collect()}
    seqs = _user_sequences(sf_dir)
    # literal strict-ordered scan: the stage pointer advances exactly on
    # the next required event type (first-touch greedy, which is optimal
    # for ordered funnels: taking the earliest valid event at each stage
    # can only help later stages)
    reached = [0] * len(_FUNNEL_STEPS)
    for items in seqs.values():
        stage = 0
        for _, et in items:
            if stage < len(_FUNNEL_STEPS) and et == _FUNNEL_STEPS[stage]:
                stage += 1
        for k in range(stage):
            reached[k] += 1
    n_users = len(seqs)
    prev = n_users
    for i, name in enumerate(_FUNNEL_STEPS):
        row = out[i + 1]
        assert row["step_name"] == name
        assert row["n_reached"] == reached[i], name
        assert row["n_users"] == n_users
        assert row["conv_start6"] == pytest.approx(reached[i] / n_users, abs=1e-6)
        assert row["conv_prev6"] == pytest.approx(
            0.0 if prev == 0 else reached[i] / prev, abs=1e-6
        )
        prev = reached[i]
    # funnel must narrow monotonically
    assert all(a >= b for a, b in zip(reached, reached[1:]))


def test_retention_matches_literal_scan(spark, sf_dir):
    from inferdb_spark.gate_r8d import _RET_MAXK, q_retention_cohort_analysis

    out = {
        (r["cohort_day"], r["k"]): r
        for r in q_retention_cohort_analysis(spark, sf_dir).collect()
    }
    rows = duckdb.sql(
        f"""select distinct user_id,
                   cast(datediff('day', date '1970-01-01', cast(ts as date))
                        as bigint) d
            from '{sf_dir}/events.parquet' where event_type = 'purchase'"""
    ).fetchall()
    days = defaultdict(set)
    for uid, d in rows:
        days[uid].add(d)
    counts = Counter()
    for uid, ds in days.items():
        first = min(ds)
        for d in ds:
            if 0 <= d - first <= _RET_MAXK:
                counts[(first, d - first)] += 1
    assert set(out) == set(counts)
    for (cd, k), n in counts.items():
        row = out[(cd, k)]
        assert row["n_retained"] == n
        assert row["cohort_size"] == counts[(cd, 0)]
        assert row["retention6"] == pytest.approx(n / counts[(cd, 0)], abs=1e-6)
    assert all(out[(cd, 0)]["retention6"] == 1.0 for (cd, k) in out if k == 0)


def test_mrmr_matches_sklearn_free_replay(spark, sf_dir):
    from inferdb_spark.gate_r8d import _MRMR_K, q_mrmr_feature_select

    out = [r.asDict() for r in q_mrmr_feature_select(spark, sf_dir).collect()]
    li = duckdb.sql(
        f"""select cast(round(l_discount * 100) as bigint) d,
                   cast(month(l_shipdate) as bigint) m,
                   least(9, cast(floor(l_extendedprice / 11000.0) as bigint)) p,
                   cast(floor(cast(round(l_quantity) as bigint) / 10.0) as bigint) q,
                   cast(round(l_tax * 100) as bigint) t,
                   cast(case when l_returnflag = 'R' then 1 else 0 end
                        as bigint) y
            from '{sf_dir}/lineitem.parquet'"""
    ).fetchall()
    names = ["d", "m", "p", "q", "t"]
    cols = {nm: [r[i] for r in li] for i, nm in enumerate(names)}
    cols["y"] = [r[5] for r in li]
    n = len(li)

    def mi_u(a, b):
        joint = Counter(zip(cols[a], cols[b]))
        ma = Counter(cols[a])
        mb = Counter(cols[b])
        s = 0
        for (av, bv), nab in joint.items():
            s += round(nab * math.log((nab * n) / (ma[av] * mb[bv])) * 1e9)
        return s

    rel = {f: mi_u(f, "y") for f in names}
    red = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            red[(a, b)] = mi_u(a, b)
    selected = []
    for step in range(1, _MRMR_K + 1):
        best = None
        for f in names:
            if f in selected:
                continue
            rs = sum(red[(min(f, s), max(f, s))] for s in selected)
            score = rel[f] * max(1, len(selected)) - rs
            key = (-score, f)
            if best is None or key < best[0]:
                best = (key, f, rel[f], rs)
        selected.append(best[1])
        row = out[step - 1]
        assert row["step"] == step
        assert row["feature"] == best[1], f"step {step}"
        assert row["relevance6"] == pytest.approx(best[2] / (n * 1e9), abs=2e-6)
        if step == 1:
            assert row["red_mean6"] == 0.0
            assert row["score6"] == row["relevance6"]
        else:
            assert row["red_mean6"] == pytest.approx(
                best[3] / ((step - 1) * n * 1e9), abs=2e-6
            )
            assert row["score6"] == pytest.approx(
                (best[2] - best[3] / (step - 1)) / (n * 1e9), abs=2e-6
            )
    # mRMR must not pick three copies of the same information: the
    # selected set is distinct and scores are finite
    assert len(set(selected)) == _MRMR_K
