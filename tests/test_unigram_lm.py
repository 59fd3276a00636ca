"""Unigram-LM trainer (operators/unigram_lm.py): exact parity of the full
multi-round fit (seeding + EM + pruning) against a pure-Python twin, plus
Viterbi edge cases."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from inferdb_spark.operators.unigram_lm import (
    MICRO,
    fit_unigram_lm,
    unigram_viterbi,
)


def _py_tokens(text: str) -> list[str]:
    n = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
    return n.split(" ") if n else []


def _py_viterbi(word: str, pieces: dict[str, int], L: int):
    n = len(word)
    best: list[tuple[int, int, str] | None] = [(0, 0, "")] + [None] * n
    for i in range(1, n + 1):
        cands = []
        for l in range(1, min(L, i) + 1):
            prev = best[i - l]
            piece = word[i - l : i]
            if prev is None or piece not in pieces:
                continue
            cands.append((prev[0] + pieces[piece], l, prev[2] + "/" + piece))
        best[i] = max(cands) if cands else None
    if best[n] is None:
        return None
    q, _, seg = best[n]
    return q, seg[1:]


def _py_fit(
    texts: list[str],
    n_rounds: int,
    L: int,
    seed_multi: int,
    target_multi: int,
):
    qln = lambda n, tot: int(math.floor((math.log(n) - math.log(tot)) * MICRO + 0.5))
    words: dict[str, int] = {}
    for t in texts:
        for w in _py_tokens(t):
            words[w] = words.get(w, 0) + 1
    subs: dict[str, int] = {}
    chars: dict[str, int] = {}
    for w, c in words.items():
        for i in range(len(w)):
            chars[w[i]] = chars.get(w[i], 0) + c
            for l in range(2, L + 1):
                if i + l <= len(w):
                    subs[w[i : i + l]] = subs.get(w[i : i + l], 0) + c
    top = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_multi]
    char_set = set(chars)
    weights = dict(chars)
    weights.update(top)
    tot0 = sum(weights.values())
    pieces = {p: qln(w, tot0) for p, w in weights.items()}
    table = []
    for _ in range(n_rounds):
        got: dict[str, int] = {}
        for w, c in words.items():
            v = _py_viterbi(w, pieces, L)
            if v is None:
                continue
            for p in v[1].split("/"):
                got[p] = got.get(p, 0) + c
        tot = sum(got.values())
        scored = {p: (n, qln(n, tot)) for p, n in got.items()}
        multis = sorted(
            ((p, n, s) for p, (n, s) in scored.items() if p not in char_set),
            key=lambda t: (-t[1], t[0]),
        )
        cur = len([p for p in pieces if p not in char_set])
        keep_n = max(target_multi, -(-3 * cur // 4))
        kept = multis[:keep_n]
        pieces = {p: s for p, _, s in kept}
        table = sorted(
            list(kept)
            + [
                (
                    c,
                    scored.get(c, (0, 0))[0],
                    scored[c][1] if c in scored else qln(1, max(tot, 1)),
                )
                for c in sorted(char_set)
            ],
            key=lambda t: (-t[1], t[0]),
        )
        pieces.update({p: s for p, _, s in table if p in char_set})
    return table


FIXTURE = [
    "the order table scans the customer table",
    "big window scans merge the sorted stream",
    "the the query scans a sorted order stream",
    "customer orders filter the big table",
    "window merge joins order the stream fast",
]


def test_fit_unigram_lm_matches_python_twin(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(FIXTURE)), "text": FIXTURE})
    )
    got = fit_unigram_lm(
        sdf, "text", n_rounds=3, max_piece_len=4, seed_multi=16, target_multi=6
    )
    exp = _py_fit(FIXTURE, n_rounds=3, L=4, seed_multi=16, target_multi=6)
    assert got == exp
    # the fit genuinely learned multi-char pieces
    assert any(len(p) > 1 for p, _, _ in got)


def test_viterbi_null_on_uncovered_chars(spark):
    pieces = {c: -3_000_000 for c in "ab"}
    df = spark.createDataFrame([("abba",), ("abc",)], "word: string")
    out = {
        r["word"]: r["v"]
        for r in df.select(
            "word", unigram_viterbi(F.col("word"), pieces, 3).alias("v")
        ).collect()
    }
    assert out["abba"] is not None and out["abba"]["seg"] == "a/b/b/a"
    assert out["abc"] is None  # 'c' not in inventory


def test_viterbi_prefers_high_score_path(spark):
    pieces = {c: -3_000_000 for c in "table"}
    pieces.update({"ta": -3_100_000, "ble": -3_200_000, "table": -9_000_000})
    df = spark.createDataFrame([("table",)], "word: string")
    v = df.select(unigram_viterbi(F.col("word"), pieces, 5).alias("v")).collect()[0]["v"]
    # ta/ble = -6.3e6 beats t/a/b/l/e = -15e6 and table = -9e6
    assert v["seg"] == "ta/ble" and v["score_q"] == -6_300_000
