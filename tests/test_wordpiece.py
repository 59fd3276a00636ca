"""WordPiece trainer (operators/wordpiece_train.py): exact parity of the
distributed fit against a pure-Python twin, merged-spelling / continuation
semantics, and greedy longest-match-first apply (incl. the '[UNK]' rule)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from inferdb_spark.operators.wordpiece_train import (
    MICRO,
    UNK,
    _merged_spelling,
    fit_wordpiece_merges,
    wordpiece_apply,
    wordpiece_vocab,
)

CORPUS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that cat that bat",
    "mat bat cat hat",
]


def _twin_fit(texts: list[str], n_merges: int) -> list[tuple[str, str, int, int]]:
    words = Counter(w for t in texts for w in t.split())
    seqs: dict[str, list[str]] = {
        w: [w[0]] + [f"##{c}" for c in w[1:]] for w in words
    }
    merges: list[tuple[str, str, int, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        syms: Counter = Counter()
        for w, cnt in words.items():
            s = seqs[w]
            for sym in s:
                syms[sym] += cnt
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best, bq = None, None
        for (a, b), c in sorted(pairs.items()):
            q = int(
                math.floor(
                    (math.log(c) - math.log(syms[a]) - math.log(syms[b]))
                    * MICRO
                    + 0.5
                )
            )
            if bq is None or q > bq:
                best, bq = (a, b, c), q
        a, b, c = best
        merges.append((a, b, c, bq))
        m = _merged_spelling(a, b)
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_fit_matches_python_twin(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text: string")
    got, _ = fit_wordpiece_merges(df, "text", n_merges=6)
    want = _twin_fit(CORPUS, 6)
    assert got == want


def test_merged_spelling_continuation_semantics():
    assert _merged_spelling("a", "##b") == "ab"
    assert _merged_spelling("##a", "##b") == "##ab"
    assert _merged_spelling("th", "##e") == "the"
    # vocab carries plain + ## chars + merge spellings in order
    v = wordpiece_vocab([("a", "##b", 5, -1), ("##c", "##d", 3, -2)], ["a", "b"])
    assert v == ["a", "b", "##a", "##b", "ab", "##cd"]


def test_apply_greedy_longest_match(spark):
    vocab = ["t", "h", "e", "a", "##h", "##e", "##a", "##t", "th", "the",
             "##he", "##at"]
    df = spark.createDataFrame(
        [("the",), ("that",), ("a",), ("ha",)], "word: string"
    )
    out = {
        r["word"]: r["toks"]
        for r in df.select(
            "word", wordpiece_apply(F.col("word"), vocab, 3).alias("toks")
        ).collect()
    }
    assert out["the"] == ["the"]           # whole-word beats th + ##e
    assert out["that"] == ["th", "##at"]   # longest at each position
    assert out["a"] == ["a"]
    assert out["ha"] == ["h", "##a"]


def test_apply_unk_on_uncovered_char(spark):
    vocab = ["a", "b", "##a"]  # no ##b: internal b is uncovered
    df = spark.createDataFrame([("ab",), ("ba",), ("z",)], "word: string")
    out = {
        r["word"]: r["toks"]
        for r in df.select(
            "word", wordpiece_apply(F.col("word"), vocab, 2).alias("toks")
        ).collect()
    }
    assert out["ab"] == [UNK]   # dies mid-word
    assert out["ba"] == ["b", "##a"]
    assert out["z"] == [UNK]    # dies at position 1


def test_fit_scores_are_likelihood_ratios(spark):
    # ('q','##u') in a corpus where qu always co-occurs: score must beat a
    # high-count but unselective pair — the WordPiece-vs-BPE distinction
    texts = ["qu qu qu aa aa aa aa aa aa ab ba"]
    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    merges, _ = fit_wordpiece_merges(df, "text", n_merges=1)
    (a, b, c, q) = merges[0]
    # (q,##u): ln(3/(3*3)) ~ -1.10 beats (a,##a): ln(6/(7*7)) ~ -2.10 —
    # the perfectly-predictive pair wins despite half the raw count
    assert (a, b) == ("q", "##u")
    assert c == 3
    want = int(math.floor((math.log(3) - math.log(3) - math.log(3)) * MICRO + 0.5))
    assert q == want
