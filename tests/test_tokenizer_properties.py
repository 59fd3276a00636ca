"""Property-based tests (hypothesis) for the tokenizer kernels' pure-Python
models: BPE merge application, WordPiece greedy longest-match, unigram-LM
Viterbi.  The Spark-expression <-> python equivalence is covered by the
example tests and the DuckDB gates; here we pin the ALGEBRAIC invariants
every tokenizer must satisfy on arbitrary inputs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

WORD = st.text(alphabet="abcd", min_size=1, max_size=10)


def _bpe_apply_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    # wrapped-symbol chained literal replace — the engine's exact rule
    seq = "|" + "||".join(word) + "|"
    for a, b in merges:
        seq = seq.replace(f"|{a}||{b}|", f"|{a}{b}|")
    return seq.strip("|").split("||")


def _wp_apply_py(word: str, vocab: set[str], L: int) -> list[str]:
    out, pos = [], 0
    while pos < len(word):
        for l in range(min(L, len(word) - pos), 0, -1):
            raw = word[pos : pos + l]
            piece = raw if pos == 0 else "##" + raw
            if piece in vocab:
                out.append(piece)
                pos += l
                break
        else:
            return ["[UNK]"]
    return out


def _viterbi_py(word: str, pieces: dict[str, int], L: int):
    # max-plus DP, (q DESC, l DESC) tie-break — the engine's exact rule
    best: list = [None] * (len(word) + 1)
    best[0] = (0, 0, [])
    for i in range(1, len(word) + 1):
        cands = []
        for l in range(1, min(L, i) + 1):
            prev, piece = best[i - l], word[i - l : i]
            if prev is not None and piece in pieces:
                cands.append((prev[0] + pieces[piece], l, prev[2] + [piece]))
        if cands:
            best[i] = max(cands, key=lambda c: (c[0], c[1]))
    return best[len(word)]


@given(WORD, st.lists(st.tuples(st.text("abcd", min_size=1, max_size=2),
                                st.text("abcd", min_size=1, max_size=2)),
                      max_size=6))
@settings(max_examples=200)
def test_bpe_apply_lossless(word, merges):
    """Any merge list applied to any word must reconstruct the word —
    merging never drops or duplicates characters."""
    pieces = _bpe_apply_py(word, merges)
    assert "".join(pieces) == word
    assert all(pieces)


@given(WORD, st.sets(st.text("abcd", min_size=1, max_size=3), max_size=12))
@settings(max_examples=200)
def test_wordpiece_greedy_invariants(word, extra):
    vocab = set("abcd") | {"##" + c for c in "abcd"} | extra
    out = _wp_apply_py(word, vocab, 3)
    if out == ["[UNK]"]:
        return  # only reachable when a needed continuation is missing
    # lossless: stripping ## markers reconstructs the word
    assert "".join(p[2:] if p.startswith("##") else p for p in out) == word
    # greedy: each piece is the LONGEST vocab match at its position
    pos = 0
    for p in out:
        raw = p[2:] if p.startswith("##") else p
        for l in range(3, len(raw), -1):
            cand = word[pos : pos + l]
            cand = cand if pos == 0 else "##" + cand
            assert cand not in vocab or len(cand.replace("##", "", 1)) <= len(raw)
        pos += len(raw)
    # marker discipline: first piece plain, the rest ##-marked
    assert not out[0].startswith("##")
    assert all(p.startswith("##") for p in out[1:])


@given(WORD, st.dictionaries(st.text("abcd", min_size=2, max_size=3),
                             st.integers(-9_000_000, -1_000_000), max_size=8))
@settings(max_examples=200)
def test_unigram_viterbi_optimality(word, multis):
    pieces = {c: -3_000_000 for c in "abcd"}
    pieces.update(multis)
    got = _viterbi_py(word, pieces, 3)
    assert got is not None  # chars cover everything
    q, _, path = got
    assert "".join(path) == word
    assert q == sum(pieces[p] for p in path)
    # optimality vs brute force over all segmentations (words are short)
    def all_segs(w):
        if not w:
            yield []
            return
        for l in range(1, min(3, len(w)) + 1):
            if w[:l] in pieces:
                for rest in all_segs(w[l:]):
                    yield [w[:l]] + rest

    best = max(sum(pieces[p] for p in s) for s in all_segs(word))
    assert q == best
