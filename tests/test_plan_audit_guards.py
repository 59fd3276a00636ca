"""Regression guards for tools/plan_audit.py's check lambdas.

A plan regression must print FAIL, never crash the audit with
ValueError — so every substring-position comparison has to use
find/rfind (which return -1 and make the check falsy) or guard the
index() literal with an `in p` test inside the same lambda (the
round-8/round-9 ADVICE pattern; two sites were fixed each round).
"""

from __future__ import annotations

import re


def _source() -> str:
    with open("tools/plan_audit.py") as fh:
        return fh.read()


def test_no_rindex_anywhere():
    # rindex raises on a missing substring; rfind degrades to -1 -> FAIL
    assert ".rindex(" not in _source()


def test_every_index_literal_is_guarded():
    """Each `p.index("LIT")` must appear in a lambda that also tests
    `"LIT" in p` (or sits behind a trailing conditional doing so)."""
    src = _source()
    # lambdas are single logical expressions; approximate their span as
    # the lambda line plus continuation lines up to the closing `),`
    for m in re.finditer(r'p\.index\("([^"]+)"\)', src):
        lit = m.group(1)
        window = src[max(0, m.start() - 500): m.start() + 500]
        assert f'"{lit}" in p' in window, (
            f'p.index("{lit}") has no `"{lit}" in p` guard nearby — a '
            "regressed plan would crash the audit with ValueError"
        )


def test_degenerate_plan_fails_not_crashes():
    """The two previously-unguarded shapes, evaluated on plans missing
    the second substring: must be falsy, not raise."""
    # large_volume_orders shape (plan_audit.py:114)
    check = (
        lambda p: p.index("Filter (qty") < p.find("Join ")
        if "Filter (qty" in p else ("HashAggregate" in p)
    )
    assert check("Filter (qty ...) no join here") is False
    # page_hinkley shape (plan_audit.py:414)
    check2 = (
        lambda p: "Window" in p and p.rfind("HashAggregate") > p.index("Window")
    )
    assert check2("Window only, aggregate regressed away") is False
