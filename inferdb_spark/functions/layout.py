"""Data-layout keys: Z-order (Morton) interleaving for multi-dimensional
data skipping.

Sorting/partitioning output files by a Morton key clusters rows that are
close in BOTH dimensions into the same parquet row groups, so min/max
column statistics prune 2-D range predicates (the open-table-format
Z-ORDER feature, expressed as a plain column + sortWithinPartitions — no
table format required).  The reference has no layout operators at all
(Postgres heap + spgist, src/transpiler.py:1039-1052); this is part of
the 100 TB path where scan pruning IS the query optimizer.

Both engines compute the key from the same Python-generated bit
arithmetic, so the DuckDB oracle checks it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low `bits` of two non-negative int columns:
    result bit 2i = bit i of x, bit 2i+1 = bit i of y."""
    xm = x.cast("long") % (1 << bits)
    ym = y.cast("long") % (1 << bits)
    e = F.lit(0).cast("long")
    for i in range(bits):
        e = e + F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        e = e + F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return e


def duckdb_morton_sql(x_expr: str, y_expr: str, bits: int = 10) -> str:
    """DuckDB SQL computing the identical Morton key."""
    xm = f"(CAST({x_expr} AS BIGINT) % {1 << bits})"
    ym = f"(CAST({y_expr} AS BIGINT) % {1 << bits})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({ym} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"
