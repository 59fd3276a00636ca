"""Isotonic (PAV) probability calibration as a relational operator.

The reference's model-quality loop stops at raw model scores (metrics in
src/transpiler.py's scoring paths); production classifiers additionally
need CALIBRATED probabilities.  Isotonic regression is the classic
in-database-friendly calibrator: bin the score, pool adjacent violators
(PAV), emit a monotone step function.

UNIFICATION — the repo ships TWO fits of the SAME isotonic model; both
are the unique L2 projection onto the monotone cone, so their fitted
values are IDENTICAL (cross-checked by
tests/test_calibration.py::test_pav_replay_equals_relational_minimax):

| | calibrate.py (this module) | calibration.py |
|---|---|---|
| algorithm | stack PAV on the driver over the ≤n_bins bin summary | minimax iso[i] = max_{j≤i} min_{k≥i} pooled-mean — B³ join over bins |
| driver traffic | one n_bins-row collect (kmeans-Lloyd bounded pattern) | ZERO — fully relational |
| arithmetic | exact BIGINT cross-multiply; one division at output | double prefix sums over windows |
| oracle | full-fit CTE replay (pav_oracle_sql) → gate:isotonic_pav_replay | minimax SQL → gate:isotonic_calibration |
| pick when | trainer-replay gates; bit-exact integer fit; tiny B | fit must compose inside a larger SQL plan with no driver round-trip |
| cost in B | O(B) driver, broadcast step join back | O(B³) rows of tiny aggregates (B ≤ ~100 after pre-binning) |

Both run their data-sized work as ONE map-side-combined groupBy to the
bin relation; neither touches row-scale data after that.

Scale shape (the 100 TB question): the data-sized work is ONE groupBy to a
fixed number of score bins (map-side combined, n_bins rows out); PAV runs
on that n_bins-row summary — driver-side here (the kmeans-Lloyd bounded
`.collect()` pattern: volume independent of row count), and the fitted
step function goes back as a broadcast join.  Nothing row-scale ever
leaves the executors.

Determinism engineering (gate.py cookbook):
- scores are integer-quantized cents; the bin index is exact integer
  arithmetic through one safe double division (numerator ≤ 2^53,
  quotient < n_bins, never within an ulp of an integer unless exact);
- PAV pooling compares block means by BIGINT cross-multiply
  (y1*n2 > y2*n1) — no float anywhere in the fit;
- the fitted value y_block/n_block is divided AT OUTPUT TIME in each
  engine (one IEEE division, 6dp-rounded), never shipped as a float.

The PAV solution vector is unique (strictly convex L2 projection onto the
monotone cone), so the driver's stack algorithm and the oracle's
iterated leftmost-merge replay converge to identical fitted values even
when tie merges differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_counts(
    df: DataFrame,
    cents_col,
    label_col,
    n_bins: int,
    mn: int,
    mx: int,
) -> DataFrame:
    """Per-bin (bin, n_b, y_b) relation over fixed-width integer bins of
    [mn, mx] — the only data-sized aggregation in the fit."""
    b = F.floor(
        ((cents_col - F.lit(mn)) * F.lit(n_bins)).cast("double")
        / F.lit(float(mx - mn + 1))
    ).cast("long")
    return (
        df.select(b.alias("bin"), label_col.cast("long").alias("y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("y").cast("long").alias("y_b"),
        )
    )


def pav_blocks(bins: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Pool-adjacent-violators over (bin, y_b, n_b) rows sorted by bin.
    Returns blocks as (lo_bin, y_sum, n_sum); violation test is the exact
    integer cross-multiply mean(prev) > mean(cur)."""
    blocks: list[list[int]] = []
    for bin_id, y, n in sorted(bins):
        cur = [int(bin_id), int(y), int(n)]
        while blocks and blocks[-1][1] * cur[2] > cur[1] * blocks[-1][2]:
            prev = blocks.pop()
            cur = [prev[0], prev[1] + cur[1], prev[2] + cur[2]]
        blocks.append(cur)
    return [tuple(b) for b in blocks]


def fit_isotonic(df_bins: DataFrame) -> DataFrame:
    """Fit PAV on a (bin, n_b, y_b) relation; returns the per-bin fitted
    relation (bin, n_b, y_b, block_y, block_n) via a broadcast range join
    of the ≤ n_bins block table back onto the bin relation."""
    spark = df_bins.sparkSession
    rows = [(r["bin"], r["y_b"], r["n_b"]) for r in df_bins.collect()]
    blocks = pav_blocks(rows)
    # hi bound per block = next block's lo - 1 (last block unbounded)
    bdata = []
    for i, (lo, by, bn) in enumerate(blocks):
        hi = blocks[i + 1][0] - 1 if i + 1 < len(blocks) else 1 << 62
        bdata.append((lo, hi, by, bn))
    bdf = spark.createDataFrame(
        bdata, "lo long, hi long, block_y long, block_n long"
    )
    return df_bins.join(
        F.broadcast(bdf),
        (F.col("bin") >= F.col("lo")) & (F.col("bin") <= F.col("hi")),
    ).select("bin", "n_b", "y_b", "block_y", "block_n")


def pav_oracle_sql(
    cents_sql: str,
    label_sql: str,
    n_bins: int,
    table: str = "lineitem",
) -> str:
    """DuckDB replay of the ENTIRE isotonic fit as a CTE chain: bin
    counts, then n_bins-1 unrolled rounds of leftmost-violator merge
    (each round: window to find successors, scalar min violator, merge) —
    the gbt_train_predict full-fit-replay standard applied to PAV."""
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each merge
    # round references its predecessor more than once — without
    # materialization the 31-round chain re-expands exponentially
    ctes = [
        f"cent AS MATERIALIZED (SELECT {cents_sql} AS cents, "
        f"CAST({label_sql} AS BIGINT) AS y FROM {table})",
        "mm AS MATERIALIZED (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM cent)",
        f"binrel AS MATERIALIZED (SELECT CAST(floor(CAST((cents - mn) * {n_bins} "
        "AS DOUBLE) / (mx - mn + 1)) AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n_b, CAST(SUM(y) AS BIGINT) AS y_b "
        "FROM cent CROSS JOIN mm GROUP BY 1)",
        "b0 AS MATERIALIZED (SELECT bin AS lo, y_b AS ysum, n_b AS nsum FROM binrel)",
    ]
    for k in range(n_bins - 1):
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT lo, ysum, nsum, "
            f"lead(lo) OVER w AS nlo, lead(ysum) OVER w AS ny, "
            f"lead(nsum) OVER w AS nn FROM b{k} WINDOW w AS (ORDER BY lo))"
        )
        ctes.append(
            f"m{k} AS MATERIALIZED (SELECT MIN(lo) AS m FROM s{k} "
            f"WHERE nlo IS NOT NULL AND ysum * nn > ny * nsum)"
        )
        ctes.append(
            f"b{k + 1} AS MATERIALIZED (SELECT s.lo, "
            f"CASE WHEN s.lo = m{k}.m THEN s.ysum + s.ny ELSE s.ysum END AS ysum, "
            f"CASE WHEN s.lo = m{k}.m THEN s.nsum + s.nn ELSE s.nsum END AS nsum "
            f"FROM s{k} s CROSS JOIN m{k} "
            f"WHERE m{k}.m IS NULL OR s.lo IS DISTINCT FROM "
            f"(SELECT s2.nlo FROM s{k} s2 WHERE s2.lo = m{k}.m))"
        )
    final = f"b{n_bins - 1}"
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT br.bin, br.n_b, br.y_b, "
        f"CAST(round(CAST(f.ysum AS DOUBLE) / f.nsum, 6) AS DOUBLE) AS calib6 "
        f"FROM binrel br JOIN {final} f ON f.lo = "
        f"(SELECT MAX(lo) FROM {final} WHERE lo <= br.bin) "
        f"ORDER BY br.bin"
    )
