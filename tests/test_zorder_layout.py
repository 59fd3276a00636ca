"""Z-order layout writer: correctness (same rows back) plus a DIRECT
measurement of the clustering effect from parquet row-group statistics
(via pyarrow) — each row group must cover a small rectangle of the
(x, y) plane, and a 2-D range predicate must overlap only a minority of
row groups (that overlap fraction IS the scan fraction a stats-pruning
reader pays)."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.scale import write_zordered


def _row_group_rects(path: str, x: str, y: str):
    rects = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            sx = g.column(idx[x]).statistics
            sy = g.column(idx[y]).statistics
            rects.append((sx.min, sx.max, sy.min, sy.max))
    return rects


def test_zorder_layout_clusters_and_prunes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("x"),
        F.col("l_suppkey").cast("long").alias("y"),
        "l_orderkey",
        "l_extendedprice",
    )
    n_rows = li.count()
    out = f"/tmp/inferdb_zorder_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)

    clustered = write_zordered(li, out, "x", "y", bits=10, n_files=8)
    assert clustered.count() == n_rows  # nothing lost or duplicated
    assert clustered.agg(F.sum("l_orderkey")).collect()[0][0] == li.agg(
        F.sum("l_orderkey")
    ).collect()[0][0]

    rects = _row_group_rects(out, "x", "y")
    assert len(rects) >= 8
    gx_min = min(r[0] for r in rects)
    gx_max = max(r[1] for r in rects)
    gy_min = min(r[2] for r in rects)
    gy_max = max(r[3] for r in rects)
    # Morton interleaving works on the low `bits` of the key; the id
    # domains here fit in 10 bits, so every row group should cover a
    # SMALL rectangle: mean row-group area well under the global area.
    global_area = (gx_max - gx_min + 1) * (gy_max - gy_min + 1)
    areas = [(r[1] - r[0] + 1) * (r[3] - r[2] + 1) for r in rects]
    assert sum(areas) / len(areas) < 0.35 * global_area

    # a ~6% 2-D range predicate must overlap only a minority of row
    # groups (the scan fraction a min/max-pruning reader pays)
    qx = (gx_min, gx_min + (gx_max - gx_min) // 4)
    qy = (gy_min, gy_min + (gy_max - gy_min) // 4)
    overlapping = sum(
        1
        for r in rects
        if not (r[1] < qx[0] or r[0] > qx[1] or r[3] < qy[0] or r[2] > qy[1])
    )
    assert overlapping / len(rects) < 0.5

    # and the clustered copy answers the range query identically
    pred = (
        (F.col("x") >= qx[0]) & (F.col("x") <= qx[1])
        & (F.col("y") >= qy[0]) & (F.col("y") <= qy[1])
    )
    assert clustered.filter(pred).count() == li.filter(pred).count()

    shutil.rmtree(out, ignore_errors=True)
