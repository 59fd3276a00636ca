"""Stream == batch twin for the Jensen-Shannon drift monitor: the
streaming job's final 1-row summary must equal gate:js_divergence_drift
bit-for-bit (same bin grid, same nano-quantized term SQL), with the
reference histogram passed in as training-time literals — the form a
production drift monitor deploys."""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate_r7g import _JS_BIN, _JS_SPLIT, q_js_divergence_drift
from inferdb_spark.streaming.scoring_stream import js_drift_stream


def _stage_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    stage = os.path.join(
        "/tmp",
        "inferdb_stream_li_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        li.repartition(5).write.mode("overwrite").parquet(stage)
    return stage, li.schema


def test_js_drift_stream_equals_batch(spark, sf_dir):
    batch = q_js_divergence_drift(spark, sf_dir).collect()[0]

    # training-time reference: the pre-split era's bin histogram,
    # computed once batch-side and passed to the monitor as literals
    li = load_table(spark, sf_dir, "lineitem")
    ref_bins = {
        r["bin"]: r["cnt"]
        for r in li.filter(F.expr(f"l_shipdate < {_JS_SPLIT}"))
        .selectExpr(f"{_JS_BIN} AS bin")
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert sum(ref_bins.values()) == batch["n_ref"]

    stage, schema = _stage_lineitem(spark, sf_dir)
    run_dir = f"/tmp/inferdb_stream_jsd_{os.getpid()}"
    shutil.rmtree(run_dir, ignore_errors=True)
    out, ckpt = os.path.join(run_dir, "out"), os.path.join(run_dir, "ckpt")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple microbatches
        .parquet(stage)
    )
    q = js_drift_stream(
        stream,
        out,
        ckpt,
        ref_bins=ref_bins,
        bin_expr=_JS_BIN,
        filter_expr=f"l_shipdate >= {_JS_SPLIT}",
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out).collect()[0]
    assert got["jsd"] == batch["jsd"]
    assert got["n_ref"] == batch["n_ref"]
    assert got["n_cur"] == batch["n_cur"]
    assert got["n_bins"] == batch["n_bins"]
