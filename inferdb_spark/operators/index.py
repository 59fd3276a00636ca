"""The learned key→value index, Spark-native.

Reference design: kv table (key TEXT, value NUMERIC) + SP-GiST index probed
per row, with a plpgsql loop that repeatedly truncates the key and rescans
on a miss (src/transpiler.py:1004-1099, sql_scripts/prefix_search.sql).

Spark redesign (SURVEY.md §4): the kv relation is small (≤ #distinct bin
paths), so the probe is a broadcast hash join, and the per-row fallback
loop is replaced by BUILD-TIME prefix aggregates — for every prefix length
L we precompute the aggregated value over keys sharing that prefix, and
scoring coalesces down the chain.  No per-row control flow, no custom
Catalyst rule, embarrassingly parallel, and the scan side is touched
exactly once.

Fallback semantics follow the reference TRIE (component-wise prefixes,
aggregate over the values of keys under the node — src/inference_trie.py:
84-98), not prefix_search.sql's truncate-2-chars loop, which mis-handles
bin ids ≥ 10 (SURVEY.md §7 known-hard 1 documents the reference bug).

Two aggregation modes for prefix values:
- "keys" (default, reference parity): unweighted over distinct keys' values
  (what Trie.query DFS and prefix_search's avg-over-kv-rows both compute);
- "rows": weighted by training-row counts (exact integer arithmetic end to
  end — used by the correctness-gate queries because it is reproducible
  bit-for-bit by any engine).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.operators.binning import BinSpec, apply_bins, key_expr

BIN_SUFFIX = "_bin"


def _mode_value(df: DataFrame, group_cols: list[str], value: str = "value") -> DataFrame:
    """Majority vote with lowest-value tiebreak (deterministic analog of the
    reference's pandas idxmax first-occurrence, src/transpiler.py:986-992 —
    SURVEY.md §7 known-hard 4)."""
    counted = df.groupBy(*group_cols, value).agg(F.count("*").alias("cnt"))
    return counted.groupBy(*group_cols).agg(
        F.max_by(F.col(value), F.struct(F.col("cnt"), -F.col(value))).alias(value)
    )


@dataclass
class KVIndex:
    """Built index artifacts: all small DataFrames, broadcast at score time."""

    specs: list[BinSpec]
    task: str  # "regression" | "classification"
    kv: DataFrame  # (key, value)
    prefix_aggs: dict[int, DataFrame] = field(default_factory=dict)  # L -> (prefix_L, value)
    global_value: float = 0.0

    @property
    def depth(self) -> int:
        return len(self.specs)


def build_index(
    train: DataFrame,
    specs: list[BinSpec],
    target: str,
    task: str = "regression",
    agg_mode: str = "keys",
) -> KVIndex:
    """kv build = one groupBy over the encoded training rows
    (src/transpiler.py:986-996: mean for regression, majority for
    classification), plus one tiny groupBy per prefix length.

    The encoded frame is aggregated once into per-key stats; prefix
    aggregates derive from that small result, never rescanning the base
    table — at 100 TB the base data is read exactly once.
    """
    k = len(specs)
    enc = apply_bins(train, specs, BIN_SUFFIX)
    bin_cols = [s.column + BIN_SUFFIX for s in specs]
    y = F.col(target).cast("double")

    if task == "regression":
        # count(y), not count(*): null targets must not dilute the mean
        # (pandas .mean() semantics, src/transpiler.py:993-996)
        per_key = enc.groupBy(*bin_cols).agg(
            F.sum(y).alias("s"), F.count(y).alias("c")
        )
        per_key.cache()
        kv = per_key.select(
            key_expr(specs, BIN_SUFFIX).alias("key"),
            (F.col("s") / F.col("c")).alias("value"),
        )
        prefix_aggs: dict[int, DataFrame] = {}
        for L in range(1, k):
            pcols = bin_cols[:L]
            pkey = F.concat_ws(".", *[F.col(c).cast("string") for c in pcols])
            if agg_mode == "rows":
                agg = per_key.groupBy(*pcols).agg(
                    (F.sum("s") / F.sum("c")).alias("value")
                )
            else:  # unweighted over keys (trie semantics)
                agg = per_key.groupBy(*pcols).agg(
                    F.avg(F.col("s") / F.col("c")).alias("value")
                )
            prefix_aggs[L] = agg.select(pkey.alias(f"prefix_{L}"), "value")
        if agg_mode == "rows":
            g = per_key.agg((F.sum("s") / F.sum("c")).alias("g")).first()["g"]
        else:
            g = per_key.agg(F.avg(F.col("s") / F.col("c")).alias("g")).first()["g"]
    else:
        per_key_cls = enc.groupBy(*bin_cols, y.cast("long").alias("value")).agg(
            F.count("*").alias("cnt")
        )
        per_key_cls.cache()
        # majority per key, lowest-class tiebreak
        kv_bins = per_key_cls.groupBy(*bin_cols).agg(
            F.max_by(F.col("value"), F.struct(F.col("cnt"), -F.col("value"))).alias(
                "value"
            )
        )
        kv = kv_bins.select(
            key_expr(specs, BIN_SUFFIX).alias("key"),
            F.col("value").cast("double").alias("value"),
        )
        prefix_aggs = {}
        for L in range(1, k):
            pcols = bin_cols[:L]
            pkey = F.concat_ws(".", *[F.col(c).cast("string") for c in pcols])
            if agg_mode == "rows":
                src = per_key_cls.groupBy(*pcols, "value").agg(
                    F.sum("cnt").alias("cnt")
                )
            else:  # majority over per-key majority values (trie semantics)
                src = kv_bins.groupBy(*pcols, "value").agg(F.count("*").alias("cnt"))
            agg = src.groupBy(*pcols).agg(
                F.max_by(F.col("value"), F.struct(F.col("cnt"), -F.col("value"))).alias(
                    "value"
                )
            )
            prefix_aggs[L] = agg.select(
                pkey.alias(f"prefix_{L}"), F.col("value").cast("double").alias("value")
            )
        if agg_mode == "rows":
            counts = per_key_cls.groupBy("value").agg(F.sum("cnt").alias("cnt"))
        else:
            counts = kv_bins.groupBy("value").agg(F.count("*").alias("cnt"))
        g = counts.select(
            F.max_by(F.col("value"), F.struct(F.col("cnt"), -F.col("value")))
        ).first()[0]

    return KVIndex(
        specs=specs,
        task=task,
        kv=kv,
        prefix_aggs=prefix_aggs,
        global_value=float(g) if g is not None else 0.0,
    )


def save_index(index: KVIndex, path: str) -> dict:
    """Persist the index artifacts (S5 model-artifact sink analog,
    src/transpiler.py:2244-2250: joblib dump + size measurement).

    Layout: <path>/spec.json (bin specs + task + global), <path>/kv/ and
    <path>/prefix_L/ parquet.  Returns {'bytes': total_on_disk} — the
    rebuild's `pg_total_relation_size` equivalent.
    """
    import json
    import os
    from dataclasses import asdict

    os.makedirs(path, exist_ok=True)
    spec = {
        "task": index.task,
        "global_value": index.global_value,
        "specs": [asdict(s) for s in index.specs],
        "prefix_lengths": sorted(index.prefix_aggs),
    }
    with open(os.path.join(path, "spec.json"), "w") as f:
        json.dump(spec, f)
    index.kv.write.mode("overwrite").parquet(os.path.join(path, "kv"))
    for L, df in index.prefix_aggs.items():
        df.write.mode("overwrite").parquet(os.path.join(path, f"prefix_{L}"))
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, fn)) for fn in files)
    return {"bytes": total}


def load_index(spark: SparkSession, path: str) -> KVIndex:
    import json
    import os

    with open(os.path.join(path, "spec.json")) as f:
        spec = json.load(f)
    specs = [BinSpec(**s) for s in spec["specs"]]
    kv = spark.read.parquet(os.path.join(path, "kv"))
    prefix_aggs = {
        L: spark.read.parquet(os.path.join(path, f"prefix_{L}"))
        for L in spec["prefix_lengths"]
    }
    return KVIndex(
        specs=specs,
        task=spec["task"],
        kv=kv,
        prefix_aggs=prefix_aggs,
        global_value=spec["global_value"],
    )


def unseen_paths(index: KVIndex) -> DataFrame:
    """All bin-id combinations NOT present in the kv relation — the
    reference's populate_paths set difference (src/transpiler.py:930-938,
    J10/U1): cross join of the tiny per-feature bin domains, then an
    anti join against the stored keys."""
    spark = index.kv.sparkSession
    domain = None
    for i, s in enumerate(index.specs):
        d = spark.createDataFrame([(b,) for b in range(s.n_bins)], f"b{i} int")
        domain = d if domain is None else domain.crossJoin(d)
    all_keys = domain.select(
        F.concat_ws(".", *[F.col(f"b{i}").cast("string") for i in range(len(index.specs))]).alias("key")
    )
    return all_keys.join(index.kv.select("key"), "key", "left_anti")


def index_size_info(index: KVIndex, spark: SparkSession) -> dict:
    """Stored paths / possible paths / filling degree
    (src/optimizer.py:225-231, 268-276)."""
    stored = index.kv.count()
    possible = 1
    for s in index.specs:
        possible *= s.n_bins
    return {
        "stored_paths": stored,
        "possible_paths": possible,
        "filling_degree": stored / possible if possible else 0.0,
    }
