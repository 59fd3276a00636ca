"""inferdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hpides/inferdb (VLDB'24), rebuilt
Spark-first.

The reference system trains an sklearn pipeline, replaces the model with a
learned key→value index (target-aware binning + IV feature selection +
prefix-fallback lookup), and transpiles both the index and classic model
pipelines into PostgreSQL SQL.  This package re-expresses every one of those
capabilities as lazy DataFrame → DataFrame operators so Catalyst/Tungsten
own the physical plan: binning is a vectorized expression, the SP-GiST index
probe becomes a broadcast hash join, and the per-row plpgsql prefix-search
loop becomes build-time prefix aggregates + a coalesce chain of broadcast
joins (see operators/index.py, operators/scoring.py).

Beyond reference parity, `operators/{dedup,similarity,textprep,multimodal}`
add the data-prep operators a large-scale training-data pipeline needs.
"""

from inferdb_spark.session import get_spark
from inferdb_spark.catalog import load_table, load_tables, register_views


def __getattr__(name):
    # lazy re-exports of the high-level API (keeps bare import cheap)
    if name in ("fit_index_pipeline", "standalone_report", "IndexPipeline"):
        from inferdb_spark import api

        return getattr(api, name)
    if name in ("build_index", "KVIndex", "save_index", "load_index"):
        from inferdb_spark.operators import index

        return getattr(index, name)
    if name == "index_score":
        from inferdb_spark.operators.scoring import index_score

        return index_score
    if name == "dedup_corpus":
        from inferdb_spark.operators.dedup import dedup_corpus

        return dedup_corpus
    if name in ("average_precision", "youden_threshold", "binary_auc"):
        from inferdb_spark.operators import metrics

        return getattr(metrics, name)
    if name == "skyline_2d":
        from inferdb_spark.operators.skyline import skyline_2d

        return skyline_2d
    if name in ("k_core", "connected_components", "pagerank_integer"):
        from inferdb_spark.operators import graph

        return getattr(graph, name)
    if name in ("profile_columns", "fd_violation_g3", "inclusion_coverage"):
        from inferdb_spark.operators import validate

        return getattr(validate, name)
    raise AttributeError(name)


__all__ = [
    "get_spark", "load_table", "load_tables", "register_views",
    "fit_index_pipeline", "standalone_report", "IndexPipeline",
    "build_index", "KVIndex", "save_index", "load_index", "index_score",
    "dedup_corpus",
    "average_precision", "youden_threshold", "binary_auc", "skyline_2d",
    "k_core", "connected_components", "pagerank_integer",
    "profile_columns", "fd_violation_g3", "inclusion_coverage",
]
__version__ = "0.1.0"
