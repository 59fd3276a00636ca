"""Deterministic sharded export for training-data releases.

A pretraining corpus ships as a fixed set of shards (WebDataset /
Megatron-style: consumers address `shard-00042`), so the writer must be
(a) deterministic — shard membership a pure function of the row, stable
under retries, repartitioning, and re-runs — and (b) auditable — a
manifest row per shard with counts and an order-independent content
checksum, so a re-run (or the consumer) can verify integrity without
re-reading everything.  The reference has no export surface (it emits
SQL strings); this is beyond-reference pipeline completion.

Spark-first: shard id is the repo's portable 52-bit md5-prefix hash
(functions/hashing.h52 — identical in DuckDB, so the manifest is
oracle-checkable) mod n_shards; the manifest is ONE aggregation; the
writer is a hash-repartition + partitionBy parquet write, which scales
to any corpus (each executor writes only its shard slice, no global
sort, no driver traffic).

Checksum: bit_xor of per-doc h52(text) — commutative/associative (so
partition- and retry-order-independent) and overflow-free at any row
count, the classic content-fingerprint aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inferdb_spark.functions.hashing import h52


def shard_assign(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): h52(id) % n_shards — a
    pure projection, identical under any partitioning or engine."""
    return (h52(id_col.cast("string")) % F.lit(int(n_shards))).cast("int")


def sharded_export_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """(shard_id, n_docs, n_tokens, checksum): the release manifest.
    One map-side-combinable aggregation; every column is exact-integer
    (counts, token counts, XOR fingerprint), so the manifest replays
    bit-identically cross-engine and across retries."""
    from inferdb_spark.functions.text import token_count

    return (
        df.select(
            shard_assign(F.col(id_col), n_shards).alias("shard_id"),
            token_count(F.col(text_col)).cast("long").alias("_tok"),
            h52(F.col(text_col)).alias("_h"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("n_tokens"),
            F.expr("bit_xor(_h)").cast("long").alias("checksum"),
        )
    )


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Write `df` as `path/shard_id=K/` parquet, one directory per shard,
    and return the manifest relation for the written rows.  The
    repartition keys on shard_id, so each output task owns whole shards
    (no small-file explosion: files-per-shard = 1 at any scale unless a
    shard exceeds executor memory, in which case raise n_shards — the
    shard count, not the corpus, is the knob)."""
    out = df.withColumn("shard_id", shard_assign(F.col(id_col), n_shards))
    out.repartition(int(n_shards), F.col("shard_id")).write.partitionBy(
        "shard_id"
    ).mode("overwrite").parquet(path)
    return sharded_export_manifest(df, id_col=id_col, n_shards=n_shards)
