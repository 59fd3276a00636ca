"""Table loaders for the synthetic star schema (TESTDATA.md).

All reads go through `spark.read.parquet` so Catalyst gets predicate
pushdown / column pruning for free.  The one normalization: `events.ts` is
stored as parquet TIMESTAMP(NANOS), which Spark's reader only accepts as a
raw long (`spark.sql.legacy.parquet.nanosAsLong`) — we convert to a proper
TimestampType (microsecond) column at load so downstream operators see a
normal timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos-since-epoch long -> TimestampType (truncate to micros,
            # the same instant DuckDB reports for TIMESTAMP_NS at micro
            # precision)
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        elif ts_type == "timestamp_ntz":
            # parquet timestamp[us] with isAdjustedToUTC=false reads as
            # TIMESTAMP_NTZ; watermarks and unix_micros need TimestampType.
            # Session timezone is pinned to UTC (session.py), so the cast
            # keeps the same instant DuckDB sees for the naive timestamp.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
