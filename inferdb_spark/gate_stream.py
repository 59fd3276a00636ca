"""Gate queries: Structured Streaming operators, validated against batch
semantics.

A streaming query over a FINITE source run to completion must produce the
same result as the equivalent batch query — that equivalence is exactly
what the DuckDB oracle checks: the Spark side really executes a streaming
query (readStream → window agg → memory sink); the oracle is plain
GROUP BY time_bucket over the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate

_counter = 0


@gate(
    "stream_windowed_agg",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling-window aggregation executed as a REAL
    streaming query (file source, complete mode, run to completion), then
    compared against the batch GROUP BY — the streaming-equals-batch
    contract."""
    import hashlib
    import os

    global _counter
    _counter += 1
    name = f"gate_stream_out_{_counter}"
    ev = load_table(spark, sf_dir, "events")
    # the file stream source needs a DIRECTORY; stage the (ts-normalized)
    # events into /tmp once per sf_dir
    stage = os.path.join(
        "/tmp", "inferdb_stream_stage_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    marker = os.path.join(stage, "_SUCCESS")
    if not os.path.exists(marker):
        ev.repartition(4).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql(f"select * from {name}")
    return out.select(
        (F.unix_timestamp(F.col("window.start")) / 3600).cast("long").alias("hour_bucket"),
        "event_type",
        F.col("n"),
        F.col("cents"),
    )
