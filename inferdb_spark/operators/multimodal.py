"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schemas, partition-aware batch processing,
Arrow-batched UDF signatures, frame-sampling dataflow — is real and tested.
The actual media DECODING is stubbed: the image/audio libraries are not in
this container, so `decode_image`/`decode_audio` raise NotImplementedError
unless `fake=True`, which substitutes a deterministic structural fake
(derived from the bytes) so the pipeline shape can be exercised end-to-end.

At 100 TB the design rules encoded here:
- media bytes travel ONCE through any plan stage (binary columns are
  opaque to Catalyst; never groupBy/join on them — join on content_id);
- decode/feature-extract runs in mapInPandas with explicit batch-size
  control (`spark.sql.execution.arrow.maxRecordsPerBatch`) so a batch of
  large blobs cannot OOM an executor;
- extracted features are small typed columns; downstream ops drop the
  binary column as early as possible (column pruning does this for free
  when the projection is explicit).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = "content_id long, n_bytes long, mean_byte double, feat array<double>"


def synthesize_media_table(spark, n: int = 64, media_type: str = "image") -> DataFrame:
    """Deterministic fake media rows for tests (payload = structured bytes)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j * 13) % 256 for j in range(128 + (i % 5) * 32))
        rows.append(
            (
                i,
                media_type,
                payload,
                (64 + i % 8, 48 + i % 6, 16000, 1000 + i, "raw"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 structural statistics of
    the byte stream.  Clearly NOT a real image/audio decode."""
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    n = len(payload)
    chunks = [payload[i * n // 8 : (i + 1) * n // 8] for i in range(8)]
    return [sum(c) / (len(c) * 255.0) if c else 0.0 for c in chunks]


def extract_image_features(
    df: DataFrame, fake: bool = False, batch_size_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    Real decode path is STUBBED (no PIL/opencv in this container):
    fake=False raises NotImplementedError from the executors; fake=True runs
    the deterministic structural fake through the identical dataflow.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv (not in this image); "
                    "pass fake=True to exercise the pipeline with the "
                    "deterministic structural fake"
                )
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "mean_byte": [
                        (sum(p) / len(p)) if p else 0.0 for p in pdf["payload"]
                    ],
                    "feat": feats,
                }
            )

    out = df.select("content_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )
    return out


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Frame-sampling dataflow: one input row -> N frame rows (flatMap
    shape).  Decode stubbed as above; the fake emits frame indices computed
    from metadata only."""
    import pandas as pd

    schema = "content_id long, frame_idx int, ts_ms long, frame_feat array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real video decode requires ffmpeg bindings (not in this "
                    "image); pass fake=True"
                )
            out_rows = {"content_id": [], "frame_idx": [], "ts_ms": [], "frame_feat": []}
            for cid, dur, payload in zip(
                pdf["content_id"], pdf["duration_ms"], pdf["payload"]
            ):
                n_frames = max(1, int(dur) // every_ms)
                base = _fake_decode(payload)
                for k in range(n_frames):
                    out_rows["content_id"].append(cid)
                    out_rows["frame_idx"].append(k)
                    out_rows["ts_ms"].append(k * every_ms)
                    out_rows["frame_feat"].append([x * (k + 1) for x in base])
            yield pd.DataFrame(out_rows)

    flat = df.select(
        "content_id", F.col("meta.duration_ms").alias("duration_ms"), "payload"
    )
    return flat.mapInPandas(run, schema=schema)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize dataflow: binary in -> binary out + updated metadata.  Decode/
    re-encode stubbed; the fake truncates/pads bytes deterministically."""
    import pandas as pd

    schema = "content_id long, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height // 64
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL (not in this image); pass fake=True"
                )
            resized = [
                (p[:target] + bytes(max(0, target - len(p)))) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"],
                    "payload": resized,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select("content_id", "payload").mapInPandas(run, schema=schema)
