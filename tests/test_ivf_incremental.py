import shutil
import tempfile

from pyspark.sql import functions as F

from inferdb_spark.operators.binning import BinSpec
from inferdb_spark.operators.index import build_index
from inferdb_spark.operators.similarity import (
    cosine_topk,
    fit_ivf_centroids,
    ivf_build,
    ivf_search,
)
from inferdb_spark.streaming.index_maintenance import run_incremental_kv


def _embeddings(spark, n=300, dim=8):
    # three well-separated clusters along different axes
    rows = []
    for i in range(n):
        c = i % 3
        base = [0.05 * ((i * 7 + j) % 5) for j in range(dim)]
        base[c] += 10.0
        rows.append((i, [float(x) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_recall_on_clustered_data(spark):
    df = _embeddings(spark)
    cents = fit_ivf_centroids(df, "embedding", n_lists=3)
    assert len(cents) == 3
    indexed = ivf_build(df, "embedding", cents).cache()
    # lists should be balanced (one per cluster)
    sizes = sorted(r["count"] for r in indexed.groupBy("list_id").count().collect())
    assert sizes == [100, 100, 100]
    q = [0.0] * 8
    q[1] = 10.0  # query inside cluster 1
    exact = [r.vec_id for r in cosine_topk(df, "embedding", q, k=10).collect()]
    approx = [
        r.vec_id
        for r in ivf_search(indexed, "embedding", cents, q, k=10, n_probe=1).collect()
    ]
    assert approx == exact  # single probe suffices on separated clusters


def test_ivf_more_probes_superset(spark):
    df = _embeddings(spark)
    cents = fit_ivf_centroids(df, "embedding", n_lists=3)
    indexed = ivf_build(df, "embedding", cents).cache()
    q = [5.0] * 8  # between clusters
    r1 = {r.vec_id for r in ivf_search(indexed, "embedding", cents, q, k=5, n_probe=1).collect()}
    r3 = [r.vec_id for r in ivf_search(indexed, "embedding", cents, q, k=5, n_probe=3).collect()]
    exact = [r.vec_id for r in cosine_topk(df, "embedding", q, k=5).collect()]
    assert r3 == exact  # probing all lists == exact
    assert len(r1) == 5


def test_incremental_kv_matches_batch_rebuild(spark):
    rows = [(float(i % 40), float((i * 3) % 200), float(i % 97)) for i in range(2000)]
    df = spark.createDataFrame(rows, "x double, z double, y double")
    specs = [
        BinSpec(column="x", splits=[10.0, 20.0, 30.0]),
        BinSpec(column="z", splits=[50.0, 100.0, 150.0]),
    ]
    tmp = tempfile.mkdtemp(prefix="inc_kv_")
    try:
        df.repartition(5).write.mode("overwrite").parquet(tmp)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        run_incremental_kv(stream, specs, "y", "inc_kv_out")
        streamed = {
            r.key: (r.s, r.c, r.value)
            for r in spark.sql("select * from inc_kv_out").collect()
        }
        batch_idx = build_index(df, specs, "y", task="regression")
        batch = {r.key: r.value for r in batch_idx.kv.collect()}
        assert set(streamed) == set(batch)
        for k, v in batch.items():
            assert streamed[k][2] == v  # bit-identical: integer-valued sums
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
