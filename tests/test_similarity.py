

def test_sq8_codes_bounded_and_rank_matches_float(spark):
    """SQ8 codes stay in [-127,127]; on well-separated vectors the
    quantized ranking equals exact float dot-product ranking; a constant
    (zero-scale) dimension contributes nothing."""
    import numpy as np
    import pandas as pd

    from inferdb_spark.operators.similarity import (
        fit_sq8_scales,
        sq8_quantize_col,
        sq8_quantize_query,
        sq8_topk,
    )
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(40, 8)).astype(np.float32)
    vecs[:, 3] = 0.25  # constant dim -> scale fits but carries no rank info
    # separate the dots so int8 rounding cannot reorder neighbors
    vecs[:10] *= 0.1
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(40), "embedding": [v.tolist() for v in vecs]}
        )
    )
    scales = fit_sq8_scales(df, "embedding")
    assert len(scales) == 8 and all(s >= 0 for s in scales)
    codes = df.select(
        sq8_quantize_col(F.col("embedding"), scales).alias("q")
    ).collect()
    flat = [c for r in codes for c in r["q"]]
    assert max(flat) <= 127 and min(flat) >= -127

    query = [0.9, -0.5, 0.3, 0.25, -0.8, 0.1, 0.7, -0.2]
    got = [r["vec_id"] for r in sq8_topk(df, "embedding", scales, query, k=5).collect()]
    # exact parity vs a numpy twin of the SAME quantization (determinism)
    import math

    qmat = np.array(
        [
            [
                int(math.floor(float(x) / s * 127.0 + 0.5)) if s > 0 else 0
                for x, s in zip(v, scales)
            ]
            for v in vecs.astype(np.float64)
        ]
    )
    qq = np.array(sq8_quantize_query(query, scales))
    dots = qmat @ qq
    twin = sorted(range(40), key=lambda i: (-dots[i], i))[:5]
    assert got == twin
    # recall sanity vs exact float ranking: top-5 sets nearly agree
    exact = list(np.argsort(-(vecs.astype(np.float64) @ np.array(query)))[:5])
    assert len(set(got) & set(exact)) >= 4 and got[0] == exact[0]

    # zero-scale dim: quantizing a constant-0 column yields code 0
    z = np.zeros((3, 8), dtype=np.float32)
    zdf = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(3), "embedding": [v.tolist() for v in z]})
    )
    zs = fit_sq8_scales(zdf, "embedding")
    assert all(s == 0.0 for s in zs)
    assert sq8_quantize_query(query, zs) == [0] * 8


def test_sql_twins_match_column_forms(spark):
    """The SQL-assembled twins of ivf_assign / pq_encode (one JVM-side
    parse instead of thousands of py4j literal calls) must produce
    bit-identical assignments and codes to the Column-built originals on
    every row — the equivalence that let ivf_build / ivf_pq_search switch
    to them."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from inferdb_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_sql,
        pq_encode,
        pq_encode_sql,
    )

    rng = np.random.RandomState(11)
    vecs = rng.uniform(-1, 1, size=(200, 16)).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(200), "embedding": [v.tolist() for v in vecs]}
        )
    )
    cents = [
        [round(float(x), 3) for x in rng.uniform(-1, 1, 16)] for _ in range(5)
    ]
    books = [
        [[round(float(x), 3) for x in rng.uniform(-1, 1, 4)] for _ in range(8)]
        for _ in range(4)
    ]
    rows = df.select(
        ivf_assign(F.col("embedding"), cents).alias("a_col"),
        F.expr(ivf_assign_sql("`embedding`", cents)).alias("a_sql"),
        pq_encode(F.col("embedding"), books).alias("c_col"),
        F.expr(pq_encode_sql("`embedding`", books)).alias("c_sql"),
    ).collect()
    for r in rows:
        assert r["a_col"] == r["a_sql"]
        assert list(r["c_col"]) == list(r["c_sql"])


def test_hyperplane_sql_twins_match_column_forms(spark):
    """The SQL-assembled twins of hyperplane_bucket / hyperplane_multiprobe
    (one JVM-side parse instead of ~|planes| x dim py4j literal calls —
    the r11 construct-cost fix for the LSH shortlist gates) must produce
    bit-identical buckets and probe sequences to the Column-built
    originals on every row, including exact-zero projections (sign
    boundary) and the n_probe=1 empty-flip edge."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from inferdb_spark.operators.similarity import (
        hyperplane_bucket,
        hyperplane_bucket_sql,
        hyperplane_multiprobe,
        hyperplane_multiprobe_sql,
        make_hyperplanes,
    )

    rng = np.random.RandomState(7)
    vecs = [rng.uniform(-1, 1, 16).tolist() for _ in range(200)]
    vecs.append([0.0] * 16)  # all projections exactly 0 -> no sign bits
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    )
    planes = make_hyperplanes(5, 16, seed=1234)
    for n_probe in (1, 2, 4):
        rows = df.select(
            hyperplane_bucket(F.col("embedding"), planes).alias("b_col"),
            F.expr(hyperplane_bucket_sql("`embedding`", planes)).alias("b_sql"),
            hyperplane_multiprobe(F.col("embedding"), planes, n_probe).alias(
                "p_col"
            ),
            F.expr(
                hyperplane_multiprobe_sql("`embedding`", planes, n_probe)
            ).alias("p_sql"),
        ).collect()
        for r in rows:
            assert r["b_col"] == r["b_sql"]
            assert list(r["p_col"]) == list(r["p_sql"])
