from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.operators.binning import (
    BinSpec,
    apply_bins,
    fit_categorical_bins,
    fit_quantile_bins,
    fit_supervised_bins,
    fit_width_bins,
    key_expr,
)


def test_numeric_binspec_semantics(spark):
    df = spark.createDataFrame([(x,) for x in [-5.0, 0.0, 10.0, 10.5, 25.0, 99.0]], "x double")
    spec = BinSpec(column="x", splits=[0.0, 10.0, 20.0])
    got = [r[0] for r in df.select(spec.expr()).collect()]
    # bin = #{s : x > s}: -5->0, 0->0 (not >0), 10->1, 10.5->2, 25->3, 99->3
    assert got == [0, 0, 1, 2, 3, 3]
    assert spec.n_bins == 4


def test_numeric_binspec_nulls(spark):
    df = spark.createDataFrame([(None,), (5.0,)], "x double")
    spec = BinSpec(column="x", splits=[1.0], null_bin=0)
    assert [r[0] for r in df.select(spec.expr()).collect()] == [0, 1]


def test_categorical_binspec_unseen_goes_to_extra_bin(spark):
    df = spark.createDataFrame([("a",), ("b",), ("zz",), (None,)], "c string")
    spec = BinSpec(column="c", kind="categorical", groups=[["a"], ["b", "x"]])
    got = [r[0] for r in df.select(spec.expr()).collect()]
    assert got == [0, 1, 2, 0]  # unseen 'zz' -> extra bin 2 (src/encoder.py:123-126)


def test_fit_quantile_and_width_bins(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = fit_quantile_bins(li, "l_extendedprice", 4)
    assert 1 <= len(q.splits) <= 3
    w = fit_width_bins(li, "l_quantity", 5)
    assert len(w.splits) == 4
    binned = apply_bins(li, [q, w])
    mx = binned.agg(
        F.max("l_extendedprice_bin"), F.max("l_quantity_bin"),
        F.min("l_extendedprice_bin"), F.min("l_quantity_bin"),
    ).first()
    assert mx[0] <= len(q.splits) and mx[1] <= 4
    assert mx[2] >= 0 and mx[3] >= 0


def test_fit_supervised_bins_monotone_target(spark):
    # y strongly depends on x: supervised bins should separate low/high x
    rows = [(float(i), 0.0 if i < 500 else 100.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "x double, y double")
    spec = fit_supervised_bins(df, "x", "y", max_bins=4, pre_bins=16)
    assert 1 <= len(spec.splits) <= 3
    # some split must separate the two regimes near 500
    assert any(400 <= s <= 600 for s in spec.splits)


def test_fit_categorical_bins_orders_by_target(spark):
    rows = [("lo", 0.0)] * 50 + [("mid", 5.0)] * 50 + [("hi", 10.0)] * 50
    df = spark.createDataFrame(rows, "c string, y double")
    spec = fit_categorical_bins(df, "c", "y", max_groups=3)
    assert spec.kind == "categorical"
    flat = [v for g in spec.groups for v in g]
    assert set(flat) == {"lo", "mid", "hi"}
    # groups contiguous in target order
    assert spec.groups[0] == ["lo"]


def test_key_expr_format(spark):
    df = spark.createDataFrame([(1.0, 30.0)], "a double, b double")
    specs = [BinSpec(column="a", splits=[0.5]), BinSpec(column="b", splits=[10.0, 20.0])]
    out = apply_bins(df, specs).select(key_expr(specs).alias("key")).first()
    assert out.key == "1.2"


def test_wide_schema_binning_784_columns(spark):
    """SURVEY §7 known-hard 3: MNIST-width tables (784 features) must
    translate without blowing whole-stage-codegen's 64KB method limit —
    the Bucketizer path bins every column in one vectorized pass, and the
    when-chain path must still produce identical bin ids (Spark falls back
    to interpreted eval per-expression if codegen overflows)."""
    import pyspark.sql.functions as F

    from inferdb_spark.operators.binning import BinSpec, apply_bins, apply_bins_bucketizer

    n_cols = 784
    cols = [f"f_{i}" for i in range(n_cols)]
    df = spark.range(0, 50).select(
        "id", *[((F.col("id") * (i + 3)) % 97).cast("double").alias(c) for i, c in enumerate(cols)]
    )
    specs = [BinSpec(column=c, splits=[20.0, 40.0, 60.0, 80.0]) for c in cols]
    a = apply_bins(df, specs).select("id", *[c + "_bin" for c in cols])
    b = apply_bins_bucketizer(df, specs).select("id", *[c + "_bin" for c in cols])
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    assert len(rows_a) == 50
