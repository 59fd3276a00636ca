"""split_leakage_audit (operators/dedup.py): cross-split near-dup clones
are flagged, a clean corpus is silent; tokenizer fertility sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from inferdb_spark.functions.hashing import MERSENNE_P  # noqa: F401
from inferdb_spark.operators.dedup import split_leakage_audit


def _split_of(spark, ids, test_mod=10):
    from inferdb_spark.functions.hashing import h52

    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    rows = df.select(
        "doc_id", (h52(F.col("doc_id").cast("string")) % test_mod).alias("m")
    ).collect()
    return {r["doc_id"]: r["m"] == 0 for r in rows}


def test_clone_across_splits_flagged(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    # find a (test_id, train_id) pair under the hash split
    split = _split_of(spark, range(100))
    test_id = next(i for i in range(100) if split[i])
    train_id = next(i for i in range(100) if not split[i])
    filler = [
        (1000 + i, f"totally unrelated filler text number {i} {i*7} xyz")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        [(test_id, base), (train_id, base + " tail")] + filler,
        "doc_id: long, text: string",
    )
    out = split_leakage_audit(df, "doc_id", "text").collect()
    flagged = {r["test_id"]: r["min_train_id"] for r in out}
    assert flagged.get(test_id) == train_id


def test_clean_corpus_mostly_silent(spark):
    # pairwise-unrelated docs: no cross-split band collisions
    df = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}x{j}q{(i * 31 + j * 17) % 997}" for j in range(12)))
            for i in range(40)
        ],
        "doc_id: long, text: string",
    )
    assert split_leakage_audit(df, "doc_id", "text").count() == 0


def test_fertility_merges_reduce_pieces(spark):
    from inferdb_spark.operators.bpe_train import bpe_apply

    df = spark.createDataFrame([("there",), ("thin",)], "word: string")
    out = {
        r["word"]: r["n"]
        for r in df.select(
            "word",
            F.size(
                bpe_apply(F.col("word"), [("t", "h"), ("th", "e"), ("e", "r")])
            ).alias("n"),
        ).collect()
    }
    # 'there' -> th|er|e? chain: t h->th, th e->the, e r->er:
    # |t||h||e||r||e| -> |th||e||r||e| -> |the||r||e| -> the r e (er needs
    # adjacent e,r which remains: |the||r||e| has r,e not e,r)
    assert out["there"] == 3  # the / r / e
    assert out["thin"] == 3   # th / i / n
