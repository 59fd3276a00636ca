"""The IVF-shortlisted ranking evaluation (the corpus-scale path) vs the
exact quadratic path: with full probe width the shortlist IS the corpus
and the metrics must match row-for-row; with a narrow probe the metrics
evaluate the SHORTLISTED system (they may move in either direction —
dropping a high-scoring irrelevant candidate promotes relevant ones),
but the n_rel normalization must stay exact because it comes from a
linear label-count join, never from the shortlist."""

from __future__ import annotations

from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.functions.vector import as_double_array, l2_norm
from inferdb_spark.operators.rank_metrics import ivf_shortlisted_eval
from inferdb_spark.operators.similarity import fit_ivf_centroids

N_LISTS = 4


def _qs_cs(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        as_double_array(F.col("embedding")).alias("v"),
    )
    nb = e.withColumn("nrm", l2_norm(F.col("v")))
    qs = nb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cs = nb.where(F.col("vec_id") % 25 != 0).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    return qs, cs


def test_full_probe_equals_exact(spark, sf_dir):
    from inferdb_spark.gate_r5c import q_ranking_eval_metrics

    exact = {r["qid"]: r for r in q_ranking_eval_metrics(spark, sf_dir).collect()}
    qs, cs = _qs_cs(spark, sf_dir)
    cents = fit_ivf_centroids(cs, "cv", N_LISTS)
    full = {
        r["qid"]: r
        for r in ivf_shortlisted_eval(qs, cs, cents, n_probe=N_LISTS).collect()
    }
    assert set(full) == set(exact)
    for qid, r in exact.items():
        s = full[qid]
        assert (s["n_rel"], s["ndcg6"], s["mrr6"], s["map6"]) == (
            r["n_rel"],
            r["ndcg6"],
            r["mrr6"],
            r["ap6"],
        )


def test_narrow_probe_normalization_stays_exact(spark, sf_dir):
    from inferdb_spark.gate_r5c import q_ranking_eval_metrics

    exact = {r["qid"]: r for r in q_ranking_eval_metrics(spark, sf_dir).collect()}
    qs, cs = _qs_cs(spark, sf_dir)
    cents = fit_ivf_centroids(cs, "cv", N_LISTS)
    narrow = {
        r["qid"]: r for r in ivf_shortlisted_eval(qs, cs, cents, n_probe=1).collect()
    }
    assert narrow, "narrow probe produced no evaluated queries"
    for qid, s in narrow.items():
        r = exact[qid]
        # n_rel comes from the FULL corpus (linear label counts), never
        # the shortlist — it must match the exact path at any probe width
        assert s["n_rel"] == r["n_rel"]
        # metrics evaluate the shortlisted system: bounded, not ordered
        assert 0.0 <= s["ndcg6"] <= 1.0
        assert 0.0 <= s["mrr6"] <= 1.0
        assert 0.0 <= s["map6"] <= 1.0
