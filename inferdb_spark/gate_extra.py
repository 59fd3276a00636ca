"""Gate queries: additional coverage — wordcount-at-scale, multiclass
metrics, distinct path counting, embedding near-dup pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import QTY_SPLITS, _bin_expr_spark, _bin_expr_sql, gate
from inferdb_spark.gate_ml import MC_B, MC_COEF, _mc_scores_sql
from inferdb_spark.gate_prep import _PLANES_SQL, _d_tokens, PLANES
from inferdb_spark.operators import similarity as SIM


@gate(
    "token_histogram",
    oracle=f"""
    WITH tok AS (SELECT unnest({_d_tokens('text')}) AS token FROM documents)
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM tok GROUP BY token
    HAVING count(*) >= 10
    """,
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary histogram: explode tokens → count (the canonical
    shuffle-on-token wordcount; map-side partial aggregation keeps the
    shuffle proportional to VOCABULARY, not corpus size)."""
    from inferdb_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 10)
    )


@gate(
    "multiclass_metrics",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN s0 >= s1 AND s0 >= s2 THEN 0
                  WHEN s1 >= s2 THEN 1 ELSE 2 END AS p,
             CAST(l_linenumber % 3 AS INT) AS t
      FROM (SELECT l_linenumber, {_mc_scores_sql} FROM lineitem)
    ),
    pred_c AS (SELECT p AS cls, count(*) AS pred_n FROM scored GROUP BY 1),
    true_c AS (SELECT t AS cls, count(*) AS true_n FROM scored GROUP BY 1),
    hit_c  AS (SELECT p AS cls, count(*) AS tp FROM scored WHERE p = t GROUP BY 1),
    per AS (
      SELECT coalesce(t.cls, pr.cls) AS cls,
             coalesce(hit.tp, 0) AS tp,
             coalesce(pr.pred_n, 0) AS pred_n,
             coalesce(t.true_n, 0) AS true_n
      FROM true_c t FULL JOIN pred_c pr ON t.cls = pr.cls
      LEFT JOIN hit_c hit ON coalesce(t.cls, pr.cls) = hit.cls
    ),
    macro AS (
      SELECT avg(CASE WHEN pred_n = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE)/pred_n END) AS pm,
             avg(CASE WHEN true_n = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE)/true_n END) AS rm
      FROM per
    ),
    acc AS (SELECT CAST(sum(CASE WHEN p = t THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS a FROM scored)
    SELECT CAST(round(acc.a, 6) AS DOUBLE) AS accuracy,
           CAST(round(macro.pm, 6) AS DOUBLE) AS precision_macro,
           CAST(round(macro.rm, 6) AS DOUBLE) AS recall_macro
    FROM acc CROSS JOIN macro
    """,
)
def q_multiclass_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Macro-averaged multiclass metrics (A7 multi-class, src/transpiler.py
    :276-344's per-label CTE loop → three small groupBys here)."""
    from inferdb_spark.operators.metrics import multiclass_report
    from inferdb_spark.operators.scoring import score_multiclass_linear

    li = load_table(spark, sf_dir, "lineitem")
    scored = score_multiclass_linear(
        li, ["l_quantity", "l_discount", "l_tax"], MC_COEF, MC_B
    ).select(
        F.col("prediction"), (F.col("l_linenumber") % 3).cast("int").alias("label")
    )
    rep = multiclass_report(scored)
    return rep.select(
        F.round("accuracy", 6).cast("double").alias("accuracy"),
        F.round("precision_macro", 6).cast("double").alias("precision_macro"),
        F.round("recall_macro", 6).cast("double").alias("recall_macro"),
    )


@gate(
    "distinct_paths",
    oracle=f"""
    SELECT CAST(count(DISTINCT concat_ws('.', {_bin_expr_sql('l_quantity', QTY_SPLITS)},
                                              l_linenumber % 4)) AS BIGINT) AS n_paths,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
)
def q_distinct_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct compound-path count (A4 filling-degree numerator,
    src/optimizer.py:225-231).  Exact countDistinct for the oracle;
    approx_count_distinct is the scale substitution (engine-specific, so
    benchmarked rather than gated)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        ".",
        _bin_expr_spark("l_quantity", QTY_SPLITS).cast("string"),
        (F.col("l_linenumber") % 4).cast("string"),
    )
    return li.agg(
        F.countDistinct(key).alias("n_paths"), F.count("*").alias("n_rows")
    )


@gate(
    "collect_sorted_list",
    oracle="""
    SELECT n_regionkey AS region,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def q_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic list aggregation: collect_list is order-nondeterministic
    under shuffle, so SORT the collected array before concatenating — the
    only safe way to emit list aggregates from a distributed engine."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy(F.col("n_regionkey").alias("region")).agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        F.count("*").alias("n"),
    )


@gate(
    "regexp_extract_parse",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           CAST(regexp_matches(p_name, 'o') AS INT) AS has_o,
           CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT) AS consonant_len
    FROM part
    """,
)
def q_regexp_extract_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction/matching/replacement parity across engines."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.col("p_name").rlike("o").cast("int").alias("has_o"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("long").alias(
            "consonant_len"
        ),
    )


@gate(
    "stats_moments",
    oracle="""
    SELECT l_returnflag,
           CAST(round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS corr_qp,
           CAST(round(covar_samp(l_quantity, l_discount), 6) AS DOUBLE) AS covar_qd,
           CAST(round(stddev_samp(l_tax), 6) AS DOUBLE) AS sd_tax,
           CAST(round(avg(l_quantity), 6) AS DOUBLE) AS mean_q
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped statistical moments (corr/covar/stddev) — single-pass
    decomposable aggregates; cross-engine agreement holds to 6dp.
    (Kurtosis excluded: Spark reports excess g2, DuckDB bias-corrected G2 —
    a definitional difference, not an error.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).cast("double").alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).cast("double").alias("covar_qd"),
        F.round(F.stddev_samp("l_tax"), 6).cast("double").alias("sd_tax"),
        F.round(F.avg("l_quantity"), 6).cast("double").alias("mean_q"),
    )


@gate(
    "embedding_near_pairs",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             CAST({" + ".join(
                 f"(CASE WHEN list_sum(list_transform(generate_series(1, 64),"
                 f" i -> cast(embedding[i] as double) * ({ps})[i])) > 0"
                 f" THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
                 for i, ps in enumerate(_PLANES_SQL[:4])
             )} AS BIGINT) AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b,
             list_sum(list_transform(generate_series(1, 64),
                 i -> cast(x.embedding[i] as double) * cast(y.embedding[i] as double)))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> cast(x.embedding[i] as double) * cast(x.embedding[i] as double))))
              * sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> cast(y.embedding[i] as double) * cast(y.embedding[i] as double))))) AS cosine
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT id_a, id_b, CAST(round(cosine, 6) AS DOUBLE) AS cosine
    FROM pairs WHERE cosine >= 0.3
    """,
)
def q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: 4-plane LSH blocking +
    exact-cosine verification (threshold 0.3 — the synthetic embeddings are near-orthogonal, so 0.3 marks the top ~1% of in-bucket pairs)."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = SIM.embedding_near_pairs(e, "embedding", PLANES[:4], threshold=0.3)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).cast("double").alias("cosine")
    )
