"""Round-7 gate queries, batch 6: corpus-law diagnostics — Heaps' law
vocabulary growth and the Zipf rank-frequency slope.

Both are the statistics a tokenizer/corpus team checks before training
(is the corpus's type-token behavior normal? is the frequency tail
Zipfian or duplicated-flat?).  Scale/determinism:

- vocabulary growth uses NO global sort: checkpoints are doc_id
  thresholds (ids are dense), each term contributes min(doc_id), and a
  10-literal threshold join counts first-occurrences per prefix;
- both log-log OLS fits run on tiny relations (10 checkpoints / top-100
  terms) with per-row ln() quantized to integer micro-units, so the
  regression moment sums are exact BIGINTs — cross-engine float
  accumulation order never matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.functions import text as TXT
from inferdb_spark.gate import gate

_D_TOKENS = (
    "(CASE WHEN length(trim(regexp_replace(regexp_replace("
    "lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) = 0 "
    "THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split(trim(regexp_replace(regexp_replace("
    "lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') END)"
)

_HEAPS_CKPTS = 10


@gate(
    "heaps_law_curve",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_D_TOKENS}) AS term FROM documents
    ),
    mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS m FROM documents),
    firsts AS (
      SELECT term, CAST(min(doc_id) AS BIGINT) AS first_id,
             CAST(count(*) AS BIGINT) AS freq
      FROM tok GROUP BY term
    ),
    ck AS (
      SELECT CAST(unnest(range(1, {_HEAPS_CKPTS + 1})) AS BIGINT) AS c
    ),
    curve AS (
      SELECT ck.c,
             CAST((ck.c * mx.m) // {_HEAPS_CKPTS} AS BIGINT) AS thr,
             CAST(count(CASE WHEN f.first_id < (ck.c * mx.m) // {_HEAPS_CKPTS}
                        THEN 1 END) AS BIGINT) AS vocab
      FROM ck CROSS JOIN mx CROSS JOIN firsts f
      GROUP BY ck.c, thr
    ),
    toks_prefix AS (
      SELECT ck.c,
             CAST(count(*) AS BIGINT) AS tokens
      FROM ck CROSS JOIN mx JOIN tok
        ON tok.doc_id < (ck.c * mx.m) // {_HEAPS_CKPTS}
      GROUP BY ck.c
    ),
    pts AS (
      SELECT curve.c, toks_prefix.tokens, curve.vocab,
             CAST(round(ln(CAST(toks_prefix.tokens AS DOUBLE)) * 1000000)
                  AS BIGINT) AS x_u,
             CAST(round(ln(CAST(curve.vocab AS DOUBLE)) * 1000000)
                  AS BIGINT) AS y_u
      FROM curve JOIN toks_prefix ON curve.c = toks_prefix.c
    ),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(x_u) AS BIGINT) AS sx, CAST(sum(y_u) AS BIGINT) AS sy,
             CAST(sum(x_u * y_u) AS BIGINT) AS sxy,
             CAST(sum(x_u * x_u) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT pts.c, pts.tokens, pts.vocab,
           round((CAST(fit.k AS DOUBLE) * CAST(fit.sxy AS DOUBLE)
                  - CAST(fit.sx AS DOUBLE) * CAST(fit.sy AS DOUBLE))
                 / (CAST(fit.k AS DOUBLE) * CAST(fit.sxx AS DOUBLE)
                    - CAST(fit.sx AS DOUBLE) * CAST(fit.sx AS DOUBLE)), 6)
             AS heaps_beta
    FROM pts CROSS JOIN fit
    """,
)
def q_heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law vocabulary-growth curve V(n) ~ K*n^beta over ten
    corpus prefixes, with beta fit by log-log OLS — the type-token
    diagnostic a tokenizer team runs before committing a vocab size
    (duplicated corpora flatten beta; OCR noise inflates it).

    NO global sort anywhere: prefixes are doc_id thresholds (dense ids),
    each term contributes min(doc_id) (one groupBy), and a 10-literal
    checkpoint cross join counts first-occurrences per prefix.  The OLS
    runs on 10 points with ln() quantized to micro-units, so the moment
    sums are exact BIGINTs and the slope is one fixed-order division.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(TXT.tokens(F.col("text"))).alias("term"))
    tok.cache()
    mx = docs.agg((F.max("doc_id") + 1).cast("long").alias("m"))
    firsts = tok.groupBy("term").agg(
        F.min("doc_id").cast("long").alias("first_id"),
        F.count("*").cast("long").alias("freq"),
    )
    ck = spark.range(1, _HEAPS_CKPTS + 1).select(F.col("id").cast("long").alias("c"))
    thr = F.expr(f"(c * m) div {_HEAPS_CKPTS}")
    curve = (
        ck.crossJoin(F.broadcast(mx))
        .crossJoin(firsts)
        .select("c", thr.alias("thr"), "first_id")
        .groupBy("c", "thr")
        .agg(
            F.count(F.when(F.col("first_id") < F.col("thr"), 1))
            .cast("long")
            .alias("vocab")
        )
    )
    toks_prefix = (
        ck.crossJoin(F.broadcast(mx))
        .join(tok, tok.doc_id < thr)
        .groupBy("c")
        .agg(F.count("*").cast("long").alias("tokens"))
    )
    pts = curve.join(toks_prefix, "c").select(
        "c",
        "tokens",
        "vocab",
        F.round(F.log(F.col("tokens").cast("double")) * 1_000_000)
        .cast("long")
        .alias("x_u"),
        F.round(F.log(F.col("vocab").cast("double")) * 1_000_000)
        .cast("long")
        .alias("y_u"),
    )
    pts.cache()
    fit = pts.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x_u").cast("long").alias("sx"),
        F.sum("y_u").cast("long").alias("sy"),
        F.sum(F.col("x_u") * F.col("y_u")).cast("long").alias("sxy"),
        F.sum(F.col("x_u") * F.col("x_u")).cast("long").alias("sxx"),
    )
    kd = F.col("k").cast("double")
    beta = (
        kd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        kd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "c", "tokens", "vocab", F.round(beta, 6).alias("heaps_beta")
    )


_ZIPF_TOP = 100


@gate(
    "zipf_slope_fit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_D_TOKENS}) AS term FROM documents
    ),
    counts AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
               FROM tok GROUP BY term),
    top AS (
      SELECT term, freq,
             CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT)
               AS rank
      FROM counts ORDER BY freq DESC, term LIMIT {_ZIPF_TOP}
    ),
    pts AS (
      SELECT rank, term, freq,
             CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x_u,
             CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y_u
      FROM top
    ),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(x_u) AS BIGINT) AS sx, CAST(sum(y_u) AS BIGINT) AS sy,
             CAST(sum(x_u * y_u) AS BIGINT) AS sxy,
             CAST(sum(x_u * x_u) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT pts.rank, pts.term, pts.freq,
           round((CAST(fit.k AS DOUBLE) * CAST(fit.sxy AS DOUBLE)
                  - CAST(fit.sx AS DOUBLE) * CAST(fit.sy AS DOUBLE))
                 / (CAST(fit.k AS DOUBLE) * CAST(fit.sxx AS DOUBLE)
                    - CAST(fit.sx AS DOUBLE) * CAST(fit.sx AS DOUBLE)), 6)
             AS zipf_slope
    FROM pts CROSS JOIN fit
    """,
)
def q_zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope over the top-100 terms (log-log OLS;
    a healthy natural-language corpus sits near -1, boilerplate-heavy or
    deduplicate-starved corpora flatten toward 0) — the frequency-tail
    companion to heaps_law_curve.

    Term counts are one groupBy; top-100 is a TakeOrdered with the
    (freq DESC, term) total order; the OLS runs on 100 rows with
    micro-quantized ln() so the moment sums are exact BIGINTs.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(TXT.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    top = (
        counts.orderBy(F.col("freq").desc(), "term")
        .limit(_ZIPF_TOP)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("freq").desc(), "term"))
            .cast("long")
            .alias("rank"),
            "term",
            "freq",
        )
    )
    pts = top.select(
        "rank",
        "term",
        "freq",
        F.round(F.log(F.col("rank").cast("double")) * 1_000_000)
        .cast("long")
        .alias("x_u"),
        F.round(F.log(F.col("freq").cast("double")) * 1_000_000)
        .cast("long")
        .alias("y_u"),
    )
    pts.cache()
    fit = pts.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x_u").cast("long").alias("sx"),
        F.sum("y_u").cast("long").alias("sy"),
        F.sum(F.col("x_u") * F.col("y_u")).cast("long").alias("sxy"),
        F.sum(F.col("x_u") * F.col("x_u")).cast("long").alias("sxx"),
    )
    kd = F.col("k").cast("double")
    slope = (
        kd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        kd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "rank", "term", "freq", F.round(slope, 6).alias("zipf_slope")
    )
