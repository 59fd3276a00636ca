"""Round-7 gate queries, batch 4: the rest of the classical association /
model-evaluation toolbox — ordinal association (Goodman-Kruskal gamma,
Somers' D), nominal association (Cramer's V, Theil's U), campaign decile
lift, Brier-score Murphy decomposition, and a moment-form polynomial-
kernel MMD two-sample test.

Scale/determinism disciplines (same as gate_r7/gate_r7b):
- gamma / Somers' D reuse the Kendall joint-frequency-grid trick (pair
  work |bins|^2, BIGINT cell products);
- Cramer's V / Theil's U quantize per-cell rational terms to micro-units
  before the cross-cell sum (the chi2/MI gate convention);
- MMD^2 with the quadratic kernel expands EXACTLY into 1st-4th moment
  sums (kilodollar integers keep sum(x^4) inside BIGINT), so the "kernel
  pair sum" needs no pairs at all — one aggregation, unbiased i!=j form;
- Brier terms are (p_u - 1e6*y)^2 BIGINT sums; decomposition terms
  micro-round per bin (10 bins) before summing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate
from inferdb_spark.gate_r7 import _YB_CENTS
from inferdb_spark.gate_r7c import _ECE_B0, _ECE_BD, _ECE_BQ

# ---------------------------------------------------------------------------
# Goodman-Kruskal gamma + Somers' D on the Kendall cell grid
# ---------------------------------------------------------------------------


@gate(
    "gamma_somers_d",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) // {_YB_CENTS} AS yb,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    cd AS (
      SELECT CAST(coalesce(sum(CASE WHEN c2.yb > c1.yb
                                    THEN c1.n * c2.n END), 0) AS BIGINT) AS conc,
             CAST(coalesce(sum(CASE WHEN c2.yb < c1.yb
                                    THEN c1.n * c2.n END), 0) AS BIGINT) AS disc
      FROM cells c1 JOIN cells c2 ON c2.x > c1.x
    ),
    tx AS (
      SELECT CAST(sum((nx * (nx - 1)) // 2) AS BIGINT) AS tie_x
      FROM (SELECT sum(n) AS nx FROM cells GROUP BY x)
    ),
    tot AS (
      SELECT CAST((sum(n) * (sum(n) - 1)) // 2 AS BIGINT) AS n2 FROM cells
    )
    SELECT conc, disc,
           round(CAST(conc - disc AS DOUBLE) / CAST(conc + disc AS DOUBLE), 6)
             AS gamma,
           round(CAST(conc - disc AS DOUBLE) / CAST(n2 - tie_x AS DOUBLE), 6)
             AS somers_d_yx
    FROM cd, tx, tot
    """,
)
def q_gamma_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma = (C-D)/(C+D) (ties dropped entirely) and
    Somers' D_{{Y|X}} = (C-D)/(pairs untied on X) — the asymmetric
    ordinal-association companion statistics to kendall_tau_binned, off
    the SAME joint-frequency grid: one row-proportional aggregate, then
    BIGINT cell-product pair counting over a broadcast grid self-join
    bounded by |bins|^2.  The three statistics differ only in the tie
    denominator, so a pipeline computes all of them from one grid pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            F.col("l_quantity").cast("long").alias("x"),
            F.expr(
                f"CAST(round(l_extendedprice * 100) AS BIGINT) div {_YB_CENTS}"
            ).alias("yb"),
        )
        .groupBy("x", "yb")
        .agg(F.count("*").cast("long").alias("n"))
    )
    cells.cache()
    c1, c2 = cells.alias("c1"), cells.alias("c2")
    cd = c1.join(F.broadcast(c2), F.col("c2.x") > F.col("c1.x")).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("c2.yb") > F.col("c1.yb"), F.col("c1.n") * F.col("c2.n"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("conc"),
        F.coalesce(
            F.sum(
                F.when(F.col("c2.yb") < F.col("c1.yb"), F.col("c1.n") * F.col("c2.n"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("disc"),
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("n").alias("nx"))
        .agg(F.sum(F.expr("(nx * (nx - 1)) div 2")).cast("long").alias("tie_x"))
    )
    tot = cells.agg(
        F.expr("CAST((sum(n) * (sum(n) - 1)) div 2 AS BIGINT)").alias("n2")
    )
    cmd = F.col("conc") - F.col("disc")
    return cd.crossJoin(tx).crossJoin(tot).select(
        "conc",
        "disc",
        F.round(
            cmd.cast("double") / (F.col("conc") + F.col("disc")).cast("double"), 6
        ).alias("gamma"),
        F.round(
            cmd.cast("double") / (F.col("n2") - F.col("tie_x")).cast("double"), 6
        ).alias("somers_d_yx"),
    )


# ---------------------------------------------------------------------------
# Cramer's V + Theil's U over the returnflag x linestatus contingency
# ---------------------------------------------------------------------------


@gate(
    "cramers_v_theils_u",
    oracle="""
    WITH obs AS (
      SELECT l_returnflag AS a, l_linestatus AS b,
             CAST(count(*) AS BIGINT) AS nab
      FROM lineitem GROUP BY 1, 2
    ),
    marg AS (
      SELECT a, b, nab,
             sum(nab) OVER (PARTITION BY a) AS na,
             sum(nab) OVER (PARTITION BY b) AS nb,
             sum(nab) OVER () AS n
      FROM obs
    ),
    terms AS (
      SELECT n,
             CAST(round((CAST(nab AS DOUBLE)
                         - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        * (CAST(nab AS DOUBLE)
                           - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                             / CAST(n AS DOUBLE))
                        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                           / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS chi_u,
             CAST(round(CAST(nab AS DOUBLE) / CAST(n AS DOUBLE)
                        * ln(CAST(nab AS DOUBLE) * CAST(n AS DOUBLE)
                             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                        * 1000000) AS BIGINT) AS mi_u,
             CAST(round(CAST(nab AS DOUBLE) / CAST(n AS DOUBLE)
                        * ln(CAST(na AS DOUBLE) / CAST(n AS DOUBLE))
                        * 1000000) AS BIGINT) AS ha_u
      FROM marg
    ),
    dims AS (
      SELECT CAST(count(DISTINCT a) AS BIGINT) AS r,
             CAST(count(DISTINCT b) AS BIGINT) AS c
      FROM obs
    ),
    s AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(chi_u) AS BIGINT) AS chi2_u,
             CAST(sum(mi_u) AS BIGINT) AS mi_usum,
             CAST(-sum(ha_u) AS BIGINT) AS ha_usum,
             CAST(max(least(dims.r, dims.c) - 1) AS BIGINT) AS mindim
      FROM terms, dims
    )
    SELECT round(sqrt((CAST(chi2_u AS DOUBLE) / 1000000.0)
                      / (CAST(n AS DOUBLE) * CAST(mindim AS DOUBLE))), 6)
             AS cramers_v,
           round((CAST(mi_usum AS DOUBLE) / 1000000.0)
                 / (CAST(ha_usum AS DOUBLE) / 1000000.0), 6) AS theils_u
    FROM s
    """,
)
def q_cramers_v_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V = sqrt(chi2 / (n*min(r-1, c-1))) and Theil's
    uncertainty coefficient U(A|B) = I(A;B)/H(A) over the returnflag x
    linestatus contingency — the NORMALIZED nominal-association pair
    (V in [0,1] symmetric, U in [0,1] asymmetric) complementing the raw
    chi2/MI gates.

    Per-cell chi2 / MI / entropy terms are rationals with one ln each,
    quantized to integer micro-units BEFORE the cross-cell sum (the
    gate_stats convention); cells = 3x2, windows run on 6 rows.  One
    row-proportional aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        F.col("l_returnflag").alias("a"), F.col("l_linestatus").alias("b")
    ).agg(F.count("*").cast("long").alias("nab"))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wall = Window.partitionBy()
    marg = obs.select(
        "a",
        "b",
        "nab",
        F.sum("nab").over(wa).alias("na"),
        F.sum("nab").over(wb).alias("nb"),
        F.sum("nab").over(wall).alias("n"),
    )
    nabd = F.col("nab").cast("double")
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    nd = F.col("n").cast("double")
    e = nad * nbd / nd
    chi_u = F.round((nabd - e) * (nabd - e) / e * 1_000_000).cast("long")
    mi_u = F.round(
        nabd / nd * F.log(nabd * nd / (nad * nbd)) * 1_000_000
    ).cast("long")
    ha_u = F.round(nabd / nd * F.log(nad / nd) * 1_000_000).cast("long")
    terms = marg.select(
        "n",
        chi_u.alias("chi_u"),
        mi_u.alias("mi_u"),
        ha_u.alias("ha_u"),
        F.size(F.collect_set("a").over(wall)).cast("long").alias("r"),
        F.size(F.collect_set("b").over(wall)).cast("long").alias("c"),
    )
    s = terms.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("chi_u").cast("long").alias("chi2_u"),
        F.sum("mi_u").cast("long").alias("mi_usum"),
        (-F.sum("ha_u")).cast("long").alias("ha_usum"),
        F.max(F.least(F.col("r"), F.col("c")) - 1).cast("long").alias("mindim"),
    )
    return s.select(
        F.round(
            F.sqrt(
                (F.col("chi2_u").cast("double") / F.lit(1_000_000.0))
                / (F.col("n").cast("double") * F.col("mindim").cast("double"))
            ),
            6,
        ).alias("cramers_v"),
        F.round(
            (F.col("mi_usum").cast("double") / F.lit(1_000_000.0))
            / (F.col("ha_usum").cast("double") / F.lit(1_000_000.0)),
            6,
        ).alias("theils_u"),
    )


# ---------------------------------------------------------------------------
# Decile lift table for the fixed logistic scorer
# ---------------------------------------------------------------------------


@gate(
    "decile_lift_table",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(floor((1.0 / (1.0 + exp(-(({_ECE_B0!r} + ({_ECE_BQ!r} * l_quantity))
                     + ({_ECE_BD!r} * l_discount))))) * 1000000.0 + 0.5)
               AS BIGINT) AS p_u,
             CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS rid,
             (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
      FROM lineitem
    ),
    ranked AS (
      SELECT y, ntile(10) OVER (ORDER BY p_u DESC, rid) AS decile FROM scored
    ),
    per AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(y) AS BIGINT) AS resp
      FROM ranked GROUP BY 1
    ),
    cum AS (
      SELECT decile, n_d, resp,
             sum(n_d) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cn,
             sum(resp) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cr,
             sum(n_d) OVER () AS tn, sum(resp) OVER () AS tr
      FROM per
    )
    SELECT decile, n_d, resp,
           round(CAST(resp AS DOUBLE) / CAST(n_d AS DOUBLE), 6) AS resp_rate,
           round((CAST(cr AS DOUBLE) / CAST(cn AS DOUBLE))
                 / (CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS cum_lift
    FROM cum
    """,
)
def q_decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Campaign decile lift: rank rows by model score, cut into 10
    equal-count deciles, report per-decile response rate and cumulative
    lift vs the base rate — the targeting readout every scoring pipeline
    ships next to AUC.

    Determinism: scores on the micro grid, ntile over the TOTAL order
    (p_u DESC, row id).  Scale note: exact equal-count deciles need a
    global rank (same caveat as gate:ntile_decile_stats — substitute
    approx-percentile cuts at extreme scale); counts/cumulative windows
    then run on 10 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    margin = (
        F.lit(_ECE_B0) + (F.lit(_ECE_BQ) * F.col("l_quantity"))
    ) + (F.lit(_ECE_BD) * F.col("l_discount"))
    p_u = F.floor(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) * F.lit(1_000_000.0)
        + F.lit(0.5)
    )
    scored = li.select(
        p_u.alias("p_u"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("rid"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    ranked = scored.select(
        "y",
        F.ntile(10)
        .over(Window.orderBy(F.col("p_u").desc(), "rid"))
        .cast("long")
        .alias("decile"),
    )
    per = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_d"),
        F.sum("y").cast("long").alias("resp"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    cum = per.select(
        "decile",
        "n_d",
        "resp",
        F.sum("n_d").over(wc).alias("cn"),
        F.sum("resp").over(wc).alias("cr"),
        F.sum("n_d").over(wall).alias("tn"),
        F.sum("resp").over(wall).alias("tr"),
    )
    return cum.select(
        "decile",
        "n_d",
        "resp",
        F.round(F.col("resp").cast("double") / F.col("n_d").cast("double"), 6)
        .alias("resp_rate"),
        F.round(
            (F.col("cr").cast("double") / F.col("cn").cast("double"))
            / (F.col("tr").cast("double") / F.col("tn").cast("double")),
            6,
        ).alias("cum_lift"),
    )


# ---------------------------------------------------------------------------
# Brier score + Murphy decomposition off the ECE bin relation
# ---------------------------------------------------------------------------


@gate(
    "brier_decomposition",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(floor((1.0 / (1.0 + exp(-(({_ECE_B0!r} + ({_ECE_BQ!r} * l_quantity))
                     + ({_ECE_BD!r} * l_discount))))) * 1000000.0 + 0.5)
               AS BIGINT) AS p_u,
             (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
      FROM lineitem
    ),
    brier AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(CAST((p_u - 1000000 * y) * (p_u - 1000000 * y)
                                      AS DOUBLE) / 1000000.0) AS BIGINT))
                  AS BIGINT) AS se_sum_u,
             CAST(sum(y) AS BIGINT) AS pos
      FROM scored
    ),
    bins AS (
      SELECT least(p_u // 100000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(y) AS BIGINT) AS acc,
             CAST(sum(p_u) AS BIGINT) AS conf_u
      FROM scored GROUP BY 1
    ),
    dec AS (
      SELECT CAST(sum(CAST(round(
               (CAST(conf_u AS DOUBLE) / CAST(n_b AS DOUBLE)
                - 1000000.0 * CAST(acc AS DOUBLE) / CAST(n_b AS DOUBLE))
               * (CAST(conf_u AS DOUBLE) / CAST(n_b AS DOUBLE)
                  - 1000000.0 * CAST(acc AS DOUBLE) / CAST(n_b AS DOUBLE))
               * CAST(n_b AS DOUBLE) / 1000000.0) AS BIGINT)) AS BIGINT)
               AS rel_u,
             CAST(sum(CAST(round(
               (1000000.0 * CAST(acc AS DOUBLE) / CAST(n_b AS DOUBLE)
                - 1000000.0 * CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE))
               * (1000000.0 * CAST(acc AS DOUBLE) / CAST(n_b AS DOUBLE)
                  - 1000000.0 * CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE))
               * CAST(n_b AS DOUBLE) / 1000000.0) AS BIGINT)) AS BIGINT)
               AS res_u
      FROM bins, brier b
    )
    SELECT round(CAST(se_sum_u AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
             AS brier,
           round(CAST(rel_u AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
             AS reliability,
           round(CAST(res_u AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
             AS resolution,
           round((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                 * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             AS uncertainty
    FROM brier, dec
    """,
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy decomposition (reliability -
    resolution + uncertainty) over the same scorer/bins as
    ece_reliability: the probabilistic-forecast quality audit (does the
    model's sharpness come from calibration or discrimination?).

    Exactness: the per-row squared error (p_u - 1e6*y)^2 is an exact
    BIGINT (<= 1e12), quantized to MICRO-UNITS (round(d^2/1e6), an exact
    double division of integers < 2^53) before the global sum — the raw
    squared sum overflows BIGINT past ~9M rows (caught at the sf10
    probe), the micro form is safe to ~1e12 rows with per-row error
    <= 0.5e-6.  Reliability/resolution per-bin terms quantize the same
    way over the 10-row bin relation.  One scan plus a 10-row aggregate
    — no windows over raw rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    margin = (
        F.lit(_ECE_B0) + (F.lit(_ECE_BQ) * F.col("l_quantity"))
    ) + (F.lit(_ECE_BD) * F.col("l_discount"))
    p_u = F.floor(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    scored = li.select(
        p_u.alias("p_u"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    scored.cache()
    d = F.col("p_u") - 1_000_000 * F.col("y")
    brier = scored.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.round((d * d).cast("double") / F.lit(1_000_000.0)).cast("long")
        )
        .cast("long")
        .alias("se_sum_u"),
        F.sum("y").cast("long").alias("pos"),
    )
    bins = scored.groupBy(
        F.least(F.expr("p_u div 100000"), F.lit(9)).alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("acc"),
        F.sum("p_u").cast("long").alias("conf_u"),
    )
    nbd = F.col("n_b").cast("double")
    conf_mean_u = F.col("conf_u").cast("double") / nbd
    acc_mean_u = F.lit(1_000_000.0) * F.col("acc").cast("double") / nbd
    base_u = F.lit(1_000_000.0) * F.col("pos").cast("double") / F.col("n").cast(
        "double"
    )
    dec = bins.crossJoin(F.broadcast(brier)).agg(
        F.sum(
            F.round(
                (conf_mean_u - acc_mean_u)
                * (conf_mean_u - acc_mean_u)
                * nbd
                / F.lit(1_000_000.0)
            ).cast("long")
        )
        .cast("long")
        .alias("rel_u"),
        F.sum(
            F.round(
                (acc_mean_u - base_u)
                * (acc_mean_u - base_u)
                * nbd
                / F.lit(1_000_000.0)
            ).cast("long")
        )
        .cast("long")
        .alias("res_u"),
    )
    base = F.col("pos").cast("double") / F.col("n").cast("double")
    return brier.crossJoin(dec).select(
        F.round(
            F.col("se_sum_u").cast("double")
            / (F.col("n").cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("brier"),
        F.round(
            F.col("rel_u").cast("double")
            / (F.col("n").cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("reliability"),
        F.round(
            F.col("res_u").cast("double")
            / (F.col("n").cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("resolution"),
        F.round(base * (F.lit(1.0) - base), 6).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# Polynomial-kernel MMD two-sample test in exact moment form
# ---------------------------------------------------------------------------

_MMD_S2 = 10_000.0  # kernel bandwidth^2 in kilodollar^2


@gate(
    "mmd_poly_two_sample",
    oracle=f"""
    WITH base AS (
      SELECT CAST(round(o_totalprice / 1000.0) AS BIGINT) AS v,
             (CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS g
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    mom AS (
      SELECT g,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s1,
             CAST(sum(v * v) AS BIGINT) AS s2,
             CAST(sum(v * v * v) AS BIGINT) AS s3,
             CAST(sum(v * v * v * v) AS BIGINT) AS s4
      FROM base GROUP BY g
    ),
    x AS (SELECT * FROM mom WHERE g = 1),
    y AS (SELECT * FROM mom WHERE g = 0),
    terms AS (
      SELECT
        ((CAST(x.s2 AS DOUBLE) * CAST(x.s2 AS DOUBLE)
          - CAST(x.s4 AS DOUBLE)) / {_MMD_S2 * _MMD_S2!r}
         + 2.0 * (CAST(x.s1 AS DOUBLE) * CAST(x.s1 AS DOUBLE)
                  - CAST(x.s2 AS DOUBLE)) / {_MMD_S2!r}
         + CAST(x.n * (x.n - 1) AS DOUBLE))
          / CAST(x.n * (x.n - 1) AS DOUBLE) AS kxx,
        ((CAST(y.s2 AS DOUBLE) * CAST(y.s2 AS DOUBLE)
          - CAST(y.s4 AS DOUBLE)) / {_MMD_S2 * _MMD_S2!r}
         + 2.0 * (CAST(y.s1 AS DOUBLE) * CAST(y.s1 AS DOUBLE)
                  - CAST(y.s2 AS DOUBLE)) / {_MMD_S2!r}
         + CAST(y.n * (y.n - 1) AS DOUBLE))
          / CAST(y.n * (y.n - 1) AS DOUBLE) AS kyy,
        ((CAST(x.s2 AS DOUBLE) * CAST(y.s2 AS DOUBLE)) / {_MMD_S2 * _MMD_S2!r}
         + 2.0 * (CAST(x.s1 AS DOUBLE) * CAST(y.s1 AS DOUBLE)) / {_MMD_S2!r}
         + CAST(x.n * y.n AS DOUBLE))
          / CAST(x.n * y.n AS DOUBLE) AS kxy,
        x.n AS nx, y.n AS ny
      FROM x, y
    )
    SELECT CAST(nx AS BIGINT) AS nx, CAST(ny AS BIGINT) AS ny,
           round(kxx, 6) AS kxx, round(kyy, 6) AS kyy, round(kxy, 6) AS kxy,
           round(kxx + kyy - 2.0 * kxy, 6) AS mmd2
    FROM terms
    """,
)
def q_mmd_poly_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased MMD^2 two-sample test with the quadratic kernel
    k(a,b) = (ab/s^2 + 1)^2, URGENT vs LOW order values: because the
    kernel is polynomial, every pair expectation expands EXACTLY into
    1st/2nd/4th moment sums — E[k(x,x')] over i!=j is
    ((S2^2 - S4)/s^4 + 2(S1^2 - S2)/s^2 + n(n-1)) / (n(n-1)) — so the
    "kernel matrix" never exists: ONE aggregation pass, six BIGINT
    moments, constant driver work.  This is the 100 TB form of a kernel
    two-sample test (Gaussian-kernel MMD needs the pair join; the
    polynomial embedding is the moment shortcut).

    Kilodollar integer values keep sum(v^4) inside BIGINT (v <= ~500 =>
    v^4 <= 6.25e10; 1e8 rows => ~6e18, the documented bound).
    """
    od = load_table(spark, sf_dir, "orders")
    base = od.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.round(F.col("o_totalprice") / F.lit(1000.0)).cast("long").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("g"),
    )
    v = F.col("v")
    mom = base.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(v).cast("long").alias("s1"),
        F.sum(v * v).cast("long").alias("s2"),
        F.sum(v * v * v).cast("long").alias("s3"),
        F.sum(v * v * v * v).cast("long").alias("s4"),
    )
    # the x/y branches below would each re-run the scan+aggregate
    mom.cache()
    x = mom.filter(F.col("g") == 1).alias("x")
    y = mom.filter(F.col("g") == 0).alias("y")
    s2 = F.lit(_MMD_S2)
    s4 = F.lit(_MMD_S2 * _MMD_S2)

    def within(side: str):
        s1c = F.col(f"{side}.s1").cast("double")
        s2c = F.col(f"{side}.s2").cast("double")
        s4c = F.col(f"{side}.s4").cast("double")
        nn = (F.col(f"{side}.n") * (F.col(f"{side}.n") - 1)).cast("double")
        return (
            (s2c * s2c - s4c) / s4 + F.lit(2.0) * (s1c * s1c - s2c) / s2 + nn
        ) / nn

    kxy = (
        (F.col("x.s2").cast("double") * F.col("y.s2").cast("double")) / s4
        + F.lit(2.0)
        * (F.col("x.s1").cast("double") * F.col("y.s1").cast("double"))
        / s2
        + (F.col("x.n") * F.col("y.n")).cast("double")
    ) / (F.col("x.n") * F.col("y.n")).cast("double")
    out = x.crossJoin(y).select(
        F.col("x.n").alias("nx"),
        F.col("y.n").alias("ny"),
        F.round(within("x"), 6).alias("kxx"),
        F.round(within("y"), 6).alias("kyy"),
        F.round(kxy, 6).alias("kxy"),
        F.round(within("x") + within("y") - F.lit(2.0) * kxy, 6).alias("mmd2"),
    )
    return out


@gate(
    "decile_lift_histogram",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(floor((1.0 / (1.0 + exp(-(({_ECE_B0!r} + ({_ECE_BQ!r} * l_quantity))
                     + ({_ECE_BD!r} * l_discount))))) * 1000000.0 + 0.5)
               AS BIGINT) AS p_u,
             (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
      FROM lineitem
    ),
    hist AS (
      SELECT p_u, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS r
      FROM scored GROUP BY p_u
    ),
    cum AS (
      SELECT p_u, c, r,
             sum(c) OVER (ORDER BY p_u DESC ROWS UNBOUNDED PRECEDING) - c
               AS cum_before,
             sum(c) OVER () AS n
      FROM hist
    ),
    assigned AS (
      SELECT (cum_before * 10) // n + 1 AS decile, c, r FROM cum
    ),
    per AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(sum(c) AS BIGINT) AS n_d,
             CAST(sum(r) AS BIGINT) AS resp
      FROM assigned GROUP BY 1
    ),
    lift AS (
      SELECT decile, n_d, resp,
             sum(n_d) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cn,
             sum(resp) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cr,
             sum(n_d) OVER () AS tn, sum(resp) OVER () AS tr
      FROM per
    )
    SELECT decile, n_d, resp,
           round(CAST(resp AS DOUBLE) / CAST(n_d AS DOUBLE), 6) AS resp_rate,
           round((CAST(cr AS DOUBLE) / CAST(cn AS DOUBLE))
                 / (CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS cum_lift
    FROM lift
    """,
)
def q_decile_lift_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decile lift table WITHOUT the exact-ntile global row sort —
    the 100 TB form that closes decile_lift_table's documented caveat
    (its sf10 probe showed the ntile sort as the only cost): scores are
    already on the 1e-6 micro grid, so the histogram over DISTINCT
    score values (domain-bounded at <= 1e6+1 rows, independent of row
    count) plus a descending prefix sum assigns every score bucket to
    the decile of its FIRST row, decile = (rows_before*10)//n + 1.
    Whole buckets never split (boundary ties go to the higher-score
    decile with their entire bucket — deterministic, and the honest
    semantics when scores tie), so decile sizes are equal only up to
    bucket granularity; rates and cumulative lift are exact BIGINT
    ratios of the assigned buckets.  Windows run over the score DOMAIN,
    never over rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    margin = (
        F.lit(_ECE_B0) + (F.lit(_ECE_BQ) * F.col("l_quantity"))
    ) + (F.lit(_ECE_BD) * F.col("l_discount"))
    p_u = F.floor(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    scored = li.select(
        p_u.alias("p_u"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("p_u").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("y").cast("long").alias("r"),
    )
    wdesc = Window.orderBy(F.col("p_u").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = hist.select(
        "p_u",
        "c",
        "r",
        (F.sum("c").over(wdesc) - F.col("c")).alias("cum_before"),
        F.sum("c").over(wall).alias("n"),
    )
    assigned = cum.select(
        (F.expr("(cum_before * 10) div n") + 1).alias("decile"), "c", "r"
    )
    per = assigned.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.sum("c").cast("long").alias("n_d"),
        F.sum("r").cast("long").alias("resp"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lift = per.select(
        "decile",
        "n_d",
        "resp",
        F.sum("n_d").over(wc).alias("cn"),
        F.sum("resp").over(wc).alias("cr"),
        F.sum("n_d").over(wall).alias("tn"),
        F.sum("resp").over(wall).alias("tr"),
    )
    return lift.select(
        "decile",
        "n_d",
        "resp",
        F.round(F.col("resp").cast("double") / F.col("n_d").cast("double"), 6)
        .alias("resp_rate"),
        F.round(
            (F.col("cr").cast("double") / F.col("cn").cast("double"))
            / (F.col("tr").cast("double") / F.col("tn").cast("double")),
            6,
        ).alias("cum_lift"),
    )
