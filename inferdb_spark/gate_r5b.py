"""Round-5 gates, batch 2: warehouse temporal modeling (SCD2), classic
recommender neighbors (item-item CF), survival analysis (Kaplan-Meier),
ordered exponential smoothing (EWMA), experimentation stats (two-
proportion z-test), and jackknife variance estimation.

All beyond-reference extensions of the analytics surface; the reference's
own model stops at flat relational scoring (src/transpiler.py).  Cross-
engine rules per gate.py: epoch-microsecond orderings, integer cents,
micro-nat/micro-unit quantization before any sum, 6dp rounds on the one
transcendental per value, written-order double arithmetic, lowest-value
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.functions.hashing import duckdb_h52, h52
from inferdb_spark.gate import gate

# ---------------------------------------------------------------------------
# SCD2 interval construction from a change log: the warehouse "type-2
# dimension" build (collapse consecutive duplicate attribute values, then
# [valid_from, valid_to) intervals with an is_current flag).  One shuffle
# (user), two windows over it.


@gate(
    "scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type AS val,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_id, tsu, val FROM ordered
      WHERE prev IS NULL OR prev <> val
    )
    SELECT user_id, CAST(tsu AS BIGINT) AS valid_from,
           CAST(lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
                AS BIGINT) AS valid_to,
           val,
           CAST(CASE WHEN lead(tsu) OVER (PARTITION BY user_id
                                          ORDER BY tsu, event_id) IS NULL
                THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM changes
    ORDER BY user_id, valid_from
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an event change log: per
    user, consecutive duplicate attribute values collapse (lag filter),
    surviving change points become [valid_from, valid_to) micro-second
    intervals, open interval = is_current.  The CDC complement of
    cdc_apply_changes: that gate applies a delta to a snapshot; this one
    HISTORIZES the log.  One user-partitioned shuffle; both windows reuse
    it (no extra exchange)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tsu"),
        F.col("event_type").alias("val"),
        F.lag("event_type").over(w).alias("prev"),
    )
    changes = ordered.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("val"))
    )
    w2 = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    lead_tsu = F.lead("tsu").over(w2)
    return changes.select(
        "user_id",
        F.col("tsu").cast("long").alias("valid_from"),
        lead_tsu.cast("long").alias("valid_to"),
        "val",
        F.when(lead_tsu.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
    ).orderBy("user_id", "valid_from")


# ---------------------------------------------------------------------------
# Item-item collaborative-filtering neighbors (the memory-based
# recommender classic; the relational sibling of mf_train_replay's latent
# factors).  Degree-capped co-rating join so the pair space is bounded —
# the DIMSUM-style discipline that makes this viable at 100 TB.

II_CAP = 32  # per-user top items entering the pair join
II_TOPK = 5


@gate(
    "item_item_topk",
    oracle=f"""
    WITH ratings AS (
      SELECT o_custkey AS u, l_partkey AS it, CAST(count(*) AS BIGINT) AS cnt
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ),
    capped AS (
      SELECT u, it, cnt FROM (
        SELECT u, it, cnt,
               row_number() OVER (PARTITION BY u ORDER BY cnt DESC, it ASC) AS rk
        FROM ratings
      ) WHERE rk <= {II_CAP}
    ),
    norms AS (
      SELECT it, CAST(sum(cnt * cnt) AS BIGINT) AS nrm FROM capped GROUP BY it
    ),
    pairs AS (
      SELECT a.it AS i, b.it AS j, CAST(sum(a.cnt * b.cnt) AS BIGINT) AS num
      FROM capped a JOIN capped b ON a.u = b.u AND a.it < b.it
      GROUP BY 1, 2
    ),
    sym AS (
      SELECT i, j, num FROM pairs
      UNION ALL SELECT j AS i, i AS j, num FROM pairs
    ),
    scored AS (
      SELECT s.i, s.j, s.num,
             CAST(round(CAST(s.num AS DOUBLE) /
                        sqrt(CAST(ni.nrm * nj.nrm AS DOUBLE)), 6) AS DOUBLE)
               AS cos6
      FROM sym s JOIN norms ni ON s.i = ni.it JOIN norms nj ON s.j = nj.it
    )
    SELECT i, j, num, cos6, CAST(rk AS BIGINT) AS rk FROM (
      SELECT i, j, num, cos6,
             row_number() OVER (PARTITION BY i ORDER BY cos6 DESC, j ASC) AS rk
      FROM scored
    ) WHERE rk <= {II_TOPK}
    ORDER BY i, rk
    """,
)
def q_item_item_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine neighbors over implicit feedback (customer×part
    purchase counts): per-user degree cap ({II_CAP}) bounds the co-rating
    self-join to cap²/2 pairs per user, integer co-count numerators and
    norms stay exact BIGINTs, cosine takes ONE sqrt per pair (6dp), top-k
    per item with (cos6 DESC, j ASC) ties.  The join is a shuffled equi-
    join on the user key — no all-pairs anywhere."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ratings = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wu = Window.partitionBy("u").orderBy(F.col("cnt").desc(), F.col("it").asc())
    capped = (
        ratings.withColumn("rk", F.row_number().over(wu))
        .filter(F.col("rk") <= II_CAP)
        .drop("rk")
    )
    norms = capped.groupBy(F.col("it")).agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("nrm")
    )
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.it") < F.col("b.it")))
        .groupBy(F.col("a.it").alias("i"), F.col("b.it").alias("j"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("num"))
    )
    sym = pairs.unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "num")
    )
    ni = norms.select(F.col("it").alias("i"), F.col("nrm").alias("ni"))
    nj = norms.select(F.col("it").alias("j"), F.col("nrm").alias("nj"))
    scored = (
        sym.join(ni, "i")
        .join(nj, "j")
        .select(
            "i",
            "j",
            "num",
            F.round(
                F.col("num").cast("double")
                / F.sqrt((F.col("ni") * F.col("nj")).cast("double")),
                6,
            )
            .cast("double")
            .alias("cos6"),
        )
    )
    wi = Window.partitionBy("i").orderBy(F.col("cos6").desc(), F.col("j").asc())
    return (
        scored.withColumn("rk", F.row_number().over(wi))
        .filter(F.col("rk") <= II_TOPK)
        .select("i", "j", "num", "cos6", F.col("rk").cast("long").alias("rk"))
        .orderBy("i", "rk")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve (right-censored): per-duration death/censor
# counts, at-risk by cumulative subtraction, and the survival product in
# EXACT integer micro-nat log space (one ln per distinct duration, summed
# as BIGINTs, one exp at the end).  The cumulative windows run over the
# per-duration relation — bounded by the number of DISTINCT durations,
# not by subjects (the gate_dss.q_cumulative_distinct_users standard).

KM_CENSOR_US = 14 * 86_400_000_000  # last 14 days = censored


@gate(
    "kaplan_meier",
    oracle=f"""
    WITH subj AS (
      SELECT user_id, min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
      FROM events GROUP BY user_id
    ),
    gmax AS (SELECT max(last_us) AS m FROM subj),
    durs AS (
      SELECT CAST((last_us - first_us) // 86400000000 AS BIGINT) AS t,
             CASE WHEN last_us < gmax.m - {KM_CENSOR_US} THEN 1 ELSE 0 END AS obs
      FROM subj CROSS JOIN gmax
    ),
    per_t AS (
      SELECT t, CAST(sum(obs) AS BIGINT) AS d,
             CAST(sum(1 - obs) AS BIGINT) AS c
      FROM durs GROUP BY t
    ),
    risk AS (
      SELECT t, d, c,
             CAST((SELECT count(*) FROM durs) -
                  coalesce(sum(d + c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM per_t
    ),
    terms AS (
      SELECT t, d, c, n_risk,
             CASE WHEN d = 0 THEN 0
                  WHEN d = n_risk THEN NULL
                  ELSE CAST(floor(ln(CAST(n_risk - d AS DOUBLE) /
                                     CAST(n_risk AS DOUBLE)) * 1000000.0 + 0.5)
                       AS BIGINT) END AS term,
             max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS zflag
      FROM risk
    )
    SELECT t, d, c, n_risk,
           CAST(CASE WHEN zflag = 1 THEN 0.0
                ELSE round(exp(CAST(sum(term) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / 1000000.0), 6) END AS DOUBLE) AS surv6
    FROM terms
    ORDER BY t
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimator over user activity lifetimes (duration =
    days between first and last event; users active in the final 14 days
    are right-censored): S(t) = Π (1 − d/n) computed as an exact BIGINT
    micro-nat cumulative sum (one ln per distinct duration), absorbing
    zero once n_t = d_t.  All windows run over the per-duration relation
    (≤ distinct-duration rows)."""
    ev = load_table(spark, sf_dir, "events")
    subj = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("first_us"),
        F.max(F.unix_micros("ts")).alias("last_us"),
    )
    gmax = subj.agg(F.max("last_us").alias("m"))
    durs = subj.crossJoin(F.broadcast(gmax)).select(
        F.floor((F.col("last_us") - F.col("first_us")) / 86_400_000_000)
        .cast("long")
        .alias("t"),
        F.when(F.col("last_us") < F.col("m") - KM_CENSOR_US, 1)
        .otherwise(0)
        .alias("obs"),
    )
    n_total = durs.count()
    per_t = durs.groupBy("t").agg(
        F.sum("obs").cast("long").alias("d"),
        F.sum(1 - F.col("obs")).cast("long").alias("c"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.withColumn(
        "n_risk",
        (
            F.lit(n_total)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).cast("long"),
    )
    term = (
        F.when(F.col("d") == 0, F.lit(0))
        .when(F.col("d") == F.col("n_risk"), F.lit(None))
        .otherwise(
            F.floor(
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk").cast("double")
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("long")
        )
    )
    terms = risk.withColumn("term", term).withColumn(
        "zflag",
        F.max(F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)).over(w_cum),
    )
    return terms.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.when(F.col("zflag") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(F.sum("term").over(w_cum).cast("double") / F.lit(1000000.0)),
                6,
            )
        )
        .cast("double")
        .alias("surv6"),
    ).orderBy("t")


# ---------------------------------------------------------------------------
# EWMA exponential smoothing per key, alpha = 1/2 (exact in binary):
# the sequential recurrence y_t = a*x_t + (1-a)*y_{t-1} folded as ONE
# aggregate-HOF projection over the time-ordered value list (the
# unigram_viterbi pattern) — no iterative joins, one shuffle.


@gate(
    "ewma_smoothing",
    oracle="""
    WITH lists AS (
      SELECT user_id,
             list(CAST(round(value * 100) AS BIGINT) / 100.0
                  ORDER BY epoch_us(ts), event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(len(vals) AS BIGINT) AS n,
           CAST(round(list_reduce(vals, (acc, x) -> 0.5 * x + 0.5 * acc), 6)
                AS DOUBLE) AS ewma6
    FROM lists ORDER BY user_id
    """,
)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha = 0.5) of the event value stream: values are
    cent-snapped, time-ordered into an array, and the recurrence folds in
    ONE codegen'd aggregate expression — 0.5 multiplies are exact in
    binary and the fold order is identical on both engines, so the result
    is bit-stable before the final 6dp round.  One groupBy shuffle total;
    state per key is the value list (bounded by per-key event counts —
    the applyInPandasWithState streaming twin handles unbounded keys)."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.round(F.col("value") * 100).cast("long") / F.lit(100.0)).alias("v")
    lists = (
        ev.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("tsu"),
                F.col("event_id").alias("eid"),
                cents,
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
        .select(
            "user_id",
            F.transform(F.col("ss"), lambda s: s["v"]).alias("vals"),
        )
    )
    folded = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
    )
    return lists.select(
        "user_id",
        F.size("vals").cast("long").alias("n"),
        F.round(folded, 6).cast("double").alias("ewma6"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B experiment readout): h52 assignment,
# conversion = any order over the threshold, pooled-variance z with the
# whole formula in written-order doubles from exact BIGINT counts.

AB_THRESHOLD = 300_000.0


@gate(
    "ab_test_ztest",
    oracle=f"""
    WITH assign AS (
      SELECT c_custkey, {duckdb_h52("'ab' || CAST(c_custkey AS VARCHAR)")} % 2
               AS variant
      FROM customer
    ),
    conv AS (
      SELECT a.c_custkey, a.variant,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = a.c_custkey
                                 AND o.o_totalprice > {AB_THRESHOLD!r})
                  THEN 1 ELSE 0 END AS converted
      FROM assign a
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS x_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS x_b
      FROM conv
    )
    SELECT n_a, x_a, n_b, x_b,
           CAST(round(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS DOUBLE) AS p_a6,
           CAST(round(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS DOUBLE) AS p_b6,
           CAST(round(
             ((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)) -
              (CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))) /
             sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
                  (1.0 - (CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))) *
                  ((1.0 / CAST(n_a AS DOUBLE)) + (1.0 / CAST(n_b AS DOUBLE)))),
             6) AS DOUBLE) AS z6
    FROM agg
    """,
)
def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic h52 variant assignment,
    conversion = any order above the threshold (left-semi probe), exact
    BIGINT counts, then the pooled two-proportion z statistic evaluated
    with IDENTICAL written-order double arithmetic on both engines (6dp).
    One semi join + one aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    assign = c.select(
        "c_custkey",
        (h52(F.concat(F.lit("ab"), F.col("c_custkey").cast("string"))) % 2).alias(
            "variant"
        ),
    )
    converters = (
        o.filter(F.col("o_totalprice") > AB_THRESHOLD)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    conv = assign.join(converters, "c_custkey", "left").select(
        "variant", F.coalesce(F.col("converted"), F.lit(0)).alias("converted")
    )
    agg = conv.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x_b"),
    )
    pa = F.col("x_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("x_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (pa - pb) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            (F.lit(1.0) / F.col("n_a").cast("double"))
            + (F.lit(1.0) / F.col("n_b").cast("double"))
        )
    )
    return agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(pa, 6).cast("double").alias("p_a6"),
        F.round(pb, 6).cast("double").alias("p_b6"),
        F.round(z, 6).cast("double").alias("z6"),
    )


# ---------------------------------------------------------------------------
# Delete-one-group jackknife variance of the mean (the resampling
# companion of cv_leave_fold_out): G hash groups, each leave-one-out mean
# from the total-minus-group identity in exact cents, then the variance
# numerator Σ(G·θ_g − Σθ)² stays a BIGINT — one double sqrt at the end.

JK_GROUPS = 20


@gate(
    "jackknife_variance",
    oracle=f"""
    WITH base AS (
      SELECT ({duckdb_h52("'jk' || CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)")}
                % {JK_GROUPS}) AS g,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    per_g AS (
      SELECT g, CAST(sum(cents) AS BIGINT) AS s_g, CAST(count(*) AS BIGINT) AS n_g
      FROM base GROUP BY g
    ),
    tot AS (SELECT CAST(sum(s_g) AS BIGINT) AS s, CAST(sum(n_g) AS BIGINT) AS n
            FROM per_g),
    theta AS (
      SELECT g, n_g,
             CAST(floor(CAST(t.s - p.s_g AS DOUBLE) /
                        CAST(t.n - p.n_g AS DOUBLE) + 0.5) AS BIGINT) AS theta_c
      FROM per_g p CROSS JOIN tot t
    ),
    summary AS (
      SELECT CAST(sum(theta_c) AS BIGINT) AS sum_theta,
             CAST(sum(({JK_GROUPS} * theta_c -
                       (SELECT sum(theta_c) FROM theta)) *
                      ({JK_GROUPS} * theta_c -
                       (SELECT sum(theta_c) FROM theta))) AS BIGINT) AS varnum
      FROM theta
    )
    SELECT t.g, t.n_g, t.theta_c,
           CAST(round(sqrt({float(JK_GROUPS - 1)!r} * CAST(s.varnum AS DOUBLE) /
                           {float(JK_GROUPS**3)!r}), 6) AS DOUBLE) AS se_jack6
    FROM theta t CROSS JOIN summary s
    ORDER BY t.g
    """,
)
def q_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife standard error of the mean price: G=20
    h52 groups, leave-one-out means via total-minus-group (exact cents,
    floor-snapped), variance numerator Σ(G·θ_g − Σθ)² as a BIGINT, and
    se = sqrt((G−1)·varnum / G³) — ONE transcendental, 6dp.  Distribution-
    free uncertainty for any plug-in statistic at one-aggregation cost."""
    li = load_table(spark, sf_dir, "lineitem")
    rid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    base = li.select(
        (h52(F.concat(F.lit("jk"), rid)) % JK_GROUPS).alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    per_g = base.groupBy("g").agg(
        F.sum("cents").alias("s_g"), F.count(F.lit(1)).alias("n_g")
    )
    tot = per_g.agg(F.sum("s_g").alias("s"), F.sum("n_g").alias("n"))
    theta = per_g.crossJoin(F.broadcast(tot)).select(
        "g",
        F.col("n_g").cast("long").alias("n_g"),
        F.floor(
            (F.col("s") - F.col("s_g")).cast("double")
            / (F.col("n") - F.col("n_g")).cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("theta_c"),
    )
    st = theta.agg(F.sum("theta_c").alias("sum_theta"))
    with_sum = theta.crossJoin(F.broadcast(st))
    dev = F.lit(JK_GROUPS) * F.col("theta_c") - F.col("sum_theta")
    summary = with_sum.agg(F.sum(dev * dev).cast("long").alias("varnum"))
    return (
        theta.crossJoin(F.broadcast(summary))
        .select(
            "g",
            "n_g",
            "theta_c",
            F.round(
                F.sqrt(
                    F.lit(float(JK_GROUPS - 1))
                    * F.col("varnum").cast("double")
                    / F.lit(float(JK_GROUPS**3))
                ),
                6,
            )
            .cast("double")
            .alias("se_jack6"),
        )
        .orderBy("g")
    )


# ---------------------------------------------------------------------------
# Dominant-eigenvector power iteration over the item co-purchase gram —
# spectral methods as iterative relational linear algebra (the
# graph.pagerank_integer pattern applied to an eigen problem).  Max-norm
# normalization keeps every step in exact integer micro-units with ONE
# double division per item per step (no sqrt anywhere).

PI_STEPS = 3
PI_MOD = 10  # partkey % PI_MOD == 0 bounds the item set (oracle CTE size)


@gate(
    "power_iteration_eigen",
    oracle=f"""
    WITH ratings AS (
      SELECT o_custkey AS u, l_partkey AS it, CAST(count(*) AS BIGINT) AS cnt
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_partkey % {PI_MOD} = 0
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.it AS i, b.it AS j, CAST(sum(a.cnt * b.cnt) AS BIGINT) AS w
      FROM ratings a JOIN ratings b ON a.u = b.u AND a.it < b.it
      GROUP BY 1, 2
    ),
    diag AS (
      SELECT it AS i, it AS j, CAST(sum(cnt * cnt) AS BIGINT) AS w
      FROM ratings GROUP BY it
    ),
    gram AS MATERIALIZED (
      SELECT i, j, w FROM pairs
      UNION ALL SELECT j AS i, i AS j, w FROM pairs
      UNION ALL SELECT i, j, w FROM diag
    ),
    items AS (SELECT DISTINCT i AS it FROM gram),
    v0 AS (SELECT it, CAST(1000000 AS BIGINT) AS vq FROM items),
    {", ".join(
        f'''w{t} AS MATERIALIZED (
          SELECT g.i AS it, CAST(sum(g.w * v.vq) AS BIGINT) AS wq
          FROM gram g JOIN v{t} v ON g.j = v.it GROUP BY g.i
        ),
        m{t} AS MATERIALIZED (SELECT max(wq) AS m FROM w{t}),
        v{t + 1} AS MATERIALIZED (
          SELECT it, CAST(floor(CAST(wq AS DOUBLE) * 1000000.0 /
                                CAST(m.m AS DOUBLE) + 0.5) AS BIGINT) AS vq
          FROM w{t} CROSS JOIN m{t} m
        )'''
        for t in range(PI_STEPS)
    )}
    SELECT it, vq FROM v{PI_STEPS} ORDER BY it
    """,
)
def q_power_iteration_eigen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant eigenvector of the item co-purchase gram by {PI_STEPS}
    power-iteration steps, entirely relational: each step is one
    matmul-as-join (gram ⋈ vector on the column key, groupBy row key) +
    a broadcast max-norm scalar; the vector stays in exact BIGINT
    micro-units (floor-snapped after the single double division).  The
    spectral sibling of pagerank_supplier_part — eigen-centrality /
    spectral-embedding coordinates without any linear-algebra runtime.
    Scale: the gram is sparse and shuffle-partitioned on its keys; the
    vector is one row per item; steps chain localCheckpoints."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % PI_MOD == 0
    )
    ratings = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    a, b = ratings.alias("a"), ratings.alias("b")
    pairs = (
        a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.it") < F.col("b.it")))
        .groupBy(F.col("a.it").alias("i"), F.col("b.it").alias("j"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("w"))
    )
    diag = ratings.groupBy(F.col("it").alias("i")).agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("w")
    ).select("i", F.col("i").alias("j"), "w")
    gram = (
        pairs.unionByName(
            pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "w")
        )
        .unionByName(diag)
        .localCheckpoint(eager=True)
    )
    v = gram.select(F.col("i").alias("it")).distinct().withColumn(
        "vq", F.lit(1_000_000).cast("long")
    )
    for _ in range(PI_STEPS):
        w = (
            gram.join(v, gram["j"] == v["it"])
            .groupBy(F.col("i").alias("nit"))
            .agg(F.sum(F.col("w") * F.col("vq")).cast("long").alias("wq"))
        )
        m = w.agg(F.max("wq").alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                F.col("nit").alias("it"),
                F.floor(
                    F.col("wq").cast("double") * F.lit(1000000.0)
                    / F.col("m").cast("double")
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("vq"),
            )
            .localCheckpoint(eager=True)
        )
    return v.orderBy("it")
