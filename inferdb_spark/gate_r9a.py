"""Round-9 STAGED gates, batch 1: the IVF-shortlisted ranking evaluation —
the scale default the round-7 verdict asked for (#6).

`ranking_eval_metrics` (gate_r5c) evaluates retrieval EXACTLY: every query
scores every candidate, quadratic by construction (sf1: 800 x 19k pairs =
141 s).  This gate runs the same metric relations
(operators/rank_metrics.ranking_metrics) over an IVF-shortlisted candidate
set instead: candidates are assigned to N_LISTS literal coarse-quantizer
cells, each query scores only its N_PROBE nearest cells, and n_rel is
normalized by a LINEAR label-count join — the plan a 100 TB corpus needs
(partition-prune the probed lists; no all-pairs stage anywhere).  Recall
vs the exact path is measured by tools/ann_recall_report.py and recorded
in BASELINE.md, not assumed.

Reference parity: evaluates the retrieval stage the reference's benchmark
queries score with brute-force scans (src/experiments — no ANN path at
all); the IVF shortlist is this repo's documented scale substitution.

Cross-engine determinism (the ivf_search pattern, gate_prep.py): literal
centroids burned into both dialects; squared-L2 folds written with the
same element order on both sides; cell assignment = lexicographic min of
(distance, index) structs, so ties break to the lowest list id in both
engines; cosine rounded to 6dp before ranking; (cos6 DESC, cid ASC) total
order; all metric arithmetic in integer micro-units (shared _RANK_* SQL
constants from gate_r5c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.functions.vector import as_double_array, l2_norm
from inferdb_spark.gate import gate
from inferdb_spark.gate_r5c import (
    _RANK_DISC_SQL,
    _RANK_IDCG_SQL,
    _RANK_MRR_SQL,
)
from inferdb_spark.operators import similarity as SIM
from inferdb_spark.operators.rank_metrics import RANK_K, ivf_shortlisted_eval

assert RANK_K == 10  # the imported oracle literals are generated for k=10

EMB_DIM = 64
N_LISTS = 16
N_PROBE = 2
RANKIVF_CENTROIDS = SIM.make_hyperplanes(N_LISTS, EMB_DIM, seed=1234)

_cent_sql = ["[" + ", ".join(repr(x) for x in c) + "]" for c in RANKIVF_CENTROIDS]


def _d2(cs: str) -> str:
    """squared-L2 of the row's double-list `v` vs a literal centroid —
    the exact element order of similarity.ivf_assign's zip_with fold."""
    return (
        f"list_sum(list_transform(generate_series(1, {EMB_DIM}),"
        f" i -> (v[i] - ({cs})[i]) * (v[i] - ({cs})[i])))"
    )


# list of (distance, index) structs; lexicographic list_sort = the
# array_sort of ivf_probe_cells' (d, list_id) structs on the Spark side
_DI_STRUCTS = "[" + ", ".join(
    f"{{'d': {_d2(cs)}, 'i': {i}}}" for i, cs in enumerate(_cent_sql)
) + "]"

_RANKIVF_ORACLE = f"""
WITH base AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
nb AS (
  SELECT vec_id, label, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM base
),
q AS (
  SELECT *, list_transform(
           list_slice(list_sort({_DI_STRUCTS}), 1, {N_PROBE}), s -> s.i
         ) AS probe
  FROM nb WHERE vec_id % 25 = 0
),
c AS (
  SELECT *, list_sort({_DI_STRUCTS})[1].i AS list_id
  FROM nb WHERE vec_id % 25 <> 0
),
p AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS rel,
         round(CASE WHEN q.nrm > 0 AND c.nrm > 0
               THEN list_sum(list_transform(generate_series(1, {EMB_DIM}),
                    i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm)
               ELSE 0.0 END, 6) AS cos6
  FROM q JOIN c ON list_contains(q.probe, c.list_id)
),
lc AS (
  SELECT label AS lbl, CAST(count(*) AS BIGINT) AS n
  FROM nb WHERE vec_id % 25 <> 0 GROUP BY label
),
rr AS (
  SELECT q.vec_id AS qid, CAST(COALESCE(lc.n, 0) AS BIGINT) AS n_rel
  FROM q LEFT JOIN lc ON q.label = lc.lbl
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos6 DESC, cid ASC) AS rnk
  FROM p
),
top AS (
  SELECT qid, cid, rel, rnk,
         SUM(rel) OVER (PARTITION BY qid ORDER BY rnk) AS cum
  FROM rk WHERE rnk <= {RANK_K}
),
m AS (
  SELECT qid,
         CAST(SUM(rel * ({_RANK_DISC_SQL})) AS BIGINT) AS dcg,
         MIN(CASE WHEN rel = 1 THEN rnk END) AS frank,
         CAST(SUM(CASE WHEN rel = 1
              THEN CAST(floor((1000000.0 * cum) / rnk) AS BIGINT)
              ELSE 0 END) AS BIGINT) AS ap_num
  FROM top GROUP BY qid
)
SELECT rr.qid, rr.n_rel,
  CAST(CASE WHEN rr.n_rel = 0 THEN 0.0
       ELSE round(CAST(m.dcg AS DOUBLE) / ({_RANK_IDCG_SQL}), 6) END AS DOUBLE) AS ndcg6,
  CAST({_RANK_MRR_SQL} AS DOUBLE) AS mrr6,
  CAST(CASE WHEN rr.n_rel = 0 THEN 0.0
       ELSE round(CAST(m.ap_num AS DOUBLE)
                  / (CAST(LEAST(rr.n_rel, 10) AS DOUBLE) * 1000000.0), 6)
       END AS DOUBLE) AS ap6
FROM rr JOIN m ON rr.qid = m.qid
ORDER BY rr.qid
"""


@gate("ranking_eval_ivf", oracle=_RANKIVF_ORACLE)
def q_ranking_eval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 / MRR / MAP@10 with IVF-shortlisted candidates: each query
    scores only its 2 nearest of 16 coarse-quantizer cells (~1/8 of the
    all-pairs work; the ratio holds at any corpus size, and on a real
    cluster the probed lists are partition-pruned at the scan).  Shares
    the metric relations with the exact gate; with n_probe = N_LISTS the
    output equals the exact path row-for-row
    (tests/test_rank_metrics.py)."""
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
    return ivf_shortlisted_eval(
        F.broadcast(qs), cs, RANKIVF_CENTROIDS, n_probe=N_PROBE, k=RANK_K
    ).select("qid", "n_rel", "ndcg6", "mrr6", F.col("map6").alias("ap6"))
