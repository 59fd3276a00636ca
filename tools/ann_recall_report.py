#!/usr/bin/env python3
"""ANN recall@k report: measure every approximate index tier against
exact brute-force cosine on the same embeddings table.

Usage: python3 tools/ann_recall_report.py [sf_dir] [--queries N] [--k K]

For N deterministic query vectors drawn from the table itself
(vec_id ≡ 0 mod step — a held-in probe set, the standard recall
protocol), computes exact top-k (cosine_topk) as ground truth and
reports mean/min recall@k for:

  - LSH hyperplane buckets (16 planes)
  - IVF, n_probe ∈ {1, 2, 4} of 16 lists
  - IVF-PQ (same probes, 8×16 codebooks, ADC ranking)
  - SQ8 exact-integer quantized dot product (full scan, rank fidelity
    rather than candidate pruning)

Numbers are recorded per-round in BASELINE.md ("ANN recall" section) so
a recall regression is as visible as a latency one.  The probe set and
every fit are seeded/deterministic — reruns are comparable.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def recall(got_ids: list[int], truth_ids: list[int]) -> float:
    return len(set(got_ids) & set(truth_ids)) / max(len(truth_ids), 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from inferdb_spark.catalog import load_table
    from inferdb_spark.operators import similarity as S
    from inferdb_spark.session import get_spark

    spark = get_spark("ann-recall")
    emb = load_table(spark, args.sf_dir, "embeddings").persist()
    n_rows = emb.count()
    step = max(n_rows // args.queries, 1)
    probes = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") % step == 0)
        .orderBy("vec_id")
        .limit(args.queries)
        .collect()
    ]

    planes = S.make_hyperplanes(16, 64)
    centroids = S.fit_ivf_centroids(emb, "embedding", n_lists=16)
    indexed = S.ivf_build(emb, "embedding", centroids).persist()
    indexed.count()
    codebooks = S.fit_pq_codebooks(emb, "embedding", n_subvectors=8, n_centroids=16)
    scales = S.fit_sq8_scales(emb, "embedding")

    def ids(df) -> list[int]:
        return [int(r["vec_id"]) for r in df.collect()]

    methods = {
        "lsh_16planes": lambda q: S.lsh_cosine_topk(emb, "embedding", q, planes, k=args.k),
        "ivf_probe1": lambda q: S.ivf_search(indexed, "embedding", centroids, q, k=args.k, n_probe=1),
        "ivf_probe2": lambda q: S.ivf_search(indexed, "embedding", centroids, q, k=args.k, n_probe=2),
        "ivf_probe4": lambda q: S.ivf_search(indexed, "embedding", centroids, q, k=args.k, n_probe=4),
        "ivfpq_probe2": lambda q: S.ivf_pq_search(indexed, "embedding", centroids, codebooks, q, n_probe=2, k=args.k),
        "ivfpq_probe4": lambda q: S.ivf_pq_search(indexed, "embedding", centroids, codebooks, q, n_probe=4, k=args.k),
        "sq8_fullscan": lambda q: S.sq8_topk(emb, "embedding", scales, q, k=args.k),
    }

    per_method: dict[str, list[float]] = {m: [] for m in methods}
    for vid, q in probes:
        truth = ids(S.cosine_topk(emb, "embedding", q, k=args.k))
        for m, fn in methods.items():
            per_method[m].append(recall(ids(fn(q)), truth))

    out = {"sf_dir": args.sf_dir, "n_queries": len(probes), "k": args.k,
           "recall": {}}
    print(f"{'method':16s} {'mean':>6s} {'min':>6s}")
    for m, vals in per_method.items():
        mean = sum(vals) / len(vals)
        out["recall"][m] = {"mean": round(mean, 3), "min": round(min(vals), 3)}
        print(f"{m:16s} {mean:6.3f} {min(vals):6.3f}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
