"""Recorded recall@k for the production ANN configs at sf0.1 (VERDICT
r4 #6): lsh_topk at bands=8 (the scale config — the q22 contract runs
the exactness config) and ivf_topk at nprobe ∈ {1, 4, 16}, each against
the brute-force truth (the q18 operator).

Prints one JSON line; --write-md refreshes the ANN-recall section in
BASELINE.md.  Deterministic: fixed query set (every 8th vec_id), fixed
k, and both engines break cos_sim ties by vec_id.
"""

from __future__ import annotations

import json
import os
import sys

K = 10
N_QUERIES = 64


def recall_at_k(truth: dict[int, set], approx_df) -> float:
    got: dict[int, set] = {}
    for r in approx_df.select("query_id", "vec_id").collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    num = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    den = sum(len(t) for t in truth.values())
    return round(num / den, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from augdiff_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )
    from augdiff_pipeline_spark.session import get_spark

    spark = get_spark("ann-recall", cores=cpus,
                      shuffle_partitions=max(2 * cpus, 16))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    qids = ids[::max(1, len(ids) // N_QUERIES)][:N_QUERIES]

    truth: dict[int, set] = {}
    for r in brute_force_topk(emb, qids, k=K).select("query_id", "vec_id").collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    results = {
        "lsh_bands8": recall_at_k(truth, lsh_topk(emb, qids, k=K, bands=8)),
        "lsh_bands8_probe8": recall_at_k(
            truth, lsh_topk(emb, qids, k=K, bands=8, n_probes=8)
        ),
        "lsh_bands8_probe16": recall_at_k(
            truth, lsh_topk(emb, qids, k=K, bands=8, n_probes=16)
        ),
    }
    for nprobe in (1, 4, 16):
        results[f"ivf_nprobe{nprobe}"] = recall_at_k(
            truth, ivf_topk(emb, qids, k=K, n_centroids=16, nprobe=nprobe)
        )

    out = {
        "metric": "ann_recall_at_k",
        "k": K,
        "n_queries": len(qids),
        "n_vectors": len(ids),
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None,
        "recall": results,
    }
    print(json.dumps(out))
    if "--write-md" in sys.argv:
        _write_md(out)
    spark.stop()


def _write_md(r: dict) -> None:
    lines = [
        "",
        "## ANN production-config recall, measured (round 5)",
        "",
        f"sf={r['sf']}, {r['n_vectors']} vectors, {r['n_queries']} queries, "
        f"recall@{r['k']} vs the q18 brute-force truth (ties broken by "
        "vec_id in both engines):",
        "",
        "| config | recall@10 |",
        "|---|---|",
        f"| lsh_topk bands=8, no probes | {r['recall']['lsh_bands8']} |",
        f"| lsh_topk bands=8, n_probes=8 | {r['recall']['lsh_bands8_probe8']} |",
        f"| **lsh_topk bands=8, n_probes=16 (scale config)** | {r['recall']['lsh_bands8_probe16']} |",
        f"| ivf_topk nprobe=1 | {r['recall']['ivf_nprobe1']} |",
        f"| ivf_topk nprobe=4 | {r['recall']['ivf_nprobe4']} |",
        f"| ivf_topk nprobe=16 (full probe at 16 centroids) | {r['recall']['ivf_nprobe16']} |",
        "",
        "This corpus is the HARD case for hyperplane LSH: the synthetic "
        "embeddings are near-isotropic (no cluster structure), so a "
        "query's true top-10 sit at modest cosine (~0.4-0.5) where an "
        "8-bit band collides rarely.  Query-side multi-probe "
        "(`n_probes`, Lv et al. VLDB'07) recovers the recall at zero "
        "index-side cost: probes grow only the per-query candidate "
        "list, never the signature table or its shuffle — at corpus "
        "scale that is the difference between re-sharding the index "
        "and touching nothing.  The pytest floors "
        "(`tests/test_dataops.py::test_production_config_recall`) are "
        "set just below these measured values so a recall regression "
        "in either index fails the suite, not just the bench.",
        "",
    ]
    with open(os.path.join(os.path.dirname(__file__), "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
