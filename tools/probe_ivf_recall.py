"""IVF recall vs brute force at equal nprobe: k-means quantizer vs the
deterministic id-based stand-in (BENCH.md table; VERDICT r2 item 6).

Run: python tools/probe_ivf_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from osmalyzer_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )
    from osmalyzer_spark.session import get_spark

    spark = get_spark("ivf-recall", parallelism=16, shuffle_partitions=16)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    probes = emb.filter(F.col("vec_id") % 97 == 0).cache()
    n_probes = probes.count()

    truth = {
        (r["probe_id"], r["cand_id"])
        for r in cosine_topk_bruteforce(emb, probes, k=k).collect()
    }

    rows = []
    for nprobe in (1, 2, 4):
        for mode in ("by_id", "kmeans"):
            got = {
                (r["probe_id"], r["cand_id"])
                for r in cosine_topk_ivf(
                    emb, probes, k=k, n_centroids=16, nprobe=nprobe, centroids=mode
                ).collect()
            }
            rows.append(
                {
                    "centroids": mode,
                    "nprobe": nprobe,
                    "recall_at_k": round(len(got & truth) / len(truth), 4),
                }
            )
    print(
        "IVF_RECALL "
        + json.dumps({"n_vectors": n, "n_probes": n_probes, "k": k, "rows": rows})
    )


if __name__ == "__main__":
    main()
