"""Candidate-graph component structure at probe scale (BENCH.md datapoint).

checkpointed_correlate decomposes the matching by connected components of
the candidate graph; its min-label-propagation converges in O(component
diameter) rounds and RAISES past max_iter. This probe measures, on the
same 1M-image table the scaling bench uses (seek = the correlator probe's
775 m), the actual rounds-to-converge and the component size
distribution — turning the max_iter=64 default from hope into evidence.

Run: python tools/probe_components.py [n_images] [seek_m]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    seek = float(sys.argv[2]) if len(sys.argv) > 2 else 775.0

    from pyspark.sql import functions as F

    from osmalyzer_spark.datagen import data_items_view, osm_elements_view
    from osmalyzer_spark.operators.dedup import connected_components_greedy
    from osmalyzer_spark.operators.knn import radius_join
    from osmalyzer_spark.session import get_spark
    from tools.bench_scaling import TABLE_PATH, ensure_table

    ensure_table(n)
    spark = get_spark("cc-probe", parallelism=32, shuffle_partitions=256)
    images = spark.read.parquet(f"{TABLE_PATH}_{n}")
    elems = osm_elements_view(images).select("elem_id", "elem_lat", "elem_lon")
    items = data_items_view(images).select("item_id", "item_lat", "item_lon")
    # long node ids (hash-separated sides) instead of the "i:"/"e:" string
    # keys checkpointed_correlate uses — the structure probe holds the
    # whole edge list in memory across propagation rounds, and longs are
    # ~6x smaller; cross-side collision odds at 1M nodes are ~n^2/2^64
    # (negligible for a size/diameter distribution)
    pairs = radius_join(
        items, elems, seek,
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
        dist_col="__d",
    ).select(
        F.xxhash64(F.col("item_id"), F.lit(1)).alias("id_a"),
        F.xxhash64(F.col("elem_id"), F.lit(2)).alias("id_b"),
    )
    algo = sys.argv[3] if len(sys.argv) > 3 else "star"
    t0 = time.time()
    if algo == "star":
        from osmalyzer_spark.operators.dedup import connected_components_star

        labels, rounds = connected_components_star(
            pairs, max_iter=64, with_rounds=True, local_edge_threshold=0
        )
    else:
        labels, rounds = connected_components_greedy(
            pairs, max_iter=64, with_rounds=True
        )
    sizes = (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
        .select(
            F.count(F.lit(1)).alias("n_components"),
            F.max("sz").alias("max_size"),
            F.expr("percentile_approx(sz, 0.5)").alias("p50_size"),
            F.expr("percentile_approx(sz, 0.99)").alias("p99_size"),
            F.sum("sz").alias("n_nodes"),
        )
        .collect()[0]
    )
    print(
        "CC_PROBE "
        + json.dumps(
            {
                "n_images": n,
                "seek_m": seek,
                "algorithm": algo,
                "propagation_rounds_to_converge": rounds,
                "n_components": sizes["n_components"],
                "n_nodes": sizes["n_nodes"],
                "max_component_size": sizes["max_size"],
                "p50_component_size": sizes["p50_size"],
                "p99_component_size": sizes["p99_size"],
                "wall_s": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
