"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set stresses the engine's core paths: the cell-bucketed kNN
join + mutual-best, ray-cast PIP, tile assignment, the full Correlator
(flagship), near-dup jaccard, cosine top-k, and a shuffle-heavy aggregate.
Extra context keys (rows/sec for the spatial join, parallelism) ride along
for BENCH.md; the driver contract only needs metric/value/unit/queries/sf.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def flagship_correlator(spark, sf_dir):
    from pyspark.sql import functions as F

    from osmalyzer_spark.operators.correlator import CorrelatorParams, correlate
    from osmalyzer_spark.plans.driver_queries import _geo_customers, _geo_suppliers

    elements = _geo_customers(spark, sf_dir).withColumn(
        "elem_tag", (F.col("elem_id") % 7).cast("string")
    )
    items = _geo_suppliers(spark, sf_dir).withColumn(
        "item_tag", (F.col("item_id") % 7).cast("string")
    )
    params = CorrelatorParams(
        match_distance=150.0,
        unmatch_distance=1500.0,
        strong_extra_distance=3000.0,
        strength_expr=lambda df: F.when(
            F.col("item_tag") == F.col("elem_tag"), F.lit(3)
        ).otherwise(F.lit(1)),
        lone_allowance_expr=lambda df: F.col("elem_id") % 11 == 0,
    )
    return correlate(spark, elements, items, params).correlations


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from osmalyzer_spark.plans import driver_queries as dq
    from osmalyzer_spark.session import get_spark

    spark = get_spark("bench", parallelism=cpus, shuffle_partitions=cpus)

    bench_queries = {
        "q01_pricing_summary": dq.q01_pricing_summary,
        "q10_knn_radius": dq.q10_knn_radius,
        "q11_mutual_best": dq.q11_mutual_best,
        "q12_point_in_polygon": dq.q12_point_in_polygon,
        "q13_tile_assignment": dq.q13_tile_assignment,
        "q17_cosine_topk": dq.q17_cosine_topk,
        "q21_minhash_lsh": dq.q21_minhash_lsh,
        "q22_simhash": dq.q22_simhash,
        "q25_tile_region": dq.q25_tile_region,
        "q29_fuzzy_parse": dq.q29_fuzzy_parse,
        "q31_opening_hours": dq.q31_opening_hours,
        "q32_ivf_ann": dq.q32_ivf_ann,
        "q33_pt_pipeline": dq.q33_pt_pipeline,
        "q34_improper_translation": dq.q34_improper_translation,
        "q35_trolleybus_wires": dq.q35_trolleybus_wires,
        "q36_ivf_kmeans": dq.q36_ivf_kmeans,
        "q37_checkpointed_correlator": dq.q37_checkpointed_correlator,
        "q38_image_roundtrip": dq.q38_image_roundtrip,
        "q39_audio_roundtrip": dq.q39_audio_roundtrip,
        "q40_video_roundtrip": dq.q40_video_roundtrip,
        "q41_phash_neardup": dq.q41_phash_neardup,
        # round-5 analyzer families, one representative per shape:
        # node-membership self-join, endpoint/terminal analysis, relation
        # member resolution, string-distance cascade, PIP double-mapping,
        # name-recognition cascade, boundary grouping, brand-title match
        "q42_barrier_connections": dq.q42_barrier_connections,
        "q45_terminating_ways": dq.q45_terminating_ways,
        "q49_lone_crossings": dq.q49_lone_crossings,
        "q50_turn_restrictions": dq.q50_turn_restrictions,
        "q52_spelling": dq.q52_spelling,
        "q61_double_mapped": dq.q61_double_mapped,
        "q62_street_names": dq.q62_street_names,
        "q63_admin_boundaries": dq.q63_admin_boundaries,
        "q64_common_brands": dq.q64_common_brands,
        "q65_city_analyzer": dq.q65_city_analyzer,
        "q66_parcel_lockers": dq.q66_parcel_lockers,
        "q68_cultural_monuments": dq.q68_cultural_monuments,
        "q74_cultural_centers": dq.q74_cultural_centers,
        "flagship_correlator": flagship_correlator,
    }

    # warm the JVM/parquet footings so per-query times measure the plan,
    # not first-touch classloading
    spark.read.parquet(f"{sf_dir}/customer.parquet").count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in bench_queries.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        rows[name] = n

    # spatial-join throughput (the BASELINE.json metric): candidate pairs
    # evaluated per second by the kNN radius join (haversine-filtered)
    from osmalyzer_spark.operators.knn import radius_join
    from osmalyzer_spark.plans.driver_queries import _geo_customers, _geo_suppliers

    items = _geo_suppliers(spark, sf_dir)
    elems = _geo_customers(spark, sf_dir)
    t0 = time.time()
    pair_count = radius_join(
        items,
        elems,
        5000.0,
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
        broadcast_probe=True,
    ).count()
    spatial_s = time.time() - t0
    timings["spatial_pairs_join"] = round(spatial_s, 3)
    rows["spatial_pairs_join"] = pair_count

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline query wall time (sum), spatial-join pairs/sec in extra",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extra": {
                    "rows": rows,
                    "spatial_pairs_per_sec": round(pair_count / spatial_s, 1),
                    "parallelism": cpus,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
