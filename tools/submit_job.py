"""Cluster entry point for spark-submit.

Usage (cluster):
    zip -r osmalyzer_spark.zip osmalyzer_spark
    spark-submit --py-files osmalyzer_spark.zip tools/submit_job.py \
        --images /path/to/iceberg-or-parquet-table --out /path/out \
        --job correlate --radius 75

Local smoke: python tools/submit_job.py --images <parquet> --out /tmp/out

The script only uses the already-active SparkSession's config when run
under spark-submit (getOrCreate picks up --master/--conf), so the same
file serves local[N] and a real cluster.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="input images table path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--job", default="correlate", choices=["correlate", "tiles", "dedup", "textstats"])
    ap.add_argument("--radius", type=float, default=75.0)
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--checkpointed", action="store_true", help="resumable per-cell-bucket execution")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName(f"osmalyzer-{args.job}").getOrCreate()
    from osmalyzer_spark.datagen.views import data_items_view, osm_elements_view

    images = spark.read.parquet(args.images)

    if args.job == "correlate":
        from osmalyzer_spark.operators.correlator import CorrelatorParams, correlate

        elems = osm_elements_view(images).select("elem_id", "elem_lat", "elem_lon", "image_id")
        items = data_items_view(images).select("item_id", "item_lat", "item_lon")
        params = CorrelatorParams(
            match_distance=15.0,
            unmatch_distance=args.radius,
            strong_extra_distance=700.0,
        )
        if args.checkpointed:
            # Resumable mode with EXACT global semantics: buckets are
            # connected components of the candidate graph (no edge crosses
            # buckets, so per-bucket matchings union to the global fixed
            # point), both sides staged partitioned by bucket for pruned
            # per-bucket reads, crash/resume via idempotent
            # dynamic-overwrite writes. (An earlier revision bucketed by
            # coarse region cells and could miss cross-border matches.)
            from osmalyzer_spark.checkpoint import CheckpointedRun
            from osmalyzer_spark.operators.correlator import checkpointed_correlate

            ck = CheckpointedRun(args.out, run_id=args.run_id, n_buckets=64)
            out = checkpointed_correlate(
                spark, elems.drop("image_id"), items, params, ck
            )
            print(f"checkpointed correlation rows: {out.count()}")
        else:
            res = correlate(spark, elems.drop("image_id"), items, params)
            res.correlations.write.mode("overwrite").parquet(os.path.join(args.out, "correlations"))
            res.summary.show()
    elif args.job == "tiles":
        from osmalyzer_spark.datagen.views import geotag_lat, geotag_lon
        from osmalyzer_spark.operators.tiles import assign_tiles, tile_stats

        geo = images.select(
            "image_id", geotag_lat("phash").alias("lat"), geotag_lon("phash").alias("lon")
        )
        assigned = assign_tiles(geo, zoom=args.zoom)
        tile_stats(assigned).write.mode("overwrite").parquet(os.path.join(args.out, "tiles"))
    elif args.job == "dedup":
        from osmalyzer_spark.operators.dedup import minhash_dedup

        docs = images.select(F.xxhash64("image_id").alias("doc_id"), F.col("caption").alias("text"))
        minhash_dedup(docs, "doc_id", "text", threshold=0.8).write.mode("overwrite").parquet(
            os.path.join(args.out, "dups")
        )
    elif args.job == "textstats":
        from osmalyzer_spark.operators.textstats import text_stats

        text_stats(images.select("image_id", "caption"), "image_id", "caption").write.mode(
            "overwrite"
        ).parquet(os.path.join(args.out, "textstats"))
    print("done")


if __name__ == "__main__":
    main()
