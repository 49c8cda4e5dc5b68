"""10^8-row payload-stripped spatial-join scaling datapoint (VERDICT r4
item 7, toward BASELINE.json's 10^9-row metric).

The radius join never reads image payloads (plan-asserted in
tests/test_plans.py), so this probe generates the element/item tables
payload-FREE with the exact geotag distribution of the images views
(datagen/views.py geotag_lat/lon over a synthetic phash stream,
including the 30% Riga dense-cluster skew and the data_items offset
bands) as pure native expressions — no Python row path, which is what
makes 10^8 rows generable in-sandbox.

The radius shrinks to keep the pair count measurable (pairs scale with
n^2 r^2): r=50 m at n=10^8 yields ~5x10^9 haversine-verified pairs,
one order of magnitude beyond the round-4 4M-row/6.8B-pair probe in
row count. Same methodology as tools/bench_scaling.py: fresh JVM per
leg, software-clock calibration at each leg's occupancy, identical
input, pair counts asserted equal across legs.

Run: python tools/bench_bigjoin.py [n=100000000] [radius_m=50] [low=2] [high=8]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import calibrate  # noqa: E402 (same software clock)

TABLE = "/tmp/osmalyzer_bigjoin"


def ensure_tables(n: int) -> str:
    path = f"{TABLE}_{n}"
    if os.path.exists(os.path.join(path, "elems", "_SUCCESS")):
        return path
    from pyspark.sql import functions as F

    from osmalyzer_spark.datagen.views import geotag_lat, geotag_lon
    from osmalyzer_spark.session import get_spark

    spark = get_spark("bigjoin-datagen", parallelism=32, shuffle_partitions=64)
    parts = max(32, n // 2_000_000)
    base = spark.range(0, n, 1, parts).withColumn(
        "phash", F.abs(F.xxhash64("id", F.lit(42)))
    )
    elems = base.select(
        F.col("id").alias("elem_id"),
        geotag_lat("phash").alias("elem_lat"),
        geotag_lon("phash").alias("elem_lon"),
    )
    elems.write.mode("overwrite").parquet(os.path.join(path, "elems"))
    # item side: every 10th row, offset by the data_items_view band model
    cand = base.filter(F.col("id") % 10 == 0)
    band = F.abs(F.xxhash64("id", F.lit(1))) % 100
    offset_m = (
        F.when(band < 60, 2.0 + (band % 13))
        .when(band < 85, 20.0 + (band % 50))
        .when(band < 95, 100.0 + (band % 7) * 80.0)
        .otherwise(800.0 + (band % 5) * 100.0)
    )
    bearing = (F.abs(F.xxhash64("id", F.lit(2))) % 360) * 0.0174532925199433
    lat = geotag_lat("phash")
    dlat = offset_m * F.cos(bearing) / 111_320.0
    dlon = offset_m * F.sin(bearing) / (111_320.0 * F.cos(F.radians(lat)))
    items = cand.select(
        F.col("id").alias("item_id"),
        (lat + dlat).alias("item_lat"),
        (geotag_lon("phash") + dlon).alias("item_lon"),
    )
    items.write.mode("overwrite").parquet(os.path.join(path, "items"))
    spark.stop()
    return path


def child(cpus: int, n: int, radius: float) -> None:
    from osmalyzer_spark.operators.knn import SaltSpec, radius_join
    from osmalyzer_spark.session import get_spark

    calib = calibrate(cpus)
    spark = get_spark(
        f"bigjoin-{cpus}", parallelism=cpus, shuffle_partitions=cpus * 8
    )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    path = f"{TABLE}_{n}"
    elems = spark.read.parquet(os.path.join(path, "elems"))
    items = spark.read.parquet(os.path.join(path, "items"))
    salt = SaltSpec(threshold=max(250, 16_000 // cpus), max_factor=64)

    t0 = time.time()
    pairs = radius_join(
        items,
        elems,
        radius,
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
        salt=salt,
    )
    n_pairs = pairs.count()
    t_join = time.time() - t0
    calib_after = calibrate(cpus)
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "calib_chunks_per_core_s": calib,
                "calib_after_chunks_per_core_s": calib_after,
                "n_pairs": n_pairs,
                "t_join_s": round(t_join, 3),
                "join_pairs_per_s": round(n_pairs / t_join, 1),
            }
        )
    )


def run_child(cpus: int, n: int, radius: float) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            str(cpus),
            str(n),
            str(radius),
        ],
        capture_output=True,
        text=True,
        timeout=7200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT ") :])
    raise RuntimeError(f"child {cpus} failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4]))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    radius = float(sys.argv[2]) if len(sys.argv) > 2 else 50.0
    low = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    high = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    ensure_tables(n)
    lo = run_child(low, n, radius)
    hi = run_child(high, n, radius)
    assert lo["n_pairs"] == hi["n_pairs"], (lo["n_pairs"], hi["n_pairs"])
    factor = high / low
    raw = lo["t_join_s"] / hi["t_join_s"] / factor
    drift = (
        lo["calib_chunks_per_core_s"] / hi["calib_chunks_per_core_s"]
        if hi["calib_chunks_per_core_s"]
        else 1.0
    )
    print(
        json.dumps(
            {
                "n_rows": n,
                "radius_m": radius,
                "low": lo,
                "high": hi,
                "scaling_efficiency_raw": round(raw, 3),
                "calibration_drift_low_over_high": round(drift, 3),
                "scaling_efficiency_clock_normalized": round(raw * drift, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
