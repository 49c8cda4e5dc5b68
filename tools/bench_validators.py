"""Shared-node validator family scaling probe (round 5, late).

The Validation analyzer group (plans/validators.py q42-q50) is one
operator shape at scale: explode way->node membership after tag
filters, equi-join on node_id, apply rule predicates. This probe runs
the two heaviest members — barrier_connections and
bridge_water_connections — over a synthetic element graph of N ways
(5 pseudo-random shared nodes each => ~5N membership rows, ~5 ways per
node) and reports wall + N->4N efficiency. Row counts and id checksums
must be identical across legs.

Shuffle partitioning derives from the data (memberships/250k), not the
cluster, so both legs run the identical plan (BENCH.md round-5 §1
discipline). Fresh JVM per leg, in-run clock calibration, steady-state
(second-run) timing.

    python tools/bench_validators.py [n_ways] [lo_cpus] [hi_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import calibrate  # noqa: E402

N_DEFAULT = 2_000_000
WAYS_PATH = "/tmp/osmalyzer_validator_ways"
NODES_PATH = "/tmp/osmalyzer_validator_nodes"

# q42-style tag classes over the way id (see driver_queries._VAL_WAYS);
# inlined here so the probe is self-contained over the synthetic graph
_BARRIER = (
    "CASE ((id % 36)) WHEN 0 THEN 'fence' WHEN 3 THEN 'wall' WHEN 6 THEN 'hedge' "
    "WHEN 9 THEN 'gate' WHEN 12 THEN 'lift_gate' WHEN 15 THEN 'chain' "
    "WHEN 18 THEN 'retaining_wall' WHEN 21 THEN 'guard_rail' WHEN 24 THEN 'wicket_gate' "
    "WHEN 27 THEN 'cattle_grid' WHEN 30 THEN 'kerb' ELSE 'handrail' END"
)
_HIGHWAY = (
    "CASE ((id % 21)) WHEN 1 THEN 'residential' WHEN 4 THEN 'footway' "
    "WHEN 7 THEN 'service' WHEN 10 THEN 'platform' WHEN 13 THEN 'path' "
    "WHEN 16 THEN 'track' ELSE 'primary' END"
)
_BRIDGE = "CASE ((id % 12)) WHEN 2 THEN 'yes' ELSE 'viaduct' END"
_WATERWAY = (
    "CASE ((id % 30)) WHEN 5 THEN 'stream' WHEN 11 THEN 'river' "
    "WHEN 17 THEN 'ditch' WHEN 23 THEN 'dam' ELSE 'canal' END"
)


def ensure_tables(n: int) -> None:
    ways_path = f"{WAYS_PATH}_{n}"
    nodes_path = f"{NODES_PATH}_{n}"
    if os.path.exists(ways_path) and os.path.exists(nodes_path):
        return
    from pyspark.sql import functions as F

    from osmalyzer_spark.session import get_spark

    spark = get_spark("validator-datagen", parallelism=8, shuffle_partitions=32)
    w = spark.range(n).select(F.col("id"))
    # 5 pseudo-random shared nodes per way over a node space of size n;
    # xxhash64 avoids modular-arithmetic artifacts (an affine formula
    # made bridge/waterway classes node-disjoint at some n)
    node_ids = F.array(
        *[F.abs(F.xxhash64(F.col("id"), F.lit(i))) % n for i in range(5)]
    )
    tags = F.map_from_entries(
        F.filter(
            F.array(
                F.struct(
                    F.lit("barrier").alias("key"),
                    F.when(F.col("id") % 3 == 0, F.expr(_BARRIER)).alias("value"),
                ),
                F.struct(
                    F.lit("highway").alias("key"),
                    F.when(F.col("id") % 3 == 1, F.expr(_HIGHWAY)).alias("value"),
                ),
                F.struct(
                    F.lit("area").alias("key"),
                    F.when(
                        (F.col("id") % 3 == 1) & (F.col("id") % 7 == 0), F.lit("yes")
                    ).alias("value"),
                ),
                F.struct(
                    F.lit("bridge").alias("key"),
                    F.when(F.col("id") % 6 == 2, F.expr(_BRIDGE)).alias("value"),
                ),
                F.struct(
                    F.lit("waterway").alias("key"),
                    F.when(F.col("id") % 6 == 5, F.expr(_WATERWAY)).alias("value"),
                ),
            ),
            lambda e: e["value"].isNotNull(),
        )
    )
    w.select("id", tags.alias("tags"), node_ids.alias("node_ids")).write.mode(
        "overwrite"
    ).parquet(ways_path)
    nd = spark.range(n).select(F.col("id"))
    ntags = F.map_from_entries(
        F.filter(
            F.array(
                F.struct(
                    F.lit("barrier").alias("key"),
                    F.when(F.col("id") % 11 == 0, F.lit("gate")).alias("value"),
                )
            ),
            lambda e: e["value"].isNotNull(),
        )
    )
    nd.select(
        "id",
        ntags.alias("tags"),
        (56.0 + (F.col("id") % 100003) / 100003.0 * 2.0).alias("lat"),
        (21.0 + (F.col("id") % 999983) / 999983.0 * 7.0).alias("lon"),
    ).write.mode("overwrite").parquet(nodes_path)
    spark.stop()


def child(cpus: int, n: int) -> None:
    from pyspark.sql import functions as F

    from osmalyzer_spark.plans.validators import (
        barrier_connections,
        bridge_water_connections,
    )
    from osmalyzer_spark.session import get_spark

    calib = calibrate(cpus)
    spark = get_spark(
        f"validator-scaling-{cpus}",
        parallelism=cpus,
        shuffle_partitions=max(16, 5 * n // 250_000),
    )
    ways = spark.read.parquet(f"{WAYS_PATH}_{n}")
    nodes = spark.read.parquet(f"{NODES_PATH}_{n}")

    def run_barrier() -> tuple[int, int, float]:
        t0 = time.time()
        out = barrier_connections(ways, nodes)
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum(F.col("barrier_id") * 7 + F.col("highway_id")).alias("s"),
        ).collect()[0]
        return int(agg["n"]), int(agg["s"] or 0), time.time() - t0

    def run_bridge() -> tuple[int, int, float]:
        t0 = time.time()
        out = bridge_water_connections(ways, nodes)
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum(F.col("bridge_id") * 13 + F.col("waterway_id") + F.col("n_points")).alias("s"),
        ).collect()[0]
        return int(agg["n"]), int(agg["s"] or 0), time.time() - t0

    nb, sb, _ = run_barrier()
    nb2, sb2, t_barrier = run_barrier()
    assert (nb, sb) == (nb2, sb2)
    nw, sw, _ = run_bridge()
    nw2, sw2, t_bridge = run_bridge()
    assert (nw, sw) == (nw2, sw2)
    calib_after = calibrate(cpus)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "calib_chunks_per_core_s": calib,
                "calib_after_chunks_per_core_s": calib_after,
                "barrier_rows": nb,
                "barrier_sum": sb,
                "bridge_rows": nw,
                "bridge_sum": sw,
                "t_barrier_s": round(t_barrier, 3),
                "t_bridge_s": round(t_bridge, 3),
                "wall_s": round(t_barrier + t_bridge, 3),
                "memberships_per_s": round(5 * n / (t_barrier + t_bridge), 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ensure_tables(n)
    legs = {}
    for cpus, key in ((lo, "low"), (hi, "high")):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus), str(n)],
            capture_output=True,
            text=True,
            check=True,
        )
        legs[key] = json.loads(out.stdout.strip().splitlines()[-1])
    lo_leg, hi_leg = legs["low"], legs["high"]
    for k in ("barrier_rows", "barrier_sum", "bridge_rows", "bridge_sum"):
        assert lo_leg[k] == hi_leg[k], (k, lo_leg[k], hi_leg[k])
    ratio = hi_leg["cpus"] / lo_leg["cpus"]
    eff = (lo_leg["wall_s"] / hi_leg["wall_s"]) / ratio
    clock = lo_leg["calib_chunks_per_core_s"] / hi_leg["calib_chunks_per_core_s"]
    print(
        json.dumps(
            {
                "n_ways": n,
                "low": lo_leg,
                "high": hi_leg,
                "scaling_efficiency_raw": round(eff, 3),
                "scaling_efficiency_clock_normalized": round(eff * clock, 3),
                "phase_efficiency_raw": {
                    "t_barrier_s": round(
                        lo_leg["t_barrier_s"] / hi_leg["t_barrier_s"] / ratio, 3
                    ),
                    "t_bridge_s": round(
                        lo_leg["t_bridge_s"] / hi_leg["t_bridge_s"] / ratio, 3
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
