"""Round-6 optimization micro-benchmarks (NOT the driver bench).

`bench.py` is frozen for measurement; the numbers cited in
OPTIMIZATION_r06.md that are not whole-query bench entries come from
here. Three probes:

  sinks    — fixed cost of one-row marker writes (the q37 finding):
             createDataFrame+coalesce(1) local-relation write vs the
             range(1)+lit single-partition form, parquet vs text.
  q37      — per-phase wall of checkpointed_correlate at $SPARK_GRAFT_SF_DIR
             (slim/CC/staging/small-pass), the round's top entry.
  noop     — noop-sink isolation (guide §1.4) for a named query:
             `python bench_extra.py noop q61_double_mapped` times the
             computation alone, twice (first run includes codegen).

Usage: python bench_extra.py [sinks|q37|noop <query>] (default: sinks q37)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from osmalyzer_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", parallelism=cpus, shuffle_partitions=cpus)
    spark.range(1).count()
    return spark


def bench_sinks(spark) -> None:
    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="bx_sinks_")
    val = "x" * 200

    def t(tag, fn, n=3):
        walls = []
        for i in range(n):
            t0 = time.time()
            fn(i)
            walls.append(time.time() - t0)
        print(f"{tag:42s} {' '.join(f'{w:6.2f}' for w in walls)} s")

    t("createDF(list).coalesce(1).write.parquet", lambda i: (
        spark.createDataFrame([(val,)], "value string").coalesce(1)
        .write.mode("overwrite").parquet(f"{d}/a{i}")))
    t("createDF(list).coalesce(1).write.text", lambda i: (
        spark.createDataFrame([(val,)], "value string").coalesce(1)
        .write.mode("overwrite").text(f"{d}/b{i}")))
    t("range(0,1,1,1)+lit.write.parquet (shipped)", lambda i: (
        spark.range(0, 1, 1, 1).select(F.lit(val).alias("value"))
        .write.mode("overwrite").parquet(f"{d}/c{i}")))


def bench_q37(spark) -> None:
    from pyspark.sql import functions as F

    from osmalyzer_spark.checkpoint import CheckpointedRun
    from osmalyzer_spark.operators.correlator import (
        CorrelatorParams,
        checkpointed_correlate,
    )
    from osmalyzer_spark.plans.driver_queries import _geo_customers, _geo_suppliers

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    for rep in range(2):
        pt: dict = {}
        ck = CheckpointedRun(
            tempfile.mkdtemp(prefix="bx_q37_"), run_id="q37", n_buckets=8,
            buckets_per_batch=8,
        )
        t0 = time.time()
        corr = checkpointed_correlate(spark, elements, items, params, ck,
                                      phase_times=pt)
        n = corr.count()
        print(f"q37 rep{rep}: total={time.time() - t0:.2f} s rows={n} phases={pt}")


def bench_noop(spark, name: str) -> None:
    from osmalyzer_spark.plans import driver_queries as dq

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn = getattr(dq, name)
    for rep in range(2):
        spark.sparkContext.setJobDescription(f"noop {name} rep{rep}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        built = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(
            f"{name} rep{rep}: build={built - t0:.2f} s "
            f"noop-exec={time.time() - built:.2f} s"
        )
        spark.sparkContext.setJobDescription(None)


def main() -> None:
    args = sys.argv[1:] or ["sinks", "q37"]
    spark = _spark()
    i = 0
    while i < len(args):
        if args[i] == "sinks":
            bench_sinks(spark)
        elif args[i] == "q37":
            bench_q37(spark)
        elif args[i] == "noop":
            i += 1
            bench_noop(spark, args[i])
        else:
            raise SystemExit(f"unknown probe {args[i]!r}")
        i += 1


if __name__ == "__main__":
    main()
