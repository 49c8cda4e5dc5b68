"""Image near-dup scaling probe (round 5): the north rule's image axis.

The job is the full visual-dedup pipeline over the substrate images
table: payload decode (PNG + pooled-lane JPEG) -> vectorized pHash
(multimodal.phash64_batch) -> banded hamming-LSH candidate join +
bit_count verify (phash_near_pairs). A deterministic 1% of rows is
re-encoded (decode -> PNG of the SAME pixels, new id) and unioned in,
so the expected pair set is exactly those injected duplicates — the
pair count and two checksums must be byte-identical across legs.

Corpus-scale parameters: max_hamming=3 / bands=4 (16-bit band keys).
The q41 gate's 6/8 setting is for tiny inputs — 8-bit band keys are
only ~256 buckets, which is quadratic-ish on a large corpus; 16-bit
keys keep candidate generation bucket-bounded (multi-index hamming,
same shape the simhash path uses).

Same harness discipline as tools/bench_scaling.py: fresh JVM per leg,
in-run software-clock calibration, steady-state (second) timing for the
join stage. Run:

    python tools/bench_phash.py [n_images] [lo_cpus] [hi_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import TABLE_PATH, calibrate, ensure_table  # noqa: E402

N_DEFAULT = 200_000


def child(cpus: int, n: int) -> None:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    from osmalyzer_spark.multimodal import phash_images, phash_near_pairs
    from osmalyzer_spark.session import get_spark

    calib = calibrate(cpus)
    # shuffle partitioning from the DATA, not the cluster (identical
    # plans at N and 4N executors — BENCH.md round-5 §1 discipline)
    spark = get_spark(
        f"phash-scaling-{cpus}",
        parallelism=cpus,
        shuffle_partitions=max(16, n // 50_000),
    )
    images = spark.read.parquet(f"{TABLE_PATH}_{n}").select(
        "image_id", "bytes", "fmt"
    )

    def reencode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osmalyzer_spark.datagen.png import decode_images_batch, png_encode

        for pdf in batches:
            pixs = decode_images_batch(list(pdf["bytes"]), list(pdf["fmt"]))
            yield pd.DataFrame(
                {
                    "image_id": ["dup_" + i for i in pdf["image_id"]],
                    "bytes": [bytearray(png_encode(px)) for px in pixs],
                    "fmt": "png",
                }
            )

    dups = (
        images.filter(F.expr("CAST(substring(image_id, 4) AS BIGINT) % 100 = 0"))
        .mapInPandas(reencode, schema="image_id string, bytes binary, fmt string")
    )
    # NO payload repartition: at corpus scale you hash AT THE SCAN —
    # shuffling fat binary rows before a map-side stage is pure waste
    # (measured: the 1.5 GB payload shuffle cost this probe 0.64 raw
    # efficiency; scan-side hashing restored it)
    corpus = images.unionByName(dups)
    n_rows = corpus.count()

    # section 1: decode + pHash (forced by a checksum aggregate), then
    # keep only (id, hash) resident for the join stage — the payload
    # never needs to survive the hash stage, exactly as at corpus scale
    t0 = time.time()
    ph = phash_images(corpus).select("image_id", "phash64").persist()
    hash_sum = ph.agg(F.expr("bit_xor(phash64)")).collect()[0][0]
    t_hash = time.time() - t0

    # section 2: banded hamming LSH + verify; steady-state (second) run
    def run_pairs() -> tuple[int, int, float]:
        t0 = time.time()
        pairs = phash_near_pairs(ph, max_hamming=3, bands=4)
        agg = pairs.agg(
            F.count("*").alias("n"), F.sum("hamming").alias("s")
        ).collect()[0]
        return int(agg["n"]), int(agg["s"] or 0), time.time() - t0

    n_pairs, ham_sum, _ = run_pairs()
    n_pairs2, ham_sum2, t_pairs = run_pairs()
    assert (n_pairs, ham_sum) == (n_pairs2, ham_sum2)

    calib_after = calibrate(cpus)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "calib_chunks_per_core_s": calib,
                "calib_after_chunks_per_core_s": calib_after,
                "n_rows": n_rows,
                "hash_sum": int(hash_sum),
                "n_pairs": n_pairs,
                "ham_sum": ham_sum,
                "t_hash_s": round(t_hash, 3),
                "t_pairs_s": round(t_pairs, 3),
                "wall_s": round(t_hash + t_pairs, 3),
                "rows_per_s": round(n_rows / (t_hash + t_pairs), 1),
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
    ensure_table(n)
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
    for k in ("n_rows", "hash_sum", "n_pairs", "ham_sum"):
        assert lo_leg[k] == hi_leg[k], (k, lo_leg[k], hi_leg[k])
    ratio = hi_leg["cpus"] / lo_leg["cpus"]
    eff = (lo_leg["wall_s"] / hi_leg["wall_s"]) / ratio
    clock = lo_leg["calib_chunks_per_core_s"] / hi_leg["calib_chunks_per_core_s"]
    print(
        json.dumps(
            {
                "n_images": n,
                "low": lo_leg,
                "high": hi_leg,
                "scaling_efficiency_raw": round(eff, 3),
                "scaling_efficiency_clock_normalized": round(eff * clock, 3),
                "phase_efficiency_raw": {
                    "t_hash_s": round(
                        lo_leg["t_hash_s"] / hi_leg["t_hash_s"] / ratio, 3
                    ),
                    "t_pairs_s": round(
                        lo_leg["t_pairs_s"] / hi_leg["t_pairs_s"] / ratio, 3
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
