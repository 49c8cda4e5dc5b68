"""Resumable per-cell-partition execution with lineage + row-count metrics.

The north rule requires runs to be resumable from per-cell-partition
checkpoints. Design (SURVEY §2.9): the input is hashed into `n_buckets`
cell buckets (pmod over the spatial cell id, so a bucket is a stable
geographic slice); the driver processes buckets in batches, appending

  - output rows to `<out>/data/` partitioned by `__bucket`
  - one progress row per finished bucket to `<out>/_progress/`:
    (run_id, bucket, rows_in, rows_out, wall_ms, input_snapshot, batch_ts)

A resumed run (same run_id + output dir) reads the progress table and
anti-joins done buckets — only unfinished slices recompute. The progress
table doubles as the lineage record: which snapshot produced which bucket,
with row counts in/out.

This is deliberately a batch driver loop, not Structured Streaming — the
reference is a daily batch job (its dated-cache incrementality,
Osmalyzer/Data/AnalysisData.cs:102-191, is file-level resume; this is the
distributed analog at cell granularity).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROGRESS_SCHEMA = (
    "run_id string, bucket int, rows_in long, rows_out long, "
    "wall_ms long, input_snapshot string, batch_ts double"
)


@dataclass
class CheckpointedRun:
    out_path: str
    run_id: str
    n_buckets: int = 64
    buckets_per_batch: int = 16

    @property
    def _data_path(self) -> str:
        return os.path.join(self.out_path, "data")

    @property
    def _progress_path(self) -> str:
        return os.path.join(self.out_path, "_progress")

    def done_buckets(self, spark: SparkSession) -> set[int]:
        try:
            rows = (
                spark.read.schema(PROGRESS_SCHEMA)
                .parquet(self._progress_path)
                .filter(F.col("run_id") == self.run_id)
                .select("bucket")
                .collect()
            )
            return {r["bucket"] for r in rows}
        except Exception:  # noqa: BLE001 — no progress yet
            return set()

    def run(
        self,
        spark: SparkSession,
        inp: DataFrame,
        process: Callable[[DataFrame], DataFrame],
        bucket_expr,
        input_snapshot: str = "",
        fail_after_batches: int | None = None,
    ) -> DataFrame:
        """Process `inp` bucket-batch by bucket-batch, resumably.

        bucket_expr: Column -> int bucket in [0, n_buckets) — usually
        pmod(cell_id or xxhash64(id), n_buckets). `process` maps a bucket
        slice to its output (must include no `__bucket` column; it is
        attached here). `fail_after_batches` is a test hook simulating a
        mid-run crash.

        Returns the complete output DataFrame (all buckets of run_id).
        """
        inp = inp.withColumn("__bucket", bucket_expr.cast("int"))
        done = self.done_buckets(spark)
        pending = [b for b in range(self.n_buckets) if b not in done]
        batches = [
            pending[i : i + self.buckets_per_batch]
            for i in range(0, len(pending), self.buckets_per_batch)
        ]
        for bi, batch in enumerate(batches):
            if fail_after_batches is not None and bi >= fail_after_batches:
                raise RuntimeError(f"simulated crash before batch {bi}")
            import inspect

            wants_bucket = "bucket" in inspect.signature(process).parameters
            progress_rows = []
            for b in batch:
                t0 = time.time()
                slice_df = inp.filter(F.col("__bucket") == b).persist()
                rows_in = slice_df.count()
                # output rows need not carry the bucketing columns — the
                # bucket id is stamped as a literal per processed slice.
                # `process(df, bucket=b)` lets the caller co-bucket side
                # inputs (e.g. the correlator's item table).
                produced = (
                    process(slice_df.drop("__bucket"), bucket=int(b))
                    if wants_bucket
                    else process(slice_df.drop("__bucket"))
                )
                out = produced.withColumn("__bucket", F.lit(int(b)))
                out.write.mode("append").partitionBy("__bucket").parquet(self._data_path)
                rows_out = (
                    spark.read.parquet(self._data_path)
                    .filter(F.col("__bucket") == b)
                    .count()
                )
                slice_df.unpersist()
                progress_rows.append(
                    (
                        self.run_id,
                        int(b),
                        int(rows_in),
                        int(rows_out),
                        int((time.time() - t0) * 1000),
                        input_snapshot,
                        time.time(),
                    )
                )
            # progress lands once per batch: a crash mid-batch redoes at
            # most buckets_per_batch buckets (idempotent: their data dirs
            # are overwritten by the partitioned append of the rerun only
            # if they never reached progress — rows_out is read back from
            # disk so duplicates from a half-written bucket are visible)
            spark.createDataFrame(progress_rows, PROGRESS_SCHEMA).write.mode(
                "append"
            ).parquet(self._progress_path)
        return spark.read.parquet(self._data_path).drop("__bucket")

    def metrics(self, spark: SparkSession) -> DataFrame:
        """The lineage/metrics table for this run."""
        return (
            spark.read.schema(PROGRESS_SCHEMA)
            .parquet(self._progress_path)
            .filter(F.col("run_id") == self.run_id)
        )
