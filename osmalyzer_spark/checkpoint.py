"""Resumable per-cell-partition execution with lineage + row-count metrics.

The north rule requires runs to be resumable from per-cell-partition
checkpoints. Design (SURVEY §2.9): the input is hashed into `n_buckets`
cell buckets (pmod over the spatial cell id, so a bucket is a stable
geographic slice); output rows land in `<out>/data/` partitioned by
`__bucket`, and one progress row per finished bucket lands in
`<out>/_progress/`:

  (run_id, bucket, rows_in, rows_out, wall_ms, input_snapshot, batch_ts)

A resumed run (same run_id + output dir) reads the progress table and
skips done buckets — only unfinished slices recompute. The progress
table doubles as the lineage record: which snapshot produced which
bucket, with row counts in/out.

Crash safety: every data write uses DYNAMIC partition overwrite
(`spark.sql.sources.partitionOverwriteMode=dynamic` + mode("overwrite")),
so a bucket whose data landed but whose progress row did not is simply
REPLACED on the rerun — resume never duplicates rows, no matter where
the crash fell (verified by the crash-between-data-and-progress test).

Two execution paths:

- `run_single_pass` (the 100 TB path): ONE job computes and writes every
  pending bucket, shuffle-partitioned by `__bucket` — the input is
  scanned once for the output write plus once (column-pruned) for the
  rows_in lineage counts. Requires `process` to be bucket-distributive
  (row-local, or grouping only within keys that never straddle buckets
  — true for any per-cell operator, since buckets are unions of cells).
- `run` (per-bucket loop): for operators that must see exactly one
  bucket per call — e.g. the correlator co-bucketing a second input via
  `process(df, bucket=b)`. This path filters the input once PER BUCKET;
  at scale the input must be stored pre-partitioned by the bucket key so
  each filter is a partition-pruned read, not a full scan.

This is deliberately a batch driver, not Structured Streaming — the
reference is a daily batch job (its dated-cache incrementality,
Osmalyzer/Data/AnalysisData.cs:102-191, is file-level resume; this is
the distributed analog at cell granularity).
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


def _dynamic_overwrite(spark: SparkSession):
    """Ensure bucket-partition writes replace (not duplicate) reruns."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")


def _write_value(spark: SparkSession, value: str, path: str) -> None:
    """One-string marker/record write, via Spark (any Hadoop filesystem).

    Written as a single-partition `range(1).select(lit(value))` parquet:
    a `createDataFrame([...]).coalesce(1)` local-relation write measures
    a ~5 s fixed cost per call in this environment vs ~0.2 s for this
    form (guide §1 measure-first), and these markers are written on
    every checkpointed run."""
    spark.range(0, 1, 1, 1).select(F.lit(value).alias("value")).write.mode(
        "overwrite"
    ).parquet(path)


def _read_value(spark: SparkSession, path: str) -> str:
    """Read back a `_write_value` marker (raises if absent)."""
    rows = spark.read.parquet(path).collect()
    return rows[0]["value"]


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

    def _write_progress(self, spark: SparkSession, rows: list[tuple]) -> None:
        import pandas as pd

        # pandas -> Arrow createDataFrame: ~3x less fixed cost per write
        # than the pickled-rows local relation (measured; guide §6 Arrow)
        pdf = pd.DataFrame(
            rows,
            columns=[
                "run_id", "bucket", "rows_in", "rows_out",
                "wall_ms", "input_snapshot", "batch_ts",
            ],
        )
        spark.createDataFrame(pdf, PROGRESS_SCHEMA).write.mode("append").parquet(
            self._progress_path
        )

    @property
    def _schema_path(self) -> str:
        return os.path.join(self.out_path, "_schema")

    def _write_schema_once(self, spark: SparkSession, df: DataFrame) -> None:
        """Record the output schema so empty runs (zero output rows => a
        partitioned parquet write creates NO files) still yield a typed
        empty result instead of an unreadable directory."""
        try:
            _read_value(spark, self._schema_path)
            return
        except Exception:  # noqa: BLE001 — not recorded yet
            pass
        _write_value(spark, df.schema.json(), self._schema_path)

    def _read_data(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.parquet(self._data_path)
        except Exception:  # noqa: BLE001 — zero rows ever written
            import json

            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(_read_value(spark, self._schema_path)))
            return spark.createDataFrame([], schema)

    def _result(self, spark: SparkSession) -> DataFrame:
        # only buckets with a progress row are part of the result: a data
        # partition without progress is a crashed remnant that will be
        # overwritten on the next resume, not output
        done = sorted(self.done_buckets(spark))
        return (
            self._read_data(spark)
            .filter(F.col("__bucket").isin(done))
            .drop("__bucket")
        )

    def stage_bucketed(
        self,
        spark: SparkSession,
        df: DataFrame,
        name: str,
        bucket_col: str = "__cbucket",
        fingerprint: str = "",
    ) -> DataFrame:
        """Persist a bucketed input partitioned by its bucket column and
        read it back, so every downstream `filter(bucket_col == b)` is a
        PARTITION-PRUNED read of one directory — not a rescan of the whole
        input (the scale requirement `run`'s docstring demands; this
        method is how the engine itself satisfies it).

        Idempotent per (out_path, run_id, name): a resume of the SAME run
        reuses the staging — the bucket layout is deterministic given the
        same input. The `_STAGED` marker records (run_id, fingerprint,
        schema); a reuse whose marker disagrees RAISES instead of silently
        correlating against stale staged data (a new run against the same
        out_path gets a new run_id and therefore a fresh staging
        directory). Pass `fingerprint` (e.g. the input snapshot id) to
        strengthen the check beyond the schema. Marker IO goes through
        Spark itself, so the checkpoint dir may live on any Hadoop
        filesystem (hdfs://, s3a://, ...), not just the local disk.
        """
        import json

        path = os.path.join(self.out_path, "staged", self.run_id, name)
        # our own completion marker: dynamic partitionOverwriteMode (set
        # session-wide by the run paths) suppresses the _SUCCESS file. An
        # underscore-prefixed subdirectory is invisible to the parquet
        # reader, so the marker can live inside the staged dir.
        marker = os.path.join(path, "_STAGED")
        want = json.dumps(
            {
                "run_id": self.run_id,
                "fingerprint": fingerprint,
                "schema": df.schema.simpleString(),
            },
            sort_keys=True,
        )
        try:
            existing = _read_value(spark, marker)
        except Exception:  # noqa: BLE001 — not staged yet
            existing = None
        if existing is None:
            (
                df.repartition(F.col(bucket_col))
                .write.mode("overwrite")
                .partitionBy(bucket_col)
                .parquet(path)
            )
            _write_value(spark, want, marker)
        elif existing != want:
            raise ValueError(
                f"staged input {name!r} at {path} was built from a different "
                f"input (marker {existing} != expected {want}); resume with "
                "the original input, or start a fresh run_id / out_path"
            )
        out = spark.read.parquet(path)
        # partition-column inference yields int already; cast defensively
        # (a cast of a partition column still partition-prunes)
        return out.withColumn(bucket_col, F.col(bucket_col).cast("int"))

    def run_single_pass(
        self,
        spark: SparkSession,
        inp: DataFrame,
        process: Callable[[DataFrame], DataFrame],
        bucket_expr,
        input_snapshot: str = "",
        fail_before_progress: bool = False,
        buckets: list[int] | None = None,
    ) -> DataFrame:
        """Compute and write EVERY pending bucket in one job.

        `process` receives the pending slice of the input with its
        `__bucket` column attached and must preserve that column on its
        output rows (row-local operators keep it for free; grouped
        operators include it in their grouping keys — cells never
        straddle buckets, so this does not change semantics).

        One full input scan for the output write + one column-pruned
        scan for rows_in lineage. `fail_before_progress` is a test hook
        simulating a crash in the data-written/progress-missing window.
        `buckets` restricts the pass to an explicit bucket-id list
        (default: range(n_buckets)) — used when a run splits bucket ids
        between a single-pass phase and a per-bucket phase.
        """
        _dynamic_overwrite(spark)
        inp = inp.withColumn("__bucket", bucket_expr.cast("int"))
        done = self.done_buckets(spark)
        universe = range(self.n_buckets) if buckets is None else buckets
        pending = [b for b in universe if b not in done]
        if pending:
            t0 = time.time()
            slice_df = inp.filter(F.col("__bucket").isin(pending))
            produced = process(slice_df)
            if "__bucket" not in produced.columns:
                raise ValueError(
                    "single-pass process() must preserve the __bucket column"
                )
            self._write_schema_once(spark, produced)
            # rows_out rides the write job as observed metrics instead of
            # re-reading everything just written (an O(output) extra scan
            # at scale; 3 extra driver jobs here). `produced` has exactly
            # one consumer (the write), so CollectMetrics counts each row
            # once; per-bucket conditional sums are cheap next to the
            # parquet encode they replace a decode of. Guarded to a sane
            # expression width — a wider pending set falls back to the
            # post-write aggregation.
            obs_out = None
            if len(pending) <= 512:
                from pyspark.sql import Observation

                obs_out = Observation()
                produced = produced.observe(
                    obs_out,
                    *[
                        F.sum(
                            F.when(F.col("__bucket") == int(b), 1).otherwise(0)
                        ).alias(f"b{int(b)}")
                        for b in pending
                    ],
                )
            (
                produced.repartition("__bucket")
                .write.mode("overwrite")
                .partitionBy("__bucket")
                .parquet(self._data_path)
            )
            if fail_before_progress:
                raise RuntimeError("simulated crash after data, before progress")
            # rows_in lineage: column-pruned aggregation, not a full rescan
            # (cannot be observed: process() may consume the slice through
            # several union branches, which would multi-count the metric)
            rows_in = {
                r["__bucket"]: r["n"]
                for r in slice_df.groupBy("__bucket").agg(F.count(F.lit(1)).alias("n")).collect()
            }
            vals = None
            if obs_out is not None:
                try:
                    vals = obs_out.get
                except Exception:  # noqa: BLE001 — an all-empty write
                    # produces no metrics row (observed empirically):
                    # fall back to the read-back count, which is then a
                    # scan of nothing
                    vals = None
            if vals is not None:
                rows_out = {
                    b: int(vals[f"b{int(b)}"] or 0) for b in pending
                }
            else:
                rows_out = {
                    r["__bucket"]: r["n"]
                    for r in self._read_data(spark)
                    .filter(F.col("__bucket").isin(pending))
                    .groupBy("__bucket")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            wall = int((time.time() - t0) * 1000)
            now = time.time()
            self._write_progress(
                spark,
                [
                    (
                        self.run_id,
                        int(b),
                        int(rows_in.get(b, 0)),
                        int(rows_out.get(b, 0)),
                        wall,
                        input_snapshot,
                        now,
                    )
                    for b in pending
                ],
            )
        return self._result(spark)

    def run(
        self,
        spark: SparkSession,
        inp: DataFrame,
        process: Callable[[DataFrame], DataFrame],
        bucket_expr,
        input_snapshot: str = "",
        fail_after_batches: int | None = None,
        fail_before_progress_batch: int | None = None,
        buckets: list[int] | None = None,
    ) -> DataFrame:
        """Process `inp` bucket by bucket in resumable batches.

        bucket_expr: Column -> int bucket in [0, n_buckets) — usually
        pmod(cell_id or xxhash64(id), n_buckets). `process` maps a bucket
        slice to its output (no `__bucket` column; it is attached here);
        `process(df, bucket=b)` lets the caller co-bucket side inputs
        (e.g. the correlator's item table). At scale, store the input
        pre-partitioned by the bucket key so the per-bucket filter is a
        pruned read — this loop scans the input once per bucket
        otherwise (use run_single_pass for bucket-distributive work).

        `fail_after_batches` simulates a crash before a batch;
        `fail_before_progress_batch` simulates one after a batch's data
        writes but before its progress rows — the dangerous window.

        Returns the complete output DataFrame (all buckets of run_id).
        """
        import inspect

        _dynamic_overwrite(spark)
        inp = inp.withColumn("__bucket", bucket_expr.cast("int"))
        done = self.done_buckets(spark)
        universe = range(self.n_buckets) if buckets is None else buckets
        pending = [b for b in universe if b not in done]
        batches = [
            pending[i : i + self.buckets_per_batch]
            for i in range(0, len(pending), self.buckets_per_batch)
        ]
        wants_bucket = "bucket" in inspect.signature(process).parameters
        for bi, batch in enumerate(batches):
            if fail_after_batches is not None and bi >= fail_after_batches:
                raise RuntimeError(f"simulated crash before batch {bi}")
            progress_rows = []
            for b in batch:
                t0 = time.time()
                slice_df = inp.filter(F.col("__bucket") == b).persist()
                rows_in = slice_df.count()
                produced = (
                    process(slice_df.drop("__bucket"), bucket=int(b))
                    if wants_bucket
                    else process(slice_df.drop("__bucket"))
                )
                out = produced.withColumn("__bucket", F.lit(int(b)))
                self._write_schema_once(spark, out)
                # rows_out rides the write job as an observed count (one
                # consumer, so the metric is exact) instead of re-reading
                # the partition just written
                from pyspark.sql import Observation

                obs_out = Observation()
                out = out.observe(obs_out, F.count(F.lit(1)).alias("n"))
                # dynamic overwrite: replaces ONLY partition __bucket=b,
                # so redoing a bucket after a crash is idempotent
                out.write.mode("overwrite").partitionBy("__bucket").parquet(
                    self._data_path
                )
                try:
                    rows_out = int(obs_out.get["n"] or 0)
                except Exception:  # noqa: BLE001 — empty write, no
                    # metrics row; the read-back scans nothing
                    rows_out = (
                        self._read_data(spark)
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
            if fail_before_progress_batch is not None and bi >= fail_before_progress_batch:
                raise RuntimeError(
                    f"simulated crash after batch {bi} data, before progress"
                )
            self._write_progress(spark, progress_rows)
        return self._result(spark)

    def metrics(self, spark: SparkSession) -> DataFrame:
        """The lineage/metrics table for this run."""
        return (
            spark.read.schema(PROGRESS_SCHEMA)
            .parquet(self._progress_path)
            .filter(F.col("run_id") == self.run_id)
        )
