"""Table reading with Iceberg-first format resolution (S2 literal form).

The driver contract describes the input as an "Iceberg-style table". In
this sandbox the Iceberg runtime jar is absent, so reads fall back to
plain parquet — but when the jar IS on the classpath (a real cluster),
`read_table` reads through the Iceberg source and `snapshot_id` returns
the current snapshot for checkpoint lineage (checkpoint.py's
input_snapshot column), making the dated-cache analog literal:
a resumed run records exactly which table snapshot produced each bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Read `path` as Iceberg when requested/available, else parquet.

    fmt: force 'iceberg' or 'parquet'; None = iceberg if the runtime is
    on the classpath, parquet otherwise.
    """
    if fmt is None:
        fmt = "iceberg" if iceberg_available(spark) else "parquet"
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def snapshot_id(spark: SparkSession, path: str) -> str:
    """Lineage token for checkpoint.py's input_snapshot: the Iceberg
    current-snapshot id when available, else a deterministic digest of
    the parquet file listing (name+size), which changes whenever the
    input files do."""
    if iceberg_available(spark):
        row = (
            spark.read.format("iceberg")
            .load(f"{path}#snapshots")
            .orderBy("committed_at", ascending=False)
            .select("snapshot_id")
            .first()
        )
        if row is not None:
            return f"iceberg:{row['snapshot_id']}"
    import hashlib
    import os

    h = hashlib.md5()
    try:
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                st = os.stat(os.path.join(path, name))
                h.update(f"{name}:{st.st_size}".encode())
    except OSError:
        h.update(path.encode())
    return f"files:{h.hexdigest()[:16]}"
