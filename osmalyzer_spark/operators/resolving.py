"""Persistent match-resolution import/suppression (Resolving subsystem).

Reference: /root/reference/Osmalyzer/Resolving/ (Resolvable.cs:10-40,
ResolutionImporter.cs, RuntimeResolution.cs) — a user marks a reported
issue as "resolved"; later runs render that issue as resolved instead of
as an open error. A resolution is identified by (analyzer, issue_id,
subject_key) and carries the structural `revision` it was created
against; a stale revision no longer matches and is skipped
(Resolvable.cs:12-22).

Distributed form: the report table joins a (small, human-curated)
resolutions table on the stable identity — a broadcast left join to
flag, or a left-anti to suppress. No state lives on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# structural revision of the resolution identity (Resolvable.cs:14)
REVISION = 1

IDENTITY = ("analyzer", "issue_id", "subject_key")


def _current(resolutions: DataFrame) -> DataFrame:
    return (
        resolutions.filter(F.col("revision") == REVISION)
        .select(*IDENTITY)
        .distinct()
    )


def mark_resolved(report: DataFrame, resolutions: DataFrame) -> DataFrame:
    """report + boolean `resolved` column.

    report needs the IDENTITY columns (analyzer, issue_id, subject_key);
    resolutions needs them plus `revision`. Stale-revision resolutions
    are ignored. The resolutions side is broadcast — it is human-curated
    and small by construction.
    """
    res = _current(resolutions).withColumn("__resolved", F.lit(True))
    return (
        report.join(F.broadcast(res), list(IDENTITY), "left")
        .withColumn("resolved", F.coalesce("__resolved", F.lit(False)))
        .drop("__resolved")
    )


def suppress_resolved(report: DataFrame, resolutions: DataFrame) -> DataFrame:
    """Drop resolved issues entirely (the reporting-pipeline fast path)."""
    return report.join(F.broadcast(_current(resolutions)), list(IDENTITY), "left_anti")
