"""Custom stateful streaming operators (applyInPandasWithState).

The engine's incremental-ingest extension beyond the reference's daily
batch (SURVEY §2.9): exactly-once streaming deduplication whose seen-set
lives in Spark's state store — state survives query restarts via the
checkpoint, so a key admitted in one run is still suppressed in the
next. This is the streaming counterpart of operators/dedup.exact_dedup
(and unlike dropDuplicates-with-watermark, the state is explicit,
inspectable, and unbounded-by-design for content-addressed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def dedup_stream(df: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Streaming exact dedup: the FIRST row per key (lowest id within its
    arrival micro-batch) passes through; every later arrival of the same
    key — same batch, later batch, or after a restart — is dropped.

    df must be a streaming DataFrame. Output schema == input schema.
    """
    import pandas as pd

    out_schema = df.schema
    state_schema = "n_seen long"

    def fn(key, pdfs, state):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            (n,) = state.get
            state.update((int(n) + len(rows),))
            return
        if len(rows):
            state.update((int(len(rows)),))
            yield rows.sort_values(id_col).head(1)

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
