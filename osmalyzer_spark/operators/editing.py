"""OSM editing layer — event-sourced, distributed.

Reference: /root/reference/Core/Commands/ (CreateNodeCommand,
DeleteNodeCommand, RestoreNodeCommand, SetTagCommand, History.cs) and
Core/OsmData.cs editing methods, tested by CoreTests/OsmEditingTests.cs.
The reference mutates an in-memory object graph and keeps undo/redo
stacks of inverse commands; the distributed re-expression is an EDIT LOG
as data plus prefix replay:

- edits are rows (seq, op, elem_id, lat, lon, tag_key, tag_value);
- `apply_edits` folds each element's ordered edits over its base row
  with ONE native F.aggregate (no UDF) — create/delete/restore flip
  liveness, set_tag/unset rewrite the tag map and mark Modified,
  mirroring OsmElementState transitions (create->Created,
  set->Modified, delete->Deleted, restore->Created);
- `EditSession` is the History analog: undo/redo move a cursor over the
  log (undo of a create == the create never replays), and recording a
  new edit after an undo truncates the branch — exactly History.cs's
  redo-stack clear. State lives in the log, not in driver objects, so
  the same session replays identically on any cluster size.

The edited snapshot diffs into the existing osmChange sink
(sources/osmchange.py) for upload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# OsmElementState (Core/OsmData.cs)
UNCHANGED = "unchanged"
CREATED = "created"
MODIFIED = "modified"
DELETED = "deleted"

EDITS_SCHEMA = (
    "seq long, op string, elem_id long, lat double, lon double, "
    "tag_key string, tag_value string"
)


def apply_edits(
    elements: DataFrame, edits: DataFrame, include_deleted: bool = False
) -> DataFrame:
    """Replay the edit log over the base elements.

    elements: (elem_id, lat, lon, tags map<string,string>) — the
    pre-existing snapshot (may be empty). edits: EDITS_SCHEMA rows.
    Output: (elem_id, lat, lon, tags, state); deleted elements are
    dropped unless include_deleted (OsmData.Nodes hides Deleted).
    """
    base = elements.select(
        "elem_id",
        F.struct(
            F.lit(True).alias("alive"),
            F.col("lat").alias("lat"),
            F.col("lon").alias("lon"),
            F.coalesce("tags", F.map_from_arrays(F.array(), F.array())).alias("tags"),
            F.lit(UNCHANGED).alias("state"),
        ).alias("base"),
    )
    per_elem = edits.groupBy("elem_id").agg(
        F.array_sort(
            F.collect_list(F.struct("seq", "op", "lat", "lon", "tag_key", "tag_value"))
        ).alias("log")
    )
    joined = per_elem.join(base, "elem_id", "full_outer")
    init = F.coalesce(
        F.col("base"),
        F.struct(
            F.lit(False).alias("alive"),
            F.lit(None).cast("double").alias("lat"),
            F.lit(None).cast("double").alias("lon"),
            F.map_from_arrays(F.array(), F.array()).alias("tags"),
            F.lit(UNCHANGED).alias("state"),
        ),
    )

    def step(acc, e):
        set_tags = F.when(
            e["tag_value"].isNull(),
            # RemoveTag (unset)
            F.map_filter(acc["tags"], lambda k, v: k != e["tag_key"]),
        ).otherwise(
            F.map_concat(
                F.map_filter(acc["tags"], lambda k, v: k != e["tag_key"]),
                F.create_map(e["tag_key"], e["tag_value"]),
            )
        )
        return (
            F.when(
                e["op"] == "create_node",
                F.struct(
                    F.lit(True).alias("alive"),
                    e["lat"].alias("lat"),
                    e["lon"].alias("lon"),
                    acc["tags"].alias("tags"),
                    F.lit(CREATED).alias("state"),
                ),
            )
            .when(
                e["op"] == "delete_node",
                F.struct(
                    F.lit(False).alias("alive"),
                    acc["lat"].alias("lat"),
                    acc["lon"].alias("lon"),
                    acc["tags"].alias("tags"),
                    F.lit(DELETED).alias("state"),
                ),
            )
            .when(
                e["op"] == "restore_node",
                F.struct(
                    F.lit(True).alias("alive"),
                    acc["lat"].alias("lat"),
                    acc["lon"].alias("lon"),
                    acc["tags"].alias("tags"),
                    F.lit(CREATED).alias("state"),
                ),
            )
            .when(
                e["op"] == "set_tag",
                F.struct(
                    acc["alive"].alias("alive"),
                    acc["lat"].alias("lat"),
                    acc["lon"].alias("lon"),
                    set_tags.alias("tags"),
                    F.lit(MODIFIED).alias("state"),
                ),
            )
            .otherwise(acc)
        )

    final = joined.select(
        "elem_id",
        F.aggregate(F.coalesce("log", F.array()), init, step).alias("s"),
    ).select(
        "elem_id",
        F.col("s.lat").alias("lat"),
        F.col("s.lon").alias("lon"),
        F.col("s.tags").alias("tags"),
        F.col("s.state").alias("state"),
        F.col("s.alive").alias("alive"),
    )
    if not include_deleted:
        final = final.filter(F.col("alive")).drop("alive")
    else:
        final = final.drop("alive")
    return final


class EditSession:
    """History.cs as a log cursor: record/undo/redo over the edit list;
    recording after an undo clears the redo branch."""

    def __init__(self, spark: SparkSession, elements: DataFrame):
        self._spark = spark
        self._elements = elements
        self._log: list[tuple] = []
        self._cursor = 0  # edits [0, cursor) are live
        self._next_id = -1  # created elements get fresh negative ids

    # --- recording (clears the redo branch, History.cs:29-35) ------------
    def _record(self, op, elem_id, lat=None, lon=None, key=None, value=None):
        del self._log[self._cursor:]
        self._log.append(
            (len(self._log), op, int(elem_id), lat, lon, key, value)
        )
        self._cursor = len(self._log)

    def create_node(self, lat: float, lon: float) -> int:
        elem_id = self._next_id
        self._next_id -= 1
        self._record("create_node", elem_id, lat=lat, lon=lon)
        return elem_id

    def delete_node(self, elem_id: int) -> None:
        self._record("delete_node", elem_id)

    def restore_node(self, elem_id: int) -> None:
        self._record("restore_node", elem_id)

    def set_tag(self, elem_id: int, key: str, value: str | None) -> None:
        """value=None unsets (RemoveTag)."""
        self._record("set_tag", elem_id, key=key, value=value)

    # --- history (History.cs) ---------------------------------------------
    @property
    def can_undo(self) -> bool:
        return self._cursor > 0

    @property
    def can_redo(self) -> bool:
        return self._cursor < len(self._log)

    @property
    def undo_count(self) -> int:
        return self._cursor

    @property
    def redo_count(self) -> int:
        return len(self._log) - self._cursor

    def undo(self) -> None:
        if not self.can_undo:
            raise RuntimeError("Nothing to undo.")
        self._cursor -= 1

    def redo(self) -> None:
        if not self.can_redo:
            raise RuntimeError("Nothing to redo.")
        self._cursor += 1

    # --- materialization ---------------------------------------------------
    def edits_df(self) -> DataFrame:
        rows = self._log[: self._cursor]
        return self._spark.createDataFrame(rows, EDITS_SCHEMA)

    def snapshot(self, include_deleted: bool = False) -> DataFrame:
        return apply_edits(self._elements, self.edits_df(), include_deleted)
