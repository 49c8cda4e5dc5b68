"""Mirrors /root/reference/CoreTests/OsmEditingTests.cs semantics over the
event-sourced distributed editing layer (operators/editing.py)."""

import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.operators.editing import (
    CREATED, DELETED, MODIFIED, UNCHANGED, EditSession, apply_edits,
)


@pytest.fixture()
def empty_elements(spark):
    return spark.createDataFrame(
        [], "elem_id long, lat double, lon double, tags map<string,string>"
    )


@pytest.fixture()
def base_elements(spark):
    return spark.createDataFrame(
        [(100, 56.0, 24.0, {"amenity": "bank"})],
        "elem_id long, lat double, lon double, tags map<string,string>",
    )


def rows_of(df):
    return {r["elem_id"]: r for r in df.collect()}


def test_create_node(spark, empty_elements):
    s = EditSession(spark, empty_elements)
    nid = s.create_node(1.0, 2.0)
    out = rows_of(s.snapshot())
    assert set(out) == {nid}
    assert out[nid]["state"] == CREATED
    assert (out[nid]["lat"], out[nid]["lon"]) == (1.0, 2.0)


def test_delete_node(spark, empty_elements):
    s = EditSession(spark, empty_elements)
    nid = s.create_node(1.0, 2.0)
    s.delete_node(nid)
    assert s.snapshot().count() == 0  # OsmData.Nodes hides Deleted
    dead = rows_of(s.snapshot(include_deleted=True))
    assert dead[nid]["state"] == DELETED


def test_restore_node(spark, empty_elements):
    s = EditSession(spark, empty_elements)
    nid = s.create_node(1.0, 2.0)
    s.delete_node(nid)
    s.restore_node(nid)
    out = rows_of(s.snapshot())
    assert out[nid]["state"] == CREATED
    assert (out[nid]["lat"], out[nid]["lon"]) == (1.0, 2.0)


def test_set_and_unset_tag(spark, empty_elements):
    s = EditSession(spark, empty_elements)
    nid = s.create_node(1.0, 2.0)
    s.set_tag(nid, "amenity", "cafe")
    out = rows_of(s.snapshot())
    assert out[nid]["tags"] == {"amenity": "cafe"}
    assert out[nid]["state"] == MODIFIED  # SetValue marks Modified
    s.set_tag(nid, "amenity", None)  # RemoveTag
    out = rows_of(s.snapshot())
    assert out[nid]["tags"] == {}
    assert out[nid]["state"] == MODIFIED


def test_tag_overwrite_and_preexisting(spark, base_elements):
    s = EditSession(spark, base_elements)
    s.set_tag(100, "amenity", "atm")
    s.set_tag(100, "name", "X")
    out = rows_of(s.snapshot())
    assert out[100]["tags"] == {"amenity": "atm", "name": "X"}
    assert out[100]["state"] == MODIFIED


def test_untouched_elements_pass_through(spark, base_elements):
    s = EditSession(spark, base_elements)
    out = rows_of(s.snapshot())
    assert out[100]["state"] == UNCHANGED
    assert out[100]["tags"] == {"amenity": "bank"}


def test_history_initial_state(spark, empty_elements):
    s = EditSession(spark, empty_elements)
    assert not s.can_undo and not s.can_redo
    assert s.undo_count == 0 and s.redo_count == 0
    with pytest.raises(RuntimeError, match="undo"):
        s.undo()
    with pytest.raises(RuntimeError, match="redo"):
        s.redo()


def test_create_undo_redo_undo(spark, empty_elements):
    s = EditSession(spark, empty_elements)
    nid = s.create_node(1.0, 2.0)
    assert s.undo_count == 1
    s.undo()
    assert s.snapshot().count() == 0  # create never replays
    assert s.can_redo and s.redo_count == 1
    s.redo()
    assert rows_of(s.snapshot())[nid]["state"] == CREATED
    s.undo()
    assert s.snapshot().count() == 0


def test_delete_undo(spark, empty_elements):
    s = EditSession(spark, empty_elements)
    nid = s.create_node(1.0, 2.0)
    s.delete_node(nid)
    s.undo()  # undo the delete
    out = rows_of(s.snapshot())
    assert out[nid]["state"] == CREATED


def test_new_command_clears_redo_branch(spark, empty_elements):
    s = EditSession(spark, empty_elements)
    a = s.create_node(1.0, 2.0)
    s.set_tag(a, "k", "v1")
    s.undo()  # v1 off
    assert s.can_redo
    s.set_tag(a, "k", "v2")  # branches: redo stack cleared
    assert not s.can_redo
    out = rows_of(s.snapshot())
    assert out[a]["tags"] == {"k": "v2"}


def test_apply_edits_is_order_deterministic(spark, empty_elements):
    """Same log rows in any DataFrame order produce the same state
    (fold is by seq, not by arrival)."""
    edits = spark.createDataFrame(
        [
            (2, "set_tag", -1, None, None, "k", "late"),
            (0, "create_node", -1, 5.0, 6.0, None, None),
            (1, "set_tag", -1, None, None, "k", "early"),
        ],
        "seq long, op string, elem_id long, lat double, lon double, tag_key string, tag_value string",
    )
    out = rows_of(apply_edits(empty_elements, edits))
    assert out[-1]["tags"] == {"k": "late"}
