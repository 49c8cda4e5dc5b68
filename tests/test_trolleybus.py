"""TrolleybusWireAnalyzer semantics (Osmalyzer/Analyzers/Public Transport/
TrolleybusWireAnalyzer.cs) over hand-built nested relations."""

from pyspark.sql import functions as F

from osmalyzer_spark.plans.analyzers import (
    trolleybus_wire_check,
    trolleybus_wire_stats,
)


def _routes(spark, rows):
    # rows: (id, name, [(type, ref, role), ...])
    return spark.createDataFrame(
        [(i, {"name": n}, [(t, r, ro) for t, r, ro in m]) for i, n, m in rows],
        "id long, tags map<string,string>, "
        "members array<struct<type string, ref long, role string>>",
    )


def _ways(spark, rows):
    # rows: (id, {tagkey: value})
    return spark.createDataFrame(
        list(rows), "id long, tags map<string,string>"
    )


def test_classification_branches(spark):
    ways = _ways(
        spark,
        [
            (1, {"trolley_wire": "yes"}),
            (2, {"trolley_wire": "no"}),
            (3, {"trolley_wire": "bad"}),
            (4, {"trolley_wire": "yes", "trolley_wire:forward": "yes"}),
            (5, {"trolley_wire:forward": "yes"}),
            (6, {"trolley_wire:forward": "maybe"}),
            (7, {"trolley_wire:backward": "no"}),
            (8, {"trolley_wire:backward": "nope"}),
            (9, {"trolley_wire:forward": "m", "trolley_wire:backward": "n"}),
            (10, {}),
        ],
    )
    routes = _routes(
        spark,
        [(100, "Trolleybus 7", [("way", i, "") for i in range(1, 11)])],
    )
    out = trolleybus_wire_check(routes, ways)
    got = sorted((r["way_id"], r["issue"]) for r in out.collect())
    assert got == [
        (3, "unknown_value"),
        (4, "conflicting_subvalues"),
        (6, "unknown_forward_value"),
        (8, "unknown_backward_value"),
        (9, "unknown_backward_value"),  # BOTH directional issues fire
        (9, "unknown_forward_value"),
        (10, "missing"),
    ]
    assert out.select("route_name").distinct().collect()[0][0] == "Trolleybus 7"


def test_member_skipping_and_duplicates(spark):
    ways = _ways(spark, [(1, {}), (2, {})])
    routes = _routes(
        spark,
        [
            # way 1 via platform role -> skipped entirely
            # node member with ref colliding with way 2's id -> skipped
            # dangling way ref 99 (unresolved) -> skipped
            (100, "A", [("way", 1, "platform"), ("node", 2, ""), ("way", 99, "")]),
            # way 2 twice in one relation -> checked twice (per-member loop)
            (101, "B", [("way", 2, ""), ("way", 2, "stop")]),
            # way 2 on a second route -> checked again
            (102, "C", [("way", 2, "")]),
        ],
    )
    out = trolleybus_wire_check(routes, ways).collect()
    assert all(r["issue"] == "missing" for r in out)
    got = sorted((r["relation_id"], r["way_id"]) for r in out)
    assert got == [(101, 2), (101, 2), (102, 2)]


def test_stats_distinct_ways(spark):
    ways = _ways(
        spark,
        [
            (1, {"trolley_wire": "yes"}),
            (2, {"trolley_wire": "yes"}),
            (3, {"trolley_wire": "no"}),
            (4, {}),
        ],
    )
    routes = _routes(
        spark,
        [
            (100, "A", [("way", 1, ""), ("way", 2, ""), ("way", 3, "")]),
            (101, "B", [("way", 1, ""), ("way", 4, "")]),  # way 1 again
        ],
    )
    row = trolleybus_wire_stats(routes, ways).collect()[0]
    # distinct counts, matching the reference's Contains-deduped lists
    assert row["n_routed_ways"] == 4
    assert row["n_wire_yes"] == 2
    assert row["n_wire_no"] == 1


def test_no_issues_is_empty(spark):
    ways = _ways(spark, [(1, {"trolley_wire": "yes"}), (2, {"trolley_wire": "no"})])
    routes = _routes(spark, [(100, "A", [("way", 1, ""), ("way", 2, "")])])
    assert trolleybus_wire_check(routes, ways).count() == 0
