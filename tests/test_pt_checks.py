"""Duplicate-platform and PT access-tag checks (reference Public
Transport group) over hand-built micro-fixtures."""

from osmalyzer_spark.plans.pt_checks import (
    duplicate_platforms,
    pt_access_check,
)

# ~9 m and ~28 m of latitude at the reference earth radius
_NEAR = 0.00008
_FAR = 0.00025


def _pts(spark, rows):
    # rows: (id, {tag: value}, lat, lon)
    return spark.createDataFrame(
        list(rows), "id long, tags map<string,string>, lat double, lon double"
    )


def test_duplicate_platforms_radius_and_grouping(spark):
    nodes = _pts(
        spark,
        [
            (1, {"public_transport": "platform"}, 56.95, 24.1),
            (2, {"public_transport": "platform"}, 56.96, 24.1),   # nothing near
            (3, {"highway": "bus_stop"}, 56.95, 24.1),            # not platform
            (4, {"public_transport": "platform"}, 56.97, 24.1),
        ],
    )
    ways = _pts(
        spark,
        [
            (10, {"public_transport": "platform"}, 56.95 + _NEAR, 24.1),
            (11, {"public_transport": "platform"}, 56.95 - _NEAR, 24.1),
            (12, {"public_transport": "platform"}, 56.95 + _FAR, 24.1),  # too far
            (13, {"highway": "platform"}, 56.97, 24.1),           # not pt=platform
        ],
    )
    out = {r.node_id: r for r in duplicate_platforms(nodes, ways).collect()}
    assert set(out) == {1}
    assert out[1].n_dup_ways == 2 and out[1].way_ids == "10,11"


def _routes(spark, rows):
    # rows: (id, {tag: value}, [(type, ref, role)])
    return spark.createDataFrame(
        list(rows),
        "id long, tags map<string,string>, "
        "members array<struct<type string, ref long, role string>>",
    )


def _ways(spark, rows):
    return spark.createDataFrame(list(rows), "id long, tags map<string,string>")


def test_pt_access_route_way_extraction(spark):
    routes = _routes(
        spark,
        [
            (1, {"type": "route", "route": "bus"},
             [("way", 10, ""), ("way", 11, "platform"), ("node", 12, ""),
              ("way", 13, ""), ("way", 99, "")]),          # 99 unresolved
            (2, {"type": "route", "route": "railway"}, [("way", 14, "")]),
            (3, {"type": "route", "disused:route": "trolleybus"},
             [("way", 10, "")]),                           # dup of way 10
            (4, {"route": "bus"}, [("way", 15, "")]),      # no type=route
        ],
    )
    ways = _ways(
        spark,
        [
            (10, {"bus": "no"}),
            (11, {"bus": "no"}),       # platform role: skipped
            (13, {"access": "lane"}),  # unexpected access value
            (14, {"bus": "no"}),       # railway route: skipped
            (15, {"bus": "no"}),       # non-route relation: skipped
        ],
    )
    out = pt_access_check(routes, ways).collect()
    got = {(r.way_id, r.issue, r.value) for r in out}
    # way 10 reported once despite two routes
    assert got == {(10, "blocking_bus", "no"), (13, "unexpected_access", "lane")}


def test_pt_access_issue_ladder(spark):
    routes = _routes(
        spark,
        [(1, {"type": "route", "route": "tram"},
          [("way", i, "") for i in range(20, 35)])],
    )
    ways = _ways(
        spark,
        [
            (20, {"bus": "yes"}),                                 # redundant/no_access
            (21, {"bus": "yes", "access": "yes"}),                # redundant/access_yes
            (22, {"bus": "yes", "access": "no", "vehicle": "yes"}),  # redundant/vehicle_yes
            (23, {"bus": "yes", "vehicle": "yes"}),               # access null+vehicle set: fine
            (24, {"access": "private"}),                          # bad_bus missing
            (25, {"access": "no", "bus": "hello"}),               # bad_bus unexpected
            (26, {"access": "destination", "bus": "designated"}), # fine
            (27, {"access": "no", "psv": "yes"}),                 # psv suppresses bad_bus
            (28, {"access": "bus", "bus": "designated"}),         # over access=bus
            (29, {"oneway": "no", "oneway:bus": "yes"}),          # oneway_bus on non-oneway
            (30, {"oneway": "-1"}),                               # unexpected oneway
            (31, {"oneway": "yes", "oneway:bus": "no"}),          # fine
            (32, {"psv": "no", "bus": "no"}),                     # psv=no, bus already no
            (33, {"oneway:psv": "no", "oneway:bus": "yes"}),      # twin differs
            (34, {"access": "no", "bus": "no"}),                  # blocking AND bad_bus
        ],
    )
    rows = pt_access_check(routes, ways).collect()
    got = {(r.way_id, r.issue, r.value, r.note) for r in rows}
    assert got == {
        (20, "redundant_bus", "yes", "no_access"),
        (21, "redundant_bus", "yes", "access_yes"),
        (22, "redundant_bus", "yes", "vehicle_yes"),
        (24, "bad_bus_on_restricted", "private", "missing_bus"),
        (25, "bad_bus_on_restricted", "hello", "unexpected_bus"),
        (27, "psv_should_be_bus", "yes", "unexpected"),
        (28, "bus_over_access_bus", "designated", None),
        (29, "oneway_bus_on_non_oneway", "yes", None),
        (30, "unexpected_oneway", "-1", None),
        (32, "blocking_bus", "no", None),
        (32, "psv_should_be_bus", "no", "already_set"),
        (33, "oneway_psv_should_be_bus", "no", "bus_differs"),
        (34, "blocking_bus", "no", None),
        (34, "bad_bus_on_restricted", "no", "unexpected_bus"),
    }
