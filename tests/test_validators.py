"""Validation analyzer semantics (reference Analyzers/Validation/) over
hand-built element micro-fixtures: BarrierConnectionAnalyzer,
BridgeAndWaterConnectionAnalyzer, CrossingConsistencyAnalyzer,
TerminatingWaysAnalyzer."""

import pytest

from osmalyzer_spark.plans.validators import (
    barrier_connections,
    bridge_water_connections,
    crossing_consistency,
    terminating_ways,
)


def _ways(spark, rows):
    # rows: (id, {tag: value}, [node ids])
    return spark.createDataFrame(
        list(rows), "id long, tags map<string,string>, node_ids array<long>"
    )


def _nodes(spark, rows, coords=False):
    # rows: (id, {tag: value}) or (id, {tag: value}, lat, lon)
    schema = "id long, tags map<string,string>"
    if coords:
        schema += ", lat double, lon double"
    return spark.createDataFrame(list(rows), schema)


# --------------------------------------------------------------------- q42


def test_barrier_basic_misconnection(spark):
    ways = _ways(
        spark,
        [
            (1, {"barrier": "fence"}, [10, 11, 12]),
            (2, {"highway": "residential"}, [12, 13]),
        ],
    )
    nodes = _nodes(spark, [(10, {}), (11, {}), (12, {}), (13, {})])
    out = barrier_connections(ways, nodes).collect()
    assert [(r.node_id, r.barrier_id, r.highway_id) for r in out] == [(12, 1, 2)]
    assert out[0].barrier_value == "fence" and out[0].highway_value == "residential"


def test_barrier_passable_values_skipped(spark):
    # gate-like barrier values are passable (BarrierConnectionAnalyzer.cs:49-61)
    ways = _ways(
        spark,
        [
            (1, {"barrier": "gate"}, [10, 11]),
            (2, {"barrier": "cattle_grid"}, [11, 12]),
            (3, {"highway": "residential"}, [10, 11, 12]),
        ],
    )
    nodes = _nodes(spark, [(10, {}), (11, {}), (12, {})])
    assert barrier_connections(ways, nodes).count() == 0


def test_barrier_gate_node_and_area_skipped(spark):
    ways = _ways(
        spark,
        [
            (1, {"barrier": "wall"}, [10, 11, 12, 13]),
            # shared node 10 is itself a gate -> fine (:65-66)
            (2, {"highway": "footway"}, [10, 20]),
            # explicit area -> fine (:81-84)
            (3, {"highway": "pedestrian", "area": "yes"}, [11, 21]),
            # closed platform -> implicit area -> fine (:88-89)
            (4, {"highway": "platform"}, [12, 22, 23, 12]),
            # open platform still reports
            (5, {"highway": "platform"}, [13, 24]),
        ],
    )
    nodes = _nodes(spark, [(i, {}) for i in (11, 12, 13, 20, 21, 22, 23, 24)] + [(10, {"barrier": "gate"})])
    out = barrier_connections(ways, nodes).collect()
    assert [(r.node_id, r.barrier_id, r.highway_id) for r in out] == [(13, 1, 5)]


def test_barrier_self_join_excluded(spark):
    # a way with both keys must not match itself
    ways = _ways(spark, [(1, {"barrier": "wall", "highway": "service"}, [10, 11])])
    nodes = _nodes(spark, [(10, {}), (11, {})])
    assert barrier_connections(ways, nodes).count() == 0


# --------------------------------------------------------------------- q43


def test_bridge_water_groups_and_average(spark):
    ways = _ways(
        spark,
        [
            (1, {"bridge": "yes", "highway": "primary"}, [10, 11, 12]),
            (2, {"waterway": "river"}, [10, 12, 20]),
            (3, {"waterway": "dam"}, [11, 21]),  # dams excepted (:58-59)
        ],
    )
    nodes = _nodes(
        spark,
        [(10, {}, 56.0, 24.0), (11, {}, 57.0, 25.0), (12, {}, 58.0, 26.0),
         (20, {}, 50.0, 20.0), (21, {}, 51.0, 21.0)],
        coords=True,
    )
    out = bridge_water_connections(ways, nodes).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.bridge_id, r.waterway_id, r.n_points) == (1, 2, 2)
    assert r.avg_lat == pytest.approx(57.0) and r.avg_lon == pytest.approx(25.0)


# --------------------------------------------------------------------- q44


def _crossing_fixture(spark, way_tags, node_tags, extra_nodes=()):
    base_way = {"highway": "footway", "footway": "crossing"}
    ways = _ways(spark, [(1, {**base_way, **way_tags}, [10, 11, 12])])
    nodes = _nodes(
        spark,
        [(11, {"highway": "crossing", **node_tags})] + [(n, t) for n, t in extra_nodes],
    )
    return ways, nodes


def test_crossing_mismatch_and_severity(spark):
    ways, nodes = _crossing_fixture(
        spark, {"crossing": "marked"}, {"crossing": "traffic_signals"}
    )
    out = crossing_consistency(ways, nodes).collect()
    # lone marked-vs-traffic_signals is the known legacy case (:118-131)
    assert [(r.tag, r.way_value, r.node_value, r.severity) for r in out] == [
        ("crossing", "marked", "traffic_signals", "common")
    ]


def test_crossing_two_issues_bad(spark):
    ways, nodes = _crossing_fixture(
        spark,
        {"crossing": "marked", "lit": "yes"},
        {"crossing": "traffic_signals", "lit": "no"},
    )
    out = crossing_consistency(ways, nodes).collect()
    assert len(out) == 2 and all(r.severity == "bad" for r in out)


def test_crossing_values_match_semicolon_sets(spark):
    # zebra;dots vs dots; zebra are ValuesMatch-equal (TagUtils.cs:21-47)
    ways, nodes = _crossing_fixture(
        spark, {"crossing:markings": "zebra;dots"}, {"crossing:markings": "dots; zebra"}
    )
    assert crossing_consistency(ways, nodes).count() == 0
    # but a plain value never set-matches a list
    ways, nodes = _crossing_fixture(
        spark, {"crossing:markings": "zebra"}, {"crossing:markings": "dots;zebra"}
    )
    out = crossing_consistency(ways, nodes).collect()
    assert [(r.tag, r.severity) for r in out] == [("crossing:markings", "bad")]


def test_crossing_tactile_paving_allowance(spark):
    # way=no vs node=yes/incorrect is kerb paving, allowed (:105-115)
    ways, nodes = _crossing_fixture(
        spark, {"tactile_paving": "no"}, {"tactile_paving": "yes"}
    )
    assert crossing_consistency(ways, nodes).count() == 0
    # the reverse is still an issue
    ways, nodes = _crossing_fixture(
        spark, {"tactile_paving": "yes"}, {"tactile_paving": "no"}
    )
    assert crossing_consistency(ways, nodes).count() == 1


def test_crossing_button_operated_counted_twice(spark):
    # the reference tag list contains button_operated twice (:70-82)
    ways, nodes = _crossing_fixture(
        spark, {"button_operated": "yes"}, {"button_operated": "no"}
    )
    out = crossing_consistency(ways, nodes).collect()
    assert len(out) == 2 and {r.tag for r in out} == {"button_operated"}


def test_crossing_requires_exactly_one_node(spark):
    # two crossing nodes on the way -> no pair (GatherCrossings :190-192)
    ways = _ways(
        spark,
        [(1, {"highway": "path", "footway": "crossing", "crossing": "marked"}, [10, 11, 12])],
    )
    nodes = _nodes(
        spark,
        [(10, {"highway": "crossing", "crossing": "uncontrolled"}),
         (11, {"highway": "crossing", "crossing": "uncontrolled"})],
    )
    assert crossing_consistency(ways, nodes).count() == 0


# --------------------------------------------------------------------- q45

_AREA = {"amenity": "parking"}


def test_terminating_way_reported(spark):
    ways = _ways(
        spark,
        [
            (1, _AREA, [10, 11, 12, 13, 10]),        # closed area ring
            (2, {"highway": "footway"}, [11, 20, 21]),  # dead-ends on ring
        ],
    )
    out = terminating_ways(ways).collect()
    assert [(r.area_id, r.node_id, r.way_id) for r in out] == [(1, 11, 2)]


def test_terminating_blocked_by_passing_way(spark):
    ways = _ways(
        spark,
        [
            (1, _AREA, [10, 11, 12, 13, 10]),
            (2, {"highway": "footway"}, [11, 20]),
            # another routable way at node 11 passes through -> blocks (:80-88)
            (3, {"highway": "service"}, [21, 11, 22]),
        ],
    )
    assert terminating_ways(ways).count() == 0


def test_terminating_needs_endpoint_and_single_ring_node(spark):
    ways = _ways(
        spark,
        [
            (1, _AREA, [10, 11, 12, 13, 10]),
            # touches ring mid-way, not at an endpoint -> passes through
            (2, {"highway": "track"}, [20, 11, 21]),
            # endpoint on ring but a second node also on the ring -> not terminating
            (3, {"highway": "path"}, [12, 13, 30]),
        ],
    )
    assert terminating_ways(ways).count() == 0


def test_terminating_nonroutable_ignored(spark):
    ways = _ways(
        spark,
        [
            (1, _AREA, [10, 11, 12, 13, 10]),
            (2, {"highway": "proposed"}, [11, 20]),  # not routable -> invisible
        ],
    )
    assert terminating_ways(ways).count() == 0


def test_terminating_pedestrian_area_blocks_itself(spark):
    # the area way itself is routable (highway=pedestrian) and passes
    # through its own ring, so its nodes never report (:73)
    ways = _ways(
        spark,
        [
            (1, {"highway": "pedestrian", "area": "yes"}, [10, 11, 12, 13, 10]),
            (2, {"highway": "footway"}, [11, 20]),
        ],
    )
    assert terminating_ways(ways).count() == 0


def test_terminating_closed_way_never_terminates(spark):
    # a closed routable way touching the ring at its endpoint is passing,
    # not terminating: the closing duplicate defeats WayTerminatesAtEdge
    # (:111-119) -- and therefore blocks other candidates at the node
    ways = _ways(
        spark,
        [
            (1, _AREA, [10, 11, 12, 13, 10]),
            (2, {"highway": "footway"}, [11, 20]),
            (3, {"highway": "track"}, [11, 30, 31, 11]),  # closed loop at 11
        ],
    )
    assert terminating_ways(ways).count() == 0


# --------------------------------------------------------------------- q46


def _tagged_ways(spark, rows):
    # rows: (id, {tag: value}) — no geometry needed
    return spark.createDataFrame(list(rows), "id long, tags map<string,string>")


def test_lifecycle_plain_leftovers(spark):
    from osmalyzer_spark.plans.validators import lifecycle_leftovers

    ways = _tagged_ways(
        spark,
        [
            (1, {"highway": "residential", "proposed": "yes"}),
            (2, {"railway": "rail", "razed": "yes", "planned": "yes"}),
            (3, {"highway": "primary"}),  # clean
        ],
    )
    out = lifecycle_leftovers(ways).collect()
    got = sorted((r.way_id, r.main_tag, r.main_value, r.tag, r.value) for r in out)
    assert got == [
        (1, "highway", "residential", "proposed", "yes"),
        (2, "railway", "rail", "planned", "yes"),
        (2, "railway", "rail", "razed", "yes"),
    ]


def test_lifecycle_exceptions_and_main_skip(spark):
    from osmalyzer_spark.plans.validators import lifecycle_leftovers

    ways = _tagged_ways(
        spark,
        [
            # construction=minor is a valid special case (:79-80)
            (1, {"highway": "primary", "construction": "minor"}),
            # disused=yes on a live (non-lifecycle) value is common (:82-84)
            (2, {"railway": "rail", "disused": "yes"}),
            # ... but on a lifecycle main value it IS a leftover
            (3, {"highway": "proposed", "disused": "yes"}),
            # prefix equal to the main value is skipped entirely (:67-68)
            (4, {"highway": "proposed", "proposed": "yes"}),
            # both main keys -> we don't know how to deal with this (:53-57)
            (5, {"highway": "residential", "railway": "rail", "razed": "yes"}),
        ],
    )
    out = lifecycle_leftovers(ways).collect()
    got = sorted((r.way_id, r.tag, r.value) for r in out)
    assert got == [(3, "disused", "yes")]


def test_lifecycle_compound_keys(spark):
    from osmalyzer_spark.plans.validators import lifecycle_leftovers

    ways = _tagged_ways(
        spark,
        [
            # compound construction:<main> has NO minor exception
            (1, {"highway": "primary", "construction:primary": "minor"}),
            # compound disused:<main> has NO yes-on-live exception
            (2, {"railway": "rail", "disused:rail": "yes"}),
            # compound key for a DIFFERENT value is not probed
            (3, {"highway": "primary", "construction:secondary": "minor"}),
        ],
    )
    out = lifecycle_leftovers(ways).collect()
    got = sorted((r.way_id, r.tag, r.value) for r in out)
    assert got == [
        (1, "construction:primary", "minor"),
        (2, "disused:rail", "yes"),
    ]


# --------------------------------------------------------------------- q47


def _routes(spark, rows):
    # rows: (id, {tag: value}, [way refs])
    return spark.createDataFrame(
        [(i, t, [("way", r, "") for r in refs]) for i, t, refs in rows],
        "id long, tags map<string,string>, "
        "members array<struct<type string, ref long, role string>>",
    )


_ROAD = {"type": "route", "route": "road"}


def test_street_continuity_mismatch(spark):
    from osmalyzer_spark.plans.validators import street_tagging_continuity

    ways = _tagged_ways(
        spark,
        [
            (1, {"highway": "residential", "name": "A iela"}),
            (2, {"highway": "residential", "name": "B iela"}),
            (3, {"highway": "residential", "name": "A iela", "wikidata": "Q1"}),
        ],
    )
    routes = _routes(spark, [(10, _ROAD, [1, 2, 3])])
    out = street_tagging_continuity(ways, routes).collect()
    got = {(r.tag): (r.n_values, r.values) for r in out}
    assert got["name"] == (2, "A iela,B iela")
    # missing values count as a distinct 'empty' value (:192-196)
    assert got["wikidata"] == (2, "<empty>,Q1")


def test_street_continuity_multi_route_ways_skipped(spark):
    from osmalyzer_spark.plans.validators import street_tagging_continuity

    ways = _tagged_ways(
        spark,
        [
            (1, {"highway": "primary", "name": "X"}),
            (2, {"highway": "primary", "name": "Y"}),  # in both routes
        ],
    )
    routes = _routes(spark, [(10, _ROAD, [1, 2]), (11, _ROAD, [2])])
    # way 2 is multi-route -> contributes nothing; each street is uniform
    assert street_tagging_continuity(ways, routes).count() == 0


def test_street_continuity_filters(spark):
    from osmalyzer_spark.plans.validators import street_tagging_continuity

    ways = _tagged_ways(
        spark,
        [
            (1, {"highway": "residential", "name": "A"}),
            (2, {"highway": "residential", "name": "B"}),
            (3, {"highway": "footway", "name": "C"}),  # not street-forming
        ],
    )
    routes = _routes(
        spark,
        [
            (10, {**_ROAD, "network": "lv:local"}, [1, 2]),  # network -> excluded
            (11, {"type": "route", "route": "bicycle"}, [1, 2]),  # not road
            (12, _ROAD, [1, 3]),  # way 3 filtered -> single segment, uniform
        ],
    )
    assert street_tagging_continuity(ways, routes).count() == 0


# --------------------------------------------------------------------- q48


def _speed_ways(spark, rows):
    # rows: (id, {tag: value}, lat, lon)
    return spark.createDataFrame(
        list(rows), "id long, tags map<string,string>, lat double, lon double"
    )


def test_speed_limit_groups(spark):
    from osmalyzer_spark.plans.validators import highway_speed_check

    ways = _speed_ways(
        spark,
        [
            # two unpaved-90 segments grouped under the same ref
            (1, {"highway": "primary", "maxspeed": "90", "surface": "gravel", "ref": "P1"}, 56.0, 24.0),
            (2, {"highway": "primary", "maxspeed": "90", "surface": "dirt", "ref": "P1"}, 58.0, 26.0),
            # paved-80, grouped by name (no ref)
            (3, {"highway": "residential", "maxspeed": "80", "surface": "asphalt", "name": "A iela"}, 57.0, 25.0),
            # signed -> excluded (HighwaySpeedLimitAnalyzer.cs:48,80)
            (4, {"highway": "primary", "maxspeed": "90", "surface": "gravel", "ref": "P2", "maxspeed:type": "sign"}, 56.0, 24.0),
            # zone90 tag -> excluded
            (5, {"highway": "primary", "maxspeed": "90", "surface": "gravel", "ref": "P3", "maxspeed:type": "LV:zone90"}, 56.0, 24.0),
            # paved at 90 is fine
            (6, {"highway": "primary", "maxspeed": "90", "surface": "asphalt", "ref": "P4"}, 56.0, 24.0),
            # neither ref nor name -> dropped from the report (OsmData.cs:376-398)
            (7, {"highway": "primary", "maxspeed": "90", "surface": "gravel"}, 56.0, 24.0),
            # unchecked highway class
            (8, {"highway": "track", "maxspeed": "90", "surface": "gravel", "ref": "P5"}, 56.0, 24.0),
        ],
    )
    out = {(r.category, r.group_value): r for r in highway_speed_check(ways).collect()}
    assert set(out) == {("unpaved90", "P1"), ("paved80", "A iela")}
    g = out[("unpaved90", "P1")]
    assert g.n_segments == 2 and g.surfaces == "dirt,gravel" and g.refs == "P1"
    assert g.avg_lat == pytest.approx(57.0) and g.avg_lon == pytest.approx(25.0)


# --------------------------------------------------------------------- q49


def test_lone_crossing_categories(spark):
    from osmalyzer_spark.plans.validators import lone_crossings

    ways = _ways(
        spark,
        [
            (1, {"highway": "residential"}, [10, 11]),
            (2, {"highway": "footway"}, [11, 12]),
            (3, {"highway": "cycleway"}, [13, 12]),
            (4, {"railway": "tram"}, [14, 15]),
        ],
    )
    crossing = {"highway": "crossing"}
    nodes = _nodes(
        spark,
        [
            (10, crossing),  # road only
            (11, crossing),  # road + footway -> valid, no row
            (12, crossing),  # footway + cycleway -> suppressed (:86-87)
            (13, crossing),  # cycleway only -> person without road BUT cycleway -> no row
            (14, crossing),  # tram only -> road_only (:73-74)
            (16, crossing),  # no ways at all -> stray
            (17, {}),        # not a crossing
        ],
    )
    out = {r.node_id: r.category for r in lone_crossings(ways, nodes).collect()}
    assert out == {10: "road_only", 14: "road_only", 16: "stray"}


def test_lone_crossing_footway_only(spark):
    from osmalyzer_spark.plans.validators import lone_crossings

    ways = _ways(spark, [(1, {"highway": "path"}, [10])])
    nodes = _nodes(spark, [(10, {"highway": "crossing"})])
    out = lone_crossings(ways, nodes).collect()
    assert [(r.node_id, r.category) for r in out] == [(10, "footway_only")]


def test_lone_crossing_pedestrian_counts_both(spark):
    from osmalyzer_spark.plans.validators import lone_crossings

    # pedestrian is in BOTH the road and footway lists -> valid crossing
    ways = _ways(spark, [(1, {"highway": "pedestrian"}, [10])])
    nodes = _nodes(spark, [(10, {"highway": "crossing"})])
    assert lone_crossings(ways, nodes).count() == 0


# --------------------------------------------------------------------- q51


def _elements(spark, rows):
    # rows: (id, type, {tag: value})
    return spark.createDataFrame(
        list(rows), "id long, type string, tags map<string,string>"
    )


def test_non_defining_classification(spark):
    from osmalyzer_spark.plans.validators import non_defining_tagging

    els = _elements(
        spark,
        [
            (1, "node", {"building": "yes", "source": "survey"}),  # good -> skip
            (2, "node", {"source": "survey", "name": "X"}),        # poor wins
            (3, "node", {"name": "X", "note": "y"}),               # unmatched name
            (4, "node", {"note": "y", "addr:street": "A"}),        # all editorial/strippable -> skip
            (5, "node", {}),                                       # no tags -> skip
        ],
    )
    out = {r.elem_id: (r.category, r.detail) for r in non_defining_tagging(els).collect()}
    assert out == {
        2: ("poorly_defining", "source"),
        3: ("non_defining", "name,note"),
    }


def test_non_defining_type_targets_and_prefix(spark):
    from osmalyzer_spark.plans.validators import non_defining_tagging

    els = _elements(
        spark,
        [
            # type= defines only relations (data/feature defining keys.tsv)
            (1, "relation", {"type": "multipolygon"}),
            (2, "node", {"type": "multipolygon"}),
            # lifecycle prefix requires a STRICTLY longer key
            (3, "way", {"disused:shop": "yes"}),
            (4, "way", {"disused:": "yes"}),  # equal length -> no match
            # maxspeed defines nodes but not ways (signs vs roads)
            (5, "node", {"maxspeed": "90"}),
            (6, "way", {"maxspeed": "90"}),
        ],
    )
    out = {r.elem_id: r.category for r in non_defining_tagging(els).collect()}
    assert out == {2: "non_defining", 4: "non_defining", 6: "non_defining"}


def test_non_defining_suffix_method(spark):
    from osmalyzer_spark.plans.validators import non_defining_tagging

    # the table format supports suffix rules even though the current
    # reference table has none — gate the mechanics with a custom row
    tax = [("_custom", "good", "suffix", "nwr")]
    els = _elements(
        spark,
        [
            (1, "node", {"shop_custom": "x"}),
            (2, "node", {"_custom": "x"}),  # equal length -> no match
        ],
    )
    out = {r.elem_id: r.category for r in non_defining_tagging(els, taxonomy=tax).collect()}
    assert out == {2: "non_defining"}


# --------------------------------------------------------------------- q52


def _spelling(spark, rows, dict_words):
    from osmalyzer_spark.plans.validators import spelling_check

    els = _tagged_ways(spark, rows)
    d = spark.createDataFrame([(w,) for w in dict_words], "word string")
    return {
        (r.value, r.part): (r.n_elements, r.words)
        for r in spelling_check(els, d).collect()
    }


def test_spelling_basic_and_grouping(spark):
    out = _spelling(
        spark,
        [
            (1, {"name": "Skolas iela"}),
            (2, {"name": "Skolas ielaa"}),
            (3, {"name": "Skolas ielaa"}),  # same problem, counted together
            (4, {"name": "Bad? word!"}),    # punctuation trimmed before check
        ],
        ["Skolas", "iela", "Bad", "word"],
    )
    assert out == {("Skolas ielaa", "Skolas ielaa"): (2, "ielaa")}


def test_spelling_slash_protection_and_platform(spark):
    out = _spelling(
        spark,
        [
            (1, {"name": "A/S Centrs"}),                    # protected, clean
            (2, {"name": "24/7 veikals"}),                  # digit slash protected
            (3, {"name": "Abc/Def", "public_transport": "platform"}),  # kept whole
            (4, {"name": "Abc/Def"}),                       # split: Def unknown
        ],
        ["A/S", "Centrs", "24/7", "veikals", "Abc"],
    )
    assert out == {
        ("Abc/Def", "Abc/Def"): (1, "Abc/Def"),
        ("Abc/Def", "Def"): (1, "Def"),
    }


def test_spelling_foreign_language_part_skipped(spark):
    out = _spelling(
        spark,
        [
            # name:et matches the second part -> skipped (SpellingAnalyzer.cs:95-125)
            (1, {"name": "Laikupe / Latioja", "name:et": "Latioja"}),
            # name:lv is the checked language and never skips
            (2, {"name": "Laikupe / Wrongg", "name:lv": "Wrongg"}),
            # non-language name: subkeys don't skip either
            (3, {"name": "Laikupe / Wrongg2", "name:etymology": "Wrongg2"}),
        ],
        ["Laikupe"],
    )
    assert out == {
        ("Laikupe / Wrongg", "Wrongg"): (1, "Wrongg"),
        ("Laikupe / Wrongg2", "Wrongg2"): (1, "Wrongg2"),
    }
