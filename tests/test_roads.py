"""Roads-group validator semantics (reference Analyzers/Roads/) over
hand-built element micro-fixtures: LivingZoneSpeedAnalyzer,
HighwaySeasonalSpeedsAnalyzer, MaxspeedTypeAnalyzer, BarrierAnalyzer."""

from osmalyzer_spark.plans.roads import (
    barriers_not_on_ways,
    living_zone_speeds,
    maxspeed_type_check,
    seasonal_speeds,
)


def _ways(spark, rows):
    # rows: (id, {tag: value})
    return spark.createDataFrame(list(rows), "id long, tags map<string,string>")


def _mem_ways(spark, rows):
    # rows: (id, {tag: value}, [node ids])
    return spark.createDataFrame(
        list(rows), "id long, tags map<string,string>, node_ids array<long>"
    )


def _elements(spark, rows):
    # rows: (id, elem_type, {tag: value})
    return spark.createDataFrame(
        list(rows), "id long, elem_type string, tags map<string,string>"
    )


# ------------------------------------------------------------- living zone


def test_living_zone_value_and_format(spark):
    ways = _ways(
        spark,
        [
            (1, {"highway": "living_street", "maxspeed": "20"}),          # ok
            (2, {"highway": "living_street", "maxspeed": "30", "name": "A"}),
            (3, {"highway": "living_street", "maxspeed": "walk"}),
            (4, {"highway": "living_street"}),                            # no maxspeed
            (5, {"highway": "residential", "maxspeed": "30"}),            # not living
            # int.TryParse default style: surrounding whitespace + sign ok
            (6, {"highway": "living_street", "maxspeed": " +20 "}),
        ],
    )
    out = {r.way_id: r for r in living_zone_speeds(ways).collect()}
    assert set(out) == {2, 3}
    assert out[2].kind == "invalid_value" and out[2].name == "A"
    assert out[3].kind == "invalid_format" and out[3].maxspeed == "walk"


# ---------------------------------------------------------------- seasonal


def test_seasonal_kinds_and_combos(spark):
    sea = "90 @ (May 1 - Oct 1)"
    ways = _ways(
        spark,
        [
            (1, {"highway": "trunk", "maxspeed": "90", "maxspeed:conditional": sea}),
            (2, {"highway": "primary", "maxspeed": "70",
                 "maxspeed:conditional": sea}),                 # differs: no issue
            (3, {"highway": "service", "maxspeed": "90 km/h",
                 "maxspeed:conditional": sea}),                 # unrecognized
            (4, {"highway": "residential", "maxspeed": "50",
                 "maxspeed:conditional": "30 @ (Mo-Fr 07:00-19:00)"}),  # timed: ok
            (5, {"highway": "residential", "maxspeed": "50",
                 "maxspeed:conditional": "90 @ (22:00-07:00)"}),        # timed: ok
            (6, {"highway": "tertiary", "maxspeed": "50",
                 "maxspeed:conditional": "30 @ wet"}),          # not_seasonal
            (7, {"highway": "footway", "maxspeed": "90",
                 "maxspeed:conditional": sea}),                 # class filtered
            (8, {"highway": "trunk", "maxspeed": "90"}),        # no conditional
        ],
    )
    rows = seasonal_speeds(ways).collect()
    issues = {r.way_id: r for r in rows if r.kind != "combo"}
    assert set(issues) == {1, 3, 6}
    assert issues[1].kind == "same_limits"
    assert issues[1].regular == 90 and issues[1].conditional == 90
    assert issues[3].kind == "unrecognized" and issues[3].value == "90 km/h"
    assert issues[3].regular is None
    assert issues[6].kind == "not_seasonal" and issues[6].value == "30 @ wet"
    # combos: every regex-matched (regular, seasonal) pair, equal or not
    combos = {(r.regular, r.conditional) for r in rows if r.kind == "combo"}
    assert combos == {(90, 90), (70, 90)}


# ------------------------------------------------------------ maxspeed:type


def test_maxspeed_type_layouts_and_values(spark):
    els = _elements(
        spark,
        [
            (1, "way", {"maxspeed:type": "sign", "maxspeed": "90",
                        "highway": "residential"}),
            (2, "way", {"maxspeed:type": "LV:urban", "maxspeed": "60",
                        "highway": "residential"}),
            (3, "way", {"maxspeed:type": "LV:zone30", "maxspeed": "30",
                        "highway": "residential"}),
            (4, "way", {"maxspeed:type": "LV:zone30", "maxspeed": "50",
                        "highway": "residential"}),
            (5, "way", {"maxspeed:type:wtf": "LV:urban", "highway": "x"}),
            (6, "node", {"maxspeed:type": "LV:urban", "maxspeed": "50"}),
            (7, "way", {"maxspeed:type": "LV:urban", "maxspeed": "50"}),  # no highway
            (8, "way", {"maxspeed:hgv:type": "LV:rural", "maxspeed:hgv": "90",
                        "highway": "trunk"}),
            (9, "way", {"maxspeed:type:forward": "LV:urban",
                        "highway": "residential"}),             # missing maxspeed
            (10, "way", {"maxspeed:type": "LV:urban", "maxspeed": "fifty",
                         "highway": "residential"}),
            (11, "way", {"maxspeed:type": "nonsense", "maxspeed": "50",
                         "highway": "residential"}),
            (12, "way", {"maxspeed:type:advisory": "LV:urban", "maxspeed": "50",
                         "highway": "residential"}),            # advisory: sign only
            (13, "way", {"maxspeed:type": "LV:rural",
                         "maxspeed": "80 @ (Mo-Fr 06:00-20:00)",
                         "highway": "trunk"}),                  # @-prefix extract
            (14, "way", {"maxspeed": "50", "highway": "residential"}),  # no type key
        ],
    )
    out = {r.elem_id: r for r in maxspeed_type_check(els).collect()}
    assert set(out) == set(range(1, 14))
    kinds = {i: out[i].kind for i in out}
    assert kinds == {
        1: "ok", 2: "mismatched", 3: "ok", 4: "mismatched",
        5: "unrecognized_layout", 6: "unexpected_element", 7: "non_highway",
        8: "ok", 9: "missing_maxspeed", 10: "invalid_maxspeed",
        11: "invalid_value", 12: "invalid_value", 13: "ok",
    }
    assert out[2].expected == 50 and out[4].expected == 30
    assert out[1].expected is None and out[5].expected is None


# ----------------------------------------------------------------- barriers


def test_barriers_not_on_ways(spark):
    nodes = _ways(
        spark,
        [
            (10, {"barrier": "gate"}),       # on highway way: not reported
            (11, {"barrier": "gate"}),       # on nothing qualifying: bad
            (12, {"barrier": "bollard"}),    # standalone ok value: reported, not bad
            (13, {"barrier": "gate"}),       # on tram rail: not reported
            (14, {"barrier": "gate"}),       # on pier: not reported
            (15, {"barrier": "hedgerow"}),   # not a checked value
            (16, {"barrier": "chain"}),      # only parent is a building: bad
        ],
    )
    ways = _mem_ways(
        spark,
        [
            (1, {"highway": "residential"}, [10, 99]),
            (2, {"railway": "tram"}, [13, 98]),
            (3, {"man_made": "pier"}, [14, 97]),
            (4, {"building": "yes"}, [11, 16]),
            (5, {"highway": "construction"}, [16]),  # not a qualifying value
        ],
    )
    out = {r.node_id: r for r in barriers_not_on_ways(nodes, ways).collect()}
    assert set(out) == {11, 12, 16}
    assert out[11].bad is True
    assert out[12].bad is False
    assert out[16].bad is True
