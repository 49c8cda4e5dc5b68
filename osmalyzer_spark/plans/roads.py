"""Roads-group tag validators (the reference's Roads analyzer group,
beyond the speed/crossing checks already in plans/validators.py).

All are narrow projections + native CASE logic over the element tag
map — no shuffle at all except where a parent-way membership join is
inherent (barriers_not_on_ways), which shuffles only (node_id, three
boolean flags) after tag filters cut the way side.

- living_zone_speeds (LivingZoneSpeedAnalyzer.cs:26-88): living
  streets whose `maxspeed` is present but is not the integer 20 —
  non-integer values are their own issue class.
- seasonal_speeds (HighwaySeasonalSpeedsAnalyzer.cs:25-107): ways with
  both `maxspeed` and `maxspeed:conditional`; the seasonal
  "NN @ (May 1 - Oct 1)" pattern must differ from the regular limit,
  non-seasonal conditionals are flagged unless they are the known
  time-window form, non-integer regular limits are flagged, and the
  distinct (regular, conditional) combos are enumerated.
- maxspeed_type_check (MaxspeedTypeAnalyzer.cs:16-316): every
  `maxspeed:*:type*` tag classified by the nine recognized key
  layouts, then by the eight valid value variants, then checked
  against the corresponding `maxspeed` value (urban=50, rural=90/80,
  living_street/parking/fuel_station=20, zone##=##).
- barriers_not_on_ways (BarrierAnalyzer.cs:21-137): barrier nodes from
  the 32-value list that sit on no routable highway/railway/pier
  parent way; severity comes from the per-value must-be-on-way flag.

Inputs are the same (id, tags[, node_ids][, lat, lon]) element shapes
as plans/validators.py; int parsing mirrors C# int.TryParse
(NumberStyles.Integer: optional surrounding whitespace + sign).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmalyzer_spark.functions.tags import get_value

# C# int.TryParse default NumberStyles.Integer: leading/trailing
# whitespace and a leading sign around plain digits.
_INT_RE = "^[+-]?[0-9]+$"


def _int_ok(col: F.Column) -> F.Column:
    return F.trim(col).rlike(_INT_RE)


def _as_int(col: F.Column) -> F.Column:
    return F.when(_int_ok(col), F.trim(col).cast("long"))


def living_zone_speeds(ways: DataFrame) -> DataFrame:
    """Living streets with a bad `maxspeed` value
    (LivingZoneSpeedAnalyzer.cs:26-88).

    highway=living_street ways carrying a maxspeed tag: an integer
    value != 20 is `invalid_value`; a non-integer value (the reference's
    failed int.TryParse branch, :71) is `invalid_format`. Ways without
    maxspeed are only counted by the stats section and emit no issue.

    Output: (way_id, name, maxspeed, kind).
    """
    ms = get_value("tags", "maxspeed")
    flt = ways.filter(
        (get_value("tags", "highway") == "living_street") & ms.isNotNull()
    )
    kind = F.when(~_int_ok(ms), F.lit("invalid_format")).when(
        _as_int(ms) != 20, F.lit("invalid_value")
    )
    return (
        flt.select(
            F.col("id").alias("way_id"),
            get_value("tags", "name").alias("name"),
            ms.alias("maxspeed"),
            kind.alias("kind"),
        )
        .filter(F.col("kind").isNotNull())
    )


# HighwaySeasonalSpeedsAnalyzer.cs:27 — the highway classes checked.
SEASONAL_HIGHWAY_VALUES = [
    "trunk", "primary", "secondary", "tertiary",
    "unclassified", "residential", "service",
]
# :49 — the seasonal conditional value; group 1 is the summer limit.
_SEASONAL_RE = r"([0-9]+)\s*@\s*\(May 1\s*-\s*Oct 1\)"
# :73 — known time-window conditionals ("30 @ (Mo-Fr 07:00-19:00)").
_TIMED_RE = r"[0-9]+ @ \(([A-Za-z0-9_][A-Za-z0-9_]-[A-Za-z0-9_][A-Za-z0-9_] )?[0-9][0-9]:[0-9][0-9]-[0-9][0-9]:[0-9][0-9]\)"


def seasonal_speeds(ways: DataFrame) -> DataFrame:
    """Seasonal maxspeed:conditional checks
    (HighwaySeasonalSpeedsAnalyzer.cs:25-107).

    Over ways with the checked highway classes and BOTH maxspeed and
    maxspeed:conditional: a non-integer maxspeed is `unrecognized`;
    a seasonal conditional equal to the regular limit is `same_limits`;
    a conditional that matches neither the seasonal nor the known
    time-window pattern is `not_seasonal`. Additionally one `combo`
    row per distinct (regular, seasonal-conditional) pair (way_id
    NULL), the reference's Combos report group (:104-107, regex-matched
    pairs are collected whether or not they are equal).

    Output: (way_id, kind, regular, conditional, value).
    """
    ms = get_value("tags", "maxspeed")
    cond = get_value("tags", "maxspeed:conditional")
    flt = ways.filter(
        get_value("tags", "highway").isin(SEASONAL_HIGHWAY_VALUES)
        & ms.isNotNull()
        & cond.isNotNull()
    ).select(
        F.col("id").alias("way_id"),
        ms.alias("ms"),
        cond.alias("cond"),
        F.regexp_extract(cond, _SEASONAL_RE, 1).alias("seasonal"),
    )
    reg = _as_int(F.col("ms"))
    seasonal = F.when(F.col("seasonal") != "", F.col("seasonal").cast("long"))
    kind = (
        F.when(~_int_ok(F.col("ms")), F.lit("unrecognized"))
        .when(seasonal.isNotNull(), F.when(reg == seasonal, F.lit("same_limits")))
        .when(~F.col("cond").rlike(_TIMED_RE), F.lit("not_seasonal"))
    )
    issues = (
        flt.select(
            "way_id",
            kind.alias("kind"),
            F.when(kind != "unrecognized", reg).alias("regular"),
            F.when(kind != "unrecognized", seasonal).alias("conditional"),
            F.when(kind == "unrecognized", F.col("ms"))
            .otherwise(F.col("cond"))
            .alias("value"),
        )
        .filter(F.col("kind").isNotNull())
    )
    combos = (
        flt.filter(_int_ok(F.col("ms")) & (F.col("seasonal") != ""))
        .select(reg.alias("regular"), seasonal.alias("conditional"))
        .distinct()
        .select(
            F.lit(None).cast("long").alias("way_id"),
            F.lit("combo").alias("kind"),
            "regular",
            "conditional",
            F.lit(None).cast("string").alias("value"),
        )
    )
    return issues.unionByName(combos)


# BarrierAnalyzer.cs:21-55 — (value, must_be_on_way) in declaration order.
BARRIER_VALUES: list[tuple[str, bool]] = [
    ("block", False),
    ("bollard", False),
    ("bump_gate", True),
    ("cattle_grid", True),
    ("coupure", True),
    ("cycle_barrier", True),
    ("debris", True),
    ("full-height_turnstile", True),
    ("gate", True),
    ("hampshire_gate", True),
    ("height_restrictor", True),
    ("horse_stile", True),
    ("kissing_gate", True),
    ("lift_gate", True),
    ("motorcycle_barrier", True),
    ("planter", False),
    ("sliding_beam", True),
    ("sliding_gate", True),
    ("spikes", True),
    ("stile", True),
    ("sump_buster", True),
    ("swing_gate", True),
    ("turnstile", True),
    ("wedge", True),
    ("wicket_gate", True),
    ("chain", True),
    ("jersey_barrier", False),
    ("kerb", True),
    ("log", True),
    ("rope", True),
    ("tank_trap", False),
    ("tyres", False),
]

# BarrierAnalyzer.cs:95-121 — parent-way values that count as "on a way".
BARRIER_WAY_HIGHWAY_VALUES = [
    "motorway", "trunk", "primary", "secondary", "tertiary",
    "unclassified", "residential",
    "motorway_link", "trunk_link", "primary_link", "secondary_link",
    "tertiary_link",
    "living_street", "pedestrian", "service", "track",
    "footway", "path", "cycleway",
    "platform",
]
BARRIER_WAY_RAILWAY_VALUES = [
    "rail", "tram", "disused", "abandoned", "razed", "platform",
]


def barriers_not_on_ways(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """Barrier nodes that sit on no expected way
    (BarrierAnalyzer.cs:60-137).

    Barrier nodes (the 32-value list) OR-fold their parent ways'
    highway / railway / man_made=pier membership in the expected-value
    lists (:95-121); nodes with no qualifying parent are reported,
    `bad` = the barrier value's must-be-on-way flag (blocks, bollards,
    planters etc. legitimately stand alone).

    Output: (node_id, barrier, bad).
    """
    bval = get_value("tags", "barrier")
    bn = nodes.filter(bval.isin([v for v, _ in BARRIER_VALUES])).select(
        F.col("id").alias("node_id"), bval.alias("barrier")
    )
    hv = get_value("tags", "highway")
    rv = get_value("tags", "railway")
    on_way = (
        hv.isin(BARRIER_WAY_HIGHWAY_VALUES)
        | rv.isin(BARRIER_WAY_RAILWAY_VALUES)
        | (get_value("tags", "man_made") == "pier")
    )
    wn = (
        ways.filter(on_way)
        .select(F.explode(F.array_distinct("node_ids")).alias("node_id"))
        .distinct()
    )
    must = F.create_map(
        *[x for v, m in BARRIER_VALUES for x in (F.lit(v), F.lit(m))]
    )
    return (
        bn.join(wn, "node_id", "left_anti")
        .select("node_id", "barrier", must[F.col("barrier")].alias("bad"))
    )


# MaxspeedTypeAnalyzer.cs:31-43 — recognized key layouts, first match
# wins. Mode alternation :30.
_MS_MODES = "hgv|motorcar|motorcycle|bus|bicycle"
MAXSPEED_TYPE_LAYOUTS: list[tuple[str, str]] = [
    ("maxspeed:type", "^maxspeed:type$"),
    ("maxspeed:type:conditional", "^maxspeed:type:conditional$"),
    ("maxspeed:type:_direction_", "^maxspeed:type:(forward|backward)$"),
    (
        "maxspeed:type:_direction_:conditional",
        "^maxspeed:type:(forward|backward):conditional$",
    ),
    ("maxspeed:_mode_:type", f"^maxspeed:({_MS_MODES}):type$"),
    ("maxspeed:_mode_:type:conditional", f"^maxspeed:({_MS_MODES}):type:conditional$"),
    (
        "maxspeed:_mode_:type:_direction_",
        f"^maxspeed:({_MS_MODES}):type:(forward|backward)$",
    ),
    (
        "maxspeed:_mode_:type:_direction_:conditional",
        f"^maxspeed:({_MS_MODES}):type:(forward|backward):conditional$",
    ),
    ("maxspeed:type:advisory", "^maxspeed:type:advisory$"),
]

# MaxspeedTypeAnalyzer.cs:100-109 — valid value variants; zone carries
# its own expected limit in group 1.
MAXSPEED_TYPE_VARIANTS: list[tuple[str, str]] = [
    ("sign", "^sign$"),
    ("urban", "^LV:urban$"),
    ("rural", "^LV:rural$"),
    ("living_street", "^LV:living_street$"),
    ("zone", "^LV:zone([0-9]{1,3})$"),
    ("construction", "^construction$"),
    ("parking", "^LV:parking$"),
    ("fuel_station", "^LV:fuel_station$"),
]


def maxspeed_type_check(elements: DataFrame) -> DataFrame:
    """`maxspeed:*type*` tag validation (MaxspeedTypeAnalyzer.cs:16-316).

    Explode each element's tags and keep keys that start with
    "maxspeed:" and contain ":type" (:341-346). Unmatched key layouts
    are `unrecognized_layout`; recognized ones on non-way elements are
    `unexpected_element`, on non-highway ways `non_highway`. On
    highways the value must match a variant (`invalid_value`
    otherwise; advisory only accepts "sign", :391-393), then the
    corresponding maxspeed key (":type" stripped, :336) is checked:
    missing -> `missing_maxspeed`; non-integer and not "NN @ ..."
    conditional -> `invalid_maxspeed`; a variant-specific expected
    limit mismatch -> `mismatched` (urban 50, rural 90/80,
    living_street/parking/fuel_station 20, zone## its own number;
    sign/construction accept anything). Valid rows emit `ok` so the
    stats section (:457-472) can count recognized keys.

    Input needs (id, elem_type, tags). Output: (elem_id, elem_type,
    key, value, kind, expected).
    """
    ex = elements.select(
        F.col("id").alias("elem_id"),
        "elem_type",
        "tags",
        F.explode("tags").alias("key", "value"),
    ).filter(
        F.col("key").startswith("maxspeed:") & F.col("key").contains(":type")
    )
    layout_ok = F.lit(False)
    for _, pat in MAXSPEED_TYPE_LAYOUTS:
        layout_ok = layout_ok | F.col("key").rlike(pat)
    # first matching variant (file order); zone's group-1 limit
    variant = F.lit(None).cast("string")
    for name, pat in reversed(MAXSPEED_TYPE_VARIANTS):
        variant = F.when(F.col("value").rlike(pat), F.lit(name)).otherwise(variant)
    variant = F.when(
        (F.col("key") == "maxspeed:type:advisory") & (F.col("value") != "sign"),
        F.lit(None).cast("string"),
    ).otherwise(variant)
    zone_limit = F.when(
        variant == "zone",
        F.regexp_extract(F.col("value"), "^LV:zone([0-9]{1,3})$", 1).cast("long"),
    )
    ms_key = F.replace(F.col("key"), F.lit(":type"), F.lit(""))
    ms_val = F.col("tags")[ms_key]
    # ExtractMaxspeedValue (:318-339): plain int or "NN @ (...)" prefix
    ms_num = F.coalesce(
        _as_int(ms_val),
        F.when(
            F.regexp_extract(ms_val, "^([0-9]{1,3})\\s*@", 1) != "",
            F.regexp_extract(ms_val, "^([0-9]{1,3})\\s*@", 1).cast("long"),
        ),
    )
    expected = (
        F.when(variant == "urban", F.lit(50).cast("long"))
        .when(variant == "living_street", F.lit(20).cast("long"))
        .when(variant == "parking", F.lit(20).cast("long"))
        .when(variant == "fuel_station", F.lit(20).cast("long"))
        .when(variant == "zone", zone_limit)
    )
    mismatched = (
        F.when(variant.isin("sign", "construction"), F.lit(False))
        .when(variant == "rural", ~ms_num.isin(90, 80))
        .otherwise(ms_num != expected)
    )
    kind = (
        F.when(~layout_ok, F.lit("unrecognized_layout"))
        .when(F.col("elem_type") != "way", F.lit("unexpected_element"))
        .when(F.col("tags")["highway"].isNull(), F.lit("non_highway"))
        .when(variant.isNull(), F.lit("invalid_value"))
        .when(ms_val.isNull(), F.lit("missing_maxspeed"))
        .when(ms_num.isNull(), F.lit("invalid_maxspeed"))
        .when(mismatched, F.lit("mismatched"))
        .otherwise(F.lit("ok"))
    )
    return ex.select(
        "elem_id",
        "elem_type",
        "key",
        "value",
        kind.alias("kind"),
        F.when(kind == "mismatched", expected).alias("expected"),
    )
