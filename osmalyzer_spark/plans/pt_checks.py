"""Public-transport checks beyond the route pipeline (reference's
Public Transport analyzer group): duplicate platform mapping and
route-way access-tag validation.

- duplicate_platforms (DuplicatePlatformsAnalyzer.cs:26-92):
  public_transport=platform NODES with platform WAYS within 20 m of
  them. The reference's Chunker indexes every element at its average
  coord (Core/OsmData.cs:506,530 GetClosestWaysTo -> GetAllClosest on
  AverageCoord), so this is a node-to-way-centroid radius join — the
  cell-ring `radius_join` operator, never all-pairs.
- pt_access_check (PublicTransportAccessAnalyzer.cs:25-311): way
  members (role "") of tram/bus/trolleybus route relations (live or
  disused:route) validated for access/bus/vehicle/psv/oneway tag
  combinations. One way can emit several independent issues; each
  report group is a slot in a per-way issue array assembled with
  native CASE logic, exploded at the end — no UDF, no extra shuffle
  beyond the member-resolution joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmalyzer_spark.functions.tags import get_value

DUPLICATE_PLATFORM_DISTANCE_M = 20.0  # DuplicatePlatformsAnalyzer.cs:39


def duplicate_platforms(
    nodes: DataFrame,
    ways: DataFrame,
    radius_m: float = DUPLICATE_PLATFORM_DISTANCE_M,
) -> DataFrame:
    """Platform nodes with platform way(s) mapped within `radius_m`.

    nodes: (id, tags, lat, lon); ways: (id, tags, lat, lon) where
    lat/lon is the way's average coord (the caller computes centroids,
    matching OsmElement.AverageCoord). Output one row per node:
    (node_id, n_dup_ways, way_ids) with way_ids the numerically-sorted
    comma-joined duplicate way ids.
    """
    from osmalyzer_spark.operators.knn import radius_join

    is_platform = lambda df: get_value("tags", "public_transport") == "platform"  # noqa: E731
    pn = nodes.filter(is_platform(nodes)).select(
        F.col("id").alias("node_id"),
        F.col("lat").alias("node_lat"),
        F.col("lon").alias("node_lon"),
    )
    pw = ways.filter(is_platform(ways)).select(
        F.col("id").alias("way_id"),
        F.col("lat").alias("way_lat"),
        F.col("lon").alias("way_lon"),
    )
    pairs = radius_join(
        pn,
        pw,
        radius_m,
        probe_coords=("node_lat", "node_lon"),
        build_coords=("way_lat", "way_lon"),
    )
    return pairs.groupBy("node_id").agg(
        F.count("way_id").alias("n_dup_ways"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("way_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("way_ids"),
    )


# PublicTransportAccessAnalyzer.cs:27-31 — checked route values.
PT_ROUTE_VALUES = ["tram", "bus", "trolleybus"]


def pt_route_ways(routes: DataFrame, ways: DataFrame) -> DataFrame:
    """Distinct resolved way members with role "" of PT route relations
    (PublicTransportAccessAnalyzer.cs:55-59: GetElementsWithRole<OsmWay>("")
    into a TryAdd dict — each way checked once however many routes carry
    it). routes: (id, tags, members array<struct<type,ref,role>>)."""
    from osmalyzer_spark.operators.osm import resolve_relation_members

    rel = routes.filter(
        (get_value("tags", "type") == "route")
        & (
            get_value("tags", "route").isin(PT_ROUTE_VALUES)
            | get_value("tags", "disused:route").isin(PT_ROUTE_VALUES)
        )
    )
    members = resolve_relation_members(
        rel.select("id", "members"),
        ways.select(F.lit("way").alias("type"), "id"),
    ).filter(
        (F.col("member_type") == "way") & (F.col("role") == "") & F.col("resolved")
    )
    return members.select(F.col("member_ref").alias("way_id")).distinct()


def pt_access_check(routes: DataFrame, ways: DataFrame) -> DataFrame:
    """Access-tag validation over PT route ways
    (PublicTransportAccessAnalyzer.cs:61-311).

    Independent report groups per way — a way can emit several rows:
    - blocking_bus: bus=no (:84).
    - redundant_bus: bus=yes with no access/vehicle, access=yes, or
      vehicle=yes under a non-yes access (:97-133, exclusive chain;
      note disambiguates which branch).
    - bad_bus_on_restricted: access no/private/destination with no bus
      (note=missing_bus) or a bus value that is neither yes nor
      designated (note=unexpected_bus) — both suppressed when psv is
      set, since psv_should_be_bus reports then (:145-180).
    - bus_over_access_bus: access=bus plus any bus value (:181-195).
    - unexpected_access: any other access value (:196-207).
    - oneway_bus_on_non_oneway: oneway=no with oneway:bus set (:214-228).
    - unexpected_oneway: oneway neither yes nor no (:229-241).
    - psv_should_be_bus / oneway_psv_should_be_bus: any psv /
      oneway:psv value; for =no the note records whether the bus twin
      is unset / already_set / bus_differs, otherwise note=unexpected
      (:245-308).

    Output: (way_id, issue, value, note).
    """
    tagged = pt_route_ways(routes, ways).join(
        ways.select(
            F.col("id").alias("way_id"),
            get_value("tags", "access").alias("access"),
            get_value("tags", "vehicle").alias("vehicle"),
            get_value("tags", "psv").alias("psv"),
            get_value("tags", "bus").alias("bus"),
            get_value("tags", "oneway").alias("oneway"),
            get_value("tags", "oneway:psv").alias("oneway_psv"),
            get_value("tags", "oneway:bus").alias("oneway_bus"),
        ),
        "way_id",
    )

    access, vehicle = F.col("access"), F.col("vehicle")
    psv, bus = F.col("psv"), F.col("bus")
    oneway = F.col("oneway")
    oneway_psv, oneway_bus = F.col("oneway_psv"), F.col("oneway_bus")

    def slot(cond, issue, value, note=None):
        return F.when(
            cond,
            F.struct(
                F.lit(issue).alias("issue"),
                value.alias("value"),
                (F.lit(None).cast("string") if note is None else note).alias("note"),
            ),
        )

    restricted = access.isin("no", "private", "destination")
    twin_note = lambda twin: F.when(twin.isNull(), F.lit("unset")).when(  # noqa: E731
        twin == "no", F.lit("already_set")
    ).otherwise(F.lit("bus_differs"))

    issues = F.array(
        # bus chain (:81-133)
        slot(bus == "no", "blocking_bus", bus),
        slot(
            (bus == "yes") & access.isNull() & vehicle.isNull(),
            "redundant_bus", bus, F.lit("no_access"),
        ),
        slot(
            (bus == "yes") & (access == "yes"),
            "redundant_bus", bus, F.lit("access_yes"),
        ),
        slot(
            (bus == "yes") & access.isNotNull() & (access != "yes")
            & (vehicle == "yes"),
            "redundant_bus", bus, F.lit("vehicle_yes"),
        ),
        # access chain (:139-207)
        slot(
            restricted & bus.isNull() & psv.isNull(),
            "bad_bus_on_restricted", access, F.lit("missing_bus"),
        ),
        slot(
            restricted & bus.isNotNull() & ~bus.isin("yes", "designated")
            & psv.isNull(),
            "bad_bus_on_restricted", bus, F.lit("unexpected_bus"),
        ),
        slot((access == "bus") & bus.isNotNull(), "bus_over_access_bus", bus),
        slot(
            access.isNotNull()
            & ~access.isin("yes", "no", "private", "destination", "bus"),
            "unexpected_access", access,
        ),
        # oneway chain (:210-241)
        slot(
            (oneway == "no") & oneway_bus.isNotNull(),
            "oneway_bus_on_non_oneway", oneway_bus,
        ),
        slot(
            oneway.isNotNull() & ~oneway.isin("yes", "no"),
            "unexpected_oneway", oneway,
        ),
        # psv / oneway:psv (:245-308)
        slot(psv == "no", "psv_should_be_bus", psv, twin_note(bus)),
        slot(
            psv.isNotNull() & (psv != "no"),
            "psv_should_be_bus", psv, F.lit("unexpected"),
        ),
        slot(
            oneway_psv == "no",
            "oneway_psv_should_be_bus", oneway_psv, twin_note(oneway_bus),
        ),
        slot(
            oneway_psv.isNotNull() & (oneway_psv != "no"),
            "oneway_psv_should_be_bus", oneway_psv, F.lit("unexpected"),
        ),
    )
    ex = tagged.select(
        "way_id",
        F.explode(F.filter(issues, lambda x: x.isNotNull())).alias("x"),
    )
    return ex.select(
        "way_id",
        F.col("x.issue").alias("issue"),
        F.col("x.value").alias("value"),
        F.col("x.note").alias("note"),
    )
