"""Cell-bucketed distance joins: radius join, k-nearest, top-1 closest.

Distributed replacement for the reference's driver-side grid lookups
(`GetClosestElementsTo` / `GetClosestElementTo`, Core/OsmData.cs:462-532,
Core/Helpers/Chunker/Chunker.cs:66-397). Instead of a lazily-built 50x50
grid probed point-by-point, both sides get a compact-cell index column at a
resolution derived from the radius; the probe side explodes into its 3x3
neighbor ring and an equi-join on cell_id produces the candidate pairs,
which an exact haversine then filters. Catalyst is free to pick broadcast
(small probe side: the usual 10^3-10^4 data items) or sort-merge (both
sides huge) — we hint broadcast when the probe row count is known-small.

Skew: dense cells (the Riga hotspot) are handled by a deterministic
two-phase salted join — a cheap count pass finds hot cells, the build side
salts by pmod(hash(id), k) and the probe side explodes over the salt range
only for those cells. AQE skew-join remains on as a backstop.

Scale notes (100 TB): the candidate-pair stage shuffles only the slim
(id, lat, lon, cell) projection — callers must strip payload columns
(image bytes!) before joining and re-attach by id afterwards; see
Correlator which enforces this.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osmalyzer_spark.geo.cells import (
    cell_deg_for_radius,
    cell_id_expr,
    neighbor_cells_expr,
)
from osmalyzer_spark.geo.distance import haversine_m

DEFAULT_HOT_CELL_THRESHOLD = 100_000


def radius_join(
    probe: DataFrame,
    build: DataFrame,
    radius_m: float,
    *,
    probe_coords: tuple[str, str] = ("lat", "lon"),
    build_coords: tuple[str, str] = ("lat", "lon"),
    dist_col: str = "dist_m",
    max_abs_lat_deg: float = 60.0,
    broadcast_probe: bool = False,
    salt: "SaltSpec | None" = None,
    validate_extent: bool = True,
) -> DataFrame:
    """All (probe, build) pairs within `radius_m` meters.

    Column names of the two inputs must be disjoint (callers prefix, e.g.
    item_* / elem_*). Output = probe columns + build columns + dist_col.

    Points beyond |max_abs_lat_deg| latitude or adjacent to the ±180
    antimeridian are OUTSIDE the cell index's supported extent (ring
    candidates would be silently incomplete there): with validate_extent
    they fail the job explicitly instead.
    """
    plat, plon = probe_coords
    blat, blon = build_coords
    overlap = set(probe.columns) & set(build.columns)
    if overlap:
        raise ValueError(f"probe/build column collision: {sorted(overlap)}")

    cell_deg = cell_deg_for_radius(radius_m, max_abs_lat_deg)
    if validate_extent:
        from osmalyzer_spark.geo.cells import checked_cell_id_expr

        def cid(la, lo):
            return checked_cell_id_expr(la, lo, cell_deg, max_abs_lat_deg)
    else:
        def cid(la, lo):
            return cell_id_expr(la, lo, cell_deg)

    p = probe.withColumn(
        "__cell", F.explode(neighbor_cells_expr(cid(plat, plon)))
    )
    b = build.withColumn("__cell", cid(blat, blon))

    if salt is not None:
        pairs = salt.salted_join(p, b, build_id_hint=build.columns[0])
    else:
        if broadcast_probe:
            pairs = b.join(F.broadcast(p), "__cell")
        else:
            pairs = p.join(b, "__cell")

    # conservative vertical-band prefilter before the trig: on the
    # engine's sphere (R = 6 376 500, the reference's constant) the
    # central angle between two points satisfies cos θ = sinφ₁sinφ₂ +
    # cosφ₁cosφ₂cosΔλ ≤ cos(Δφ), so distance ≥ |Δlat| · πR/180 =
    # 111 297 m/deg. Rejecting |Δlat| · 111 000 > radius therefore NEVER
    # drops a true pair (0.27% safety margin ≫ fp error), and skips the
    # haversine for the ~⅔ of ring candidates that fail vertically —
    # measured 2.04× on the 1M-row join (BENCH.md), byte-identical pairs.
    pairs = pairs.filter(
        F.abs(F.col(plat) - F.col(blat)) * F.lit(111000.0)
        <= F.lit(float(radius_m))
    )
    dist = haversine_m(F.col(plat), F.col(plon), F.col(blat), F.col(blon))
    return (
        pairs.withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= F.lit(float(radius_m)))
        .drop("__cell", "__salt")
    )


def closest_join(
    probe: DataFrame,
    build: DataFrame,
    radius_m: float,
    probe_id: str,
    build_id: str,
    k: int = 1,
    **kwargs,
) -> DataFrame:
    """k nearest build rows within radius for each probe row (k=1 = the
    reference's GetClosestElementTo). Deterministic tie-break on build id.

    Adds `knn_rank` (1..k). Probe rows with no neighbor in range are
    absent (join semantics; left-join back for unmatched reporting).
    """
    dist_col = kwargs.get("dist_col", "dist_m")
    pairs = radius_join(probe, build, radius_m, **kwargs)
    w = Window.partitionBy(probe_id).orderBy(F.col(dist_col).asc(), F.col(build_id).asc())
    ranked = pairs.withColumn("knn_rank", F.row_number().over(w))
    return ranked.filter(F.col("knn_rank") <= k)


class SaltSpec:
    """Deterministic two-phase salting for skewed cell joins.

    Phase 1 (cheap): count build rows per cell; cells above `threshold`
    get salt factor k = ceil(count / threshold) (capped). The resulting
    hot-cell map is tiny and broadcast.
    Phase 2: build rows in hot cells scatter to (cell, salt) by
    pmod(hash(id), k); probe rows explode over all k salts of a hot cell
    (cold cells use salt 0 on both sides). The join key becomes
    (cell, salt), splitting the hot cell's work across k tasks.
    """

    def __init__(self, threshold: int = DEFAULT_HOT_CELL_THRESHOLD, max_factor: int = 64):
        self.threshold = threshold
        self.max_factor = max_factor

    def salted_join(self, p: DataFrame, b: DataFrame, build_id_hint: str) -> DataFrame:
        hot = (
            b.groupBy("__cell")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > self.threshold)
            .select(
                "__cell",
                F.least(
                    F.ceil(F.col("__n") / self.threshold), F.lit(self.max_factor)
                ).cast("int").alias("__k"),
            )
        )
        b2 = (
            b.join(F.broadcast(hot), "__cell", "left")
            .withColumn(
                "__salt",
                F.when(
                    F.col("__k").isNotNull(),
                    F.pmod(F.xxhash64(F.col(build_id_hint)), F.col("__k")).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .drop("__k")
        )
        p2 = (
            p.join(F.broadcast(hot), "__cell", "left")
            .withColumn(
                "__salt",
                F.explode(
                    F.sequence(F.lit(0), F.coalesce(F.col("__k"), F.lit(1)) - 1)
                ),
            )
            .drop("__k")
        )
        return p2.join(b2, ["__cell", "__salt"])


def distance_expr(plat, plon, blat, blon) -> Column:
    """Exposed for callers composing their own pair filters."""
    return haversine_m(plat, plon, blat, blon)
