"""The Correlator — item<->OSM-element mutual-best matching, distributed.

Reproduces the semantics of the reference's flagship operator
(Osmalyzer/Correlator/Correlator.cs:30-301):

- candidate generation within `seek_distance` = max over strengths of
  unmatch_distance + per-strength extra (Correlator.cs:69-71);
- per-pair match strength (Unmatched=0 / Regular=1 / Good=2 / Strong=3)
  from a caller-supplied column expression (the reference's
  MatchCallbackParameter, vectorized here);
- per-strength allowed distance (Correlator.cs:151-163);
- iterative mutual-best assignment: an item scans its candidates in
  ascending distance and claims the first claimable element; an element is
  stolen only by a strictly stronger match, or an equal-strength strictly
  closer one (Correlator.cs:190-217); displaced items requeue until fixed
  point (Correlator.cs:114-228);
- `far` flag when the matched distance exceeds match_distance
  (Correlator.cs:192);
- reverse pass: unmatched elements become `lone_osm` if the lone-allowance
  predicate holds, with an optional strong-match upgrade against
  still-unmatched items (Correlator.cs:236-301), else `unmatched_osm`;
- polygon prefilter of items (Correlator.cs:82-87).

Why this terminates with the same answer as the sequential loop: an
element's held match only ever improves (strict preference), so an item
rejected by an element can never claim it later — the process is
deferred-acceptance (Gale-Shapley) with item preference = (distance asc)
and element preference = (strength desc, distance asc). With strict
preferences (deterministic id tie-breaks) the proposer-optimal stable
matching is unique and independent of processing order, so a synchronous
distributed round schedule produces the reference's fixed point. (The
reference breaks exact ties by encounter order; we break by id — parity
tests construct tie-free fixtures, mirroring SURVEY.md §7.3.)

Scale discipline: the assignment loop shuffles only the slim candidate
table (item_id, elem_id, strength, dist). Payload columns — in particular
image `bytes` — are rejected at the door; re-join them by id afterwards.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmalyzer_spark.geo.polygon import Polygon, contains_expr
from osmalyzer_spark.operators.knn import SaltSpec, radius_join

# MatchStrength (reference: Osmalyzer/Correlator/MatchStrength.cs)
UNMATCHED = 0
REGULAR = 1
GOOD = 2
STRONG = 3

KIND_MATCHED = "matched"
KIND_MATCHED_FAR = "matched_far"
KIND_UNMATCHED_ITEM = "unmatched_item"
KIND_UNMATCHED_OSM = "unmatched_osm"
KIND_LONE_OSM = "lone_osm"
KIND_OUTSIDE_BOUNDS = "outside_bounds"


@dataclass
class CorrelatorParams:
    """Mirrors Osmalyzer/Correlator/Parameters/* defaults."""

    match_distance: float = 15.0  # MatchDistanceParamater default
    unmatch_distance: float = 75.0  # MatchFarDistanceParamater default
    good_extra_distance: float = 0.0  # MatchExtraDistanceParamater(Good)
    strong_extra_distance: float = 0.0  # MatchExtraDistanceParamater(Strong)
    match_anywhere: bool = False  # MatchAnywhereParamater
    # pair DataFrame -> int strength column (MatchCallbackParameter);
    # None => every in-range pair is Regular (Correlator.cs:138-140)
    strength_expr: Callable[[DataFrame], Column] | None = None
    # element DataFrame -> bool column (LoneElementAllowanceParameter)
    lone_allowance_expr: Callable[[DataFrame], Column] | None = None
    # MatchLoneElementsOnStrongMatchParamater: minimum strength to upgrade
    lone_strong_match_strength: int | None = None
    # distance cap for the upgrade pass. None (default) = seek_distance,
    # so the residual join is always a bounded radius_join. The
    # reference's unbounded semantics (a lone element may upgrade against
    # an arbitrarily distant item) is an explicit opt-in because it is a
    # crossJoin — quadratic in the residual sizes at scale.
    lone_upgrade_radius_m: float | None = None
    lone_upgrade_unbounded: bool = False
    polygon: Polygon | None = None  # FilterItemsToPolygonParamater
    report_outside_polygon: bool = True
    salt: SaltSpec | None = None
    broadcast_items: bool = False
    max_rounds: int = 64

    @property
    def seek_distance(self) -> float:
        return max(
            self.unmatch_distance,
            self.unmatch_distance + self.good_extra_distance,
            self.unmatch_distance + self.strong_extra_distance,
        )


@dataclass
class CorrelationResult:
    matched: DataFrame  # item_id, elem_id, strength, dist_m, far
    unmatched_items: DataFrame  # item_id
    unmatched_elements: DataFrame  # elem_id
    lone_elements: DataFrame  # elem_id
    outside_items: DataFrame | None = None  # item_id
    rounds: int = 0

    @property
    def correlations(self) -> DataFrame:
        """Unified six-kind correlation DataFrame
        (reference: Correlator.cs:558-576 Correlation list)."""
        m = self.matched.select(
            F.when(F.col("far"), F.lit(KIND_MATCHED_FAR))
            .otherwise(F.lit(KIND_MATCHED))
            .alias("kind"),
            F.col("elem_id").alias("osm_id"),
            "item_id",
            F.col("dist_m").alias("distance"),
            "strength",
            "far",
        )

        def _only(df: DataFrame, kind: str, id_col: str, as_osm: bool) -> DataFrame:
            return df.select(
                F.lit(kind).alias("kind"),
                (F.col(id_col) if as_osm else F.lit(None).cast("long")).alias("osm_id"),
                (F.lit(None).cast("string") if as_osm else F.col(id_col)).alias(
                    "item_id"
                ),
                F.lit(None).cast("double").alias("distance"),
                F.lit(None).cast("int").alias("strength"),
                F.lit(None).cast("boolean").alias("far"),
            )

        out = m
        out = out.unionByName(_only(self.unmatched_items, KIND_UNMATCHED_ITEM, "item_id", False))
        out = out.unionByName(_only(self.unmatched_elements, KIND_UNMATCHED_OSM, "elem_id", True))
        out = out.unionByName(_only(self.lone_elements, KIND_LONE_OSM, "elem_id", True))
        if self.outside_items is not None:
            out = out.unionByName(
                _only(self.outside_items, KIND_OUTSIDE_BOUNDS, "item_id", False)
            )
        return out

    @property
    def summary(self) -> DataFrame:
        """Per-kind tallies (reference report summary, Correlator.cs:315+)."""
        return self.correlations.groupBy("kind").agg(F.count(F.lit(1)).alias("n"))


def _no_binary(df: DataFrame, side: str) -> None:
    for f in df.schema.fields:
        if isinstance(f.dataType, T.BinaryType):
            raise ValueError(
                f"{side} carries binary column {f.name!r}: strip payload before "
                "correlating and re-join by id afterwards (shuffle discipline)"
            )


def deferred_acceptance(
    spark: SparkSession,
    cand: DataFrame,
    proposer: str,
    acceptor: str,
    proposer_order: list[Column],
    acceptor_order: list[Column],
    max_rounds: int = 64,
    checkpoint_every: int = 8,
) -> tuple[DataFrame, int]:
    """Distributed Gale-Shapley over a candidate-pair DataFrame.

    Returns (holds, rounds): holds has one row per matched acceptor, the
    proposer-optimal stable matching.

    `proposer_order` / `acceptor_order` are lists of ASCENDING key
    component columns (negate a numeric column for descending) — they
    form lexicographic key structs. NO global sort or rank is ever
    computed: each round's proposals are a hash-aggregated
    `min(key, row)` struct aggregate per proposer (map-side partial combine — the
    shuffle carries at most one row per proposer per map task, not the
    candidate table), and acceptors choose with the same aggregate. The
    old implementation ranked the full candidate table with a window —
    an O(pairs log pairs) sort and a full-table shuffle that dominated
    correlate() wall time (BENCH.md).

    Per-round cost is O(contested), not O(holds): after round 1 only the
    acceptors that actually receive a new proposal are re-chosen — held
    pairs whose acceptor is uncontested pass through untouched.
    Rejections are one per-proposer ORDER-KEY WATERMARK (the max lost
    key): a proposer's proposals move strictly up its key order (a lost
    acceptor is lost forever — its hold only improves), so the next
    proposal is min_by over candidates with key > watermark. The small
    watermark table replaces both a rejected-pair blacklist and a
    displaced-holder set.

    Lineage: each round's proposal slice and winners are checkpointed
    once; the full holds union re-checkpoints every `checkpoint_every`
    rounds, bounding plan depth and per-round materialization.
    """
    # keys are computed ON THE FLY (cheap expressions) — materializing
    # them into the checkpointed candidate table costs real bytes at 10^8
    # rows; consistent field aliases keep the watermark struct comparison
    # well-typed across rounds
    pkey = F.struct(*[c.alias(f"__k{i}") for i, c in enumerate(proposer_order)])
    akey = F.struct(*[c.alias(f"__k{i}") for i, c in enumerate(acceptor_order)])
    cand = cand.localCheckpoint(eager=True)
    data_cols = list(cand.columns)

    def best_by(df: DataFrame, group: str, key: Column) -> DataFrame:
        # min over struct(key, payload) == min_by(payload, key), but the
        # plain declarative min aggregate measured ~2x faster; keys are
        # unique (id tie-breakers), so payload fields never decide
        cols = [c for c in data_cols if c != group]
        packed = F.struct(key.alias("__key"), F.struct(*cols).alias("__p"))
        return (
            df.groupBy(group)
            .agg(F.min(packed).alias("__b"))
            .select(group, "__b.__p.*")
        )

    holds = spark.createDataFrame([], cand.schema)
    # the big candidate table is immutable after round 0; per-round state
    # is only the SMALL unassigned-proposer watermark table, so later
    # rounds (displacement-chain tails) stay cheap no matter how large the
    # candidate set is
    unassigned = None  # round 1: every proposer proposes — no join needed
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        if unassigned is None:
            sl = cand
        else:
            # the unassigned set is small: broadcast it and walk each
            # proposer strictly past its watermark
            sl = (
                cand.join(F.broadcast(unassigned), proposer)
                .filter(pkey > F.col("__wm"))
                .drop("__wm")
            )
        # ONE scan of the candidate table per round, materialized small:
        # everything downstream reads the checkpointed proposal slice
        props = best_by(sl, proposer, pkey).localCheckpoint(eager=True)
        if unassigned is None:
            # holds is empty: everything is contested, nothing untouched
            untouched = holds
            contenders = props
        else:
            # only acceptors receiving a new proposal can change hands;
            # the rest of holds passes through this round untouched
            contested = props.select(acceptor).distinct()
            touched = holds.join(F.broadcast(contested), acceptor, "left_semi")
            untouched = holds.join(F.broadcast(contested), acceptor, "left_anti")
            contenders = touched.unionByName(props)
        winners = best_by(contenders, acceptor, akey).localCheckpoint(eager=True)
        # losers covers BOTH rejected new proposals and displaced holders
        # (a displaced hold is a contender whose acceptor chose another);
        # each carries its pair's key — the next watermark is the max
        losers = (
            contenders.join(
                winners.select(F.col(acceptor), F.col(proposer).alias("__wp")),
                acceptor,
            )
            .filter(F.col(proposer) != F.col("__wp"))
            .select(proposer, pkey.alias("__lost"))
        )
        holds = untouched.unionByName(winners)
        if rounds % checkpoint_every == 0:
            holds = holds.localCheckpoint(eager=True)
        # no conflicts => every proposal was accepted => every proposer
        # with remaining candidates is now held: stable, stop.
        if losers.isEmpty():
            break
        unassigned = (
            losers.groupBy(proposer)
            .agg(F.max("__lost").alias("__wm"))
            .localCheckpoint(eager=True)
        )
    else:
        # loop exhausted without the no-losers break: the matching has NOT
        # reached the stable fixed point — returning it silently would
        # diverge from the reference (ADVICE r1). Displacement chains are
        # at most O(acceptors), so a sufficient max_rounds always exists.
        raise RuntimeError(
            f"deferred_acceptance did not converge in {max_rounds} rounds; "
            "raise max_rounds (chains are bounded by the acceptor count)"
        )
    return holds, rounds


def checkpointed_correlate(
    spark: SparkSession,
    elements: DataFrame,
    items: DataFrame,
    params: "CorrelatorParams | None",
    ck,
    cc_max_iter: int = 64,
    fail_after_batches: int | None = None,  # crash-simulation test hook
) -> DataFrame:
    """Resumable correlate with EXACT global semantics.

    Naive spatial bucketing breaks the matching: a displacement chain (or
    simply a best match) can cross any fixed geographic boundary. The
    correct unit of checkpointing is a CONNECTED COMPONENT of the
    candidate graph (all item–element pairs within seek_distance): no
    candidate edge crosses components, so deferred acceptance on each
    component is independent and the union of per-component matchings IS
    the global fixed point. Components are hashed into ck.n_buckets
    buckets; each bucket correlates its elements against its co-bucketed
    items via ck.run's `process(df, bucket=)` path and writes the
    six-kind correlations — crash/resume semantics come from
    CheckpointedRun (idempotent dynamic-overwrite writes).

    Dense regions (the Riga hotspot) honestly form large components —
    they ARE one matching problem; granularity cannot exceed problem
    structure without changing answers.

    Returns the unified correlations DataFrame (== correlate(...)
    .correlations on the same inputs).
    """
    from osmalyzer_spark.operators.dedup import connected_components_star

    p = params or CorrelatorParams()
    if p.match_anywhere:
        raise ValueError("checkpointed_correlate requires distance-bounded matching")
    if p.lone_upgrade_unbounded:
        raise ValueError(
            "unbounded lone upgrades can cross candidate components; use a "
            "bounded radius <= seek_distance"
        )
    if p.lone_upgrade_radius_m is not None and p.lone_upgrade_radius_m > p.seek_distance:
        raise ValueError("lone_upgrade_radius_m beyond seek_distance crosses components")

    pairs = radius_join(
        items.select("item_id", "item_lat", "item_lon"),
        elements.select("elem_id", "elem_lat", "elem_lon"),
        p.seek_distance,
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
        dist_col="__d",
        salt=p.salt,
    ).select(
        F.concat(F.lit("i:"), F.col("item_id").cast("string")).alias("id_a"),
        F.concat(F.lit("e:"), F.col("elem_id").cast("string")).alias("id_b"),
    )
    # two-phase star CC: O(log n) rounds regardless of component diameter
    # (min-label propagation is O(diameter) — a dense hotspot component's
    # diameter ~ extent/seek, measured in BENCH.md; the star algorithm's
    # round count is 8 on the 1M/775 m giant component, measured)
    comps = connected_components_star(pairs, max_iter=cc_max_iter)

    def with_bucket(df: DataFrame, prefix: str, id_col: str) -> DataFrame:
        key = F.concat(F.lit(prefix), F.col(id_col).cast("string"))
        joined = df.join(
            comps.select(F.col("id").alias("__k"), "component"),
            key == F.col("__k"),
            "left",
        ).drop("__k")
        # candidate-less rows are singleton components of their own key
        return joined.withColumn(
            "__cbucket",
            F.pmod(F.xxhash64(F.coalesce("component", key)), F.lit(ck.n_buckets)).cast(
                "int"
            ),
        ).drop("component")

    # stage both sides partitioned by __cbucket: every per-bucket filter
    # below (ck.run's element slices AND the co-bucketed item lookups) is
    # a partition-pruned directory read, never a rescan of the input
    # (VERDICT r2 item 3; pruning asserted in tests)
    elems_b = ck.stage_bucketed(spark, with_bucket(elements, "e:", "elem_id"), "elements")
    items_b = ck.stage_bucketed(spark, with_bucket(items, "i:", "item_id"), "items")

    def process(df: DataFrame, bucket: int) -> DataFrame:
        bucket_items = items_b.filter(F.col("__cbucket") == bucket).drop("__cbucket")
        return correlate(
            spark, df.drop("__cbucket"), bucket_items, p
        ).correlations

    return ck.run(
        spark, elems_b, process,
        bucket_expr=F.col("__cbucket"),
        fail_after_batches=fail_after_batches,
    )


def correlate(
    spark: SparkSession,
    elements: DataFrame,
    items: DataFrame,
    params: CorrelatorParams | None = None,
) -> CorrelationResult:
    """Run the correlator.

    `elements` needs columns (elem_id, elem_lat, elem_lon) plus whatever
    the strength / lone-allowance expressions reference; `items` needs
    (item_id, item_lat, item_lon) likewise. All other columns ride into
    the candidate pairs — keep the inputs slim (no binary payloads).
    """
    p = params or CorrelatorParams()
    _no_binary(elements, "elements")
    _no_binary(items, "items")

    outside = None
    if p.polygon is not None:
        inside = contains_expr(p.polygon, "item_lat", "item_lon")
        items = items.withColumn("__inside", inside).persist()
        outside = (
            items.filter(~F.col("__inside")).select("item_id")
            if p.report_outside_polygon
            else None
        )
        items = items.filter(F.col("__inside")).drop("__inside")

    # --- candidate pairs -------------------------------------------------
    if p.match_anywhere:
        pairs = items.crossJoin(elements).withColumn("dist_m", F.lit(0.0))
    else:
        pairs = radius_join(
            items,
            elements,
            p.seek_distance,
            probe_coords=("item_lat", "item_lon"),
            build_coords=("elem_lat", "elem_lon"),
            dist_col="dist_m",
            broadcast_probe=p.broadcast_items,
            salt=p.salt,
        )
    strength = (
        p.strength_expr(pairs) if p.strength_expr is not None else F.lit(REGULAR)
    )
    pairs = pairs.withColumn("strength", strength.cast("int"))
    pairs = pairs.filter(F.col("strength") > UNMATCHED)
    if not p.match_anywhere:
        allowed = (
            F.when(F.col("strength") == REGULAR, F.lit(p.unmatch_distance))
            .when(F.col("strength") == GOOD, F.lit(p.unmatch_distance + p.good_extra_distance))
            .otherwise(F.lit(p.unmatch_distance + p.strong_extra_distance))
        )
        pairs = pairs.filter(F.col("dist_m") <= allowed)
    cand = pairs.select("item_id", "elem_id", "strength", "dist_m")

    # --- forward assignment (items propose) ------------------------------
    # ascending key components (descending = negate), per the DA contract
    if p.match_anywhere:
        # distance is meaningless; the reference takes the "first" element
        # (list order) — we define first = lowest elem_id (SURVEY §7.3)
        proposer_order = [F.col("elem_id")]
        acceptor_order = [-F.col("strength"), F.col("item_id")]
    else:
        proposer_order = [F.col("dist_m"), F.col("elem_id")]
        acceptor_order = [
            -F.col("strength"),
            F.col("dist_m"),
            F.col("item_id"),
        ]
    holds, rounds = deferred_acceptance(
        spark, cand, "item_id", "elem_id", proposer_order, acceptor_order, p.max_rounds
    )
    matched = holds.withColumn(
        "far",
        F.lit(False) if p.match_anywhere else F.col("dist_m") > F.lit(p.match_distance),
    ).localCheckpoint(eager=True)

    # --- reverse pass (unmatched elements) --------------------------------
    unmatched_items = items.join(
        matched.select("item_id"), "item_id", "left_anti"
    ).localCheckpoint(eager=True)
    unmatched_elems = elements.join(
        matched.select("elem_id"), "elem_id", "left_anti"
    )
    if p.lone_allowance_expr is not None:
        unmatched_elems = unmatched_elems.withColumn(
            "__lone", p.lone_allowance_expr(unmatched_elems)
        ).localCheckpoint(eager=True)
        lone_cand = unmatched_elems.filter(F.col("__lone")).drop("__lone")
        plain_unmatched = unmatched_elems.filter(~F.col("__lone")).drop("__lone")
    else:
        lone_cand = unmatched_elems.limit(0)
        plain_unmatched = unmatched_elems

    # --- lone strong-match upgrade (Correlator.cs:249-287) ----------------
    if (
        p.lone_strong_match_strength is not None
        and p.strength_expr is not None
        and not p.match_anywhere
    ):
        if p.lone_upgrade_unbounded:
            from osmalyzer_spark.geo.distance import haversine_m

            up_pairs = lone_cand.crossJoin(unmatched_items).withColumn(
                "dist_m",
                haversine_m("item_lat", "item_lon", "elem_lat", "elem_lon"),
            )
        else:
            up_pairs = radius_join(
                lone_cand,
                unmatched_items,
                p.lone_upgrade_radius_m
                if p.lone_upgrade_radius_m is not None
                else p.seek_distance,
                probe_coords=("elem_lat", "elem_lon"),
                build_coords=("item_lat", "item_lon"),
                dist_col="dist_m",
            )
        up_pairs = up_pairs.withColumn(
            "strength", p.strength_expr(up_pairs).cast("int")
        ).filter(F.col("strength") >= F.lit(p.lone_strong_match_strength))
        up_cand = up_pairs.select("item_id", "elem_id", "strength", "dist_m")
        # elements propose for their best item; items accept their best
        up_holds, _ = deferred_acceptance(
            spark,
            up_cand,
            proposer="elem_id",
            acceptor="item_id",
            proposer_order=[
                -F.col("strength"),
                F.col("dist_m"),
                F.col("item_id"),
            ],
            acceptor_order=[
                -F.col("strength"),
                F.col("dist_m"),
                F.col("elem_id"),
            ],
            max_rounds=p.max_rounds,
        )
        upgrades = up_holds.withColumn(
            "far", F.col("dist_m") > F.lit(p.match_distance)
        ).localCheckpoint(eager=True)
        matched = matched.unionByName(upgrades)
        lone_cand = lone_cand.join(upgrades.select("elem_id"), "elem_id", "left_anti")
        unmatched_items = unmatched_items.join(
            upgrades.select("item_id"), "item_id", "left_anti"
        )

    return CorrelationResult(
        matched=matched,
        unmatched_items=unmatched_items.select("item_id"),
        unmatched_elements=plain_unmatched.select("elem_id"),
        lone_elements=lone_cand.select("elem_id"),
        outside_items=outside,
        rounds=rounds,
    )
