"""Driver-contract queries: one entry per implemented operator family
(SURVEY.md §2), each with a DuckDB-runnable ANSI-SQL oracle.

The driver runs ``queries()[name](spark, sf_dir)`` against
``oracle_sql()[name]`` on the same parquet tables at sf=0.01 and compares
row count + schema + order-insensitive value hash. Doubles are therefore
rounded on BOTH sides and every computed column is aliased identically.

Spatial operators don't have native coordinates in the TPC-H-ish driver
tables, so both sides derive deterministic synthetic lat/lon from integer
keys with IDENTICAL arithmetic (shared SQL text; the Spark side applies it
via F.expr). A third of the points land in a dense "Riga" hotspot so the
cell join sees skew even here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmalyzer_spark.geo.cells import cell_id_sql
from osmalyzer_spark.geo.distance import haversine_sql
from osmalyzer_spark.operators.knn import closest_join, radius_join

# --------------------------------------------------------------------------
# shared synthetic-coordinate derivation (identical SQL text both engines)
# --------------------------------------------------------------------------


def synth_lat_sql(key: str) -> str:
    """Deterministic Latvia-extent latitude from an integer key; ~30% of
    keys cluster into the Riga hotspot (skew fixture)."""
    # e0-suffixed literals parse as DOUBLE in both Spark SQL and DuckDB
    # (bare 56.90 is DECIMAL in Spark SQL, which would poison downstream
    # aggregates into decimal arithmetic)
    return (
        f"(CASE WHEN ({key}) % 10 < 3 "
        f"THEN 56.90e0 + ((({key}) * 2654435761) % 100003) / 100003.0e0 * 0.10e0 "
        f"ELSE 55.60e0 + ((({key}) * 2654435761) % 1000003) / 1000003.0e0 * 2.50e0 END)"
    )


def synth_lon_sql(key: str) -> str:
    return (
        f"(CASE WHEN ({key}) % 10 < 3 "
        f"THEN 24.00e0 + ((({key}) * 40503) % 100019) / 100019.0e0 * 0.20e0 "
        f"ELSE 20.90e0 + ((({key}) * 40503) % 999983) / 999983.0e0 * 7.40e0 END)"
    )


def _geo_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return c.select(
        F.col("c_custkey").alias("elem_id"),
        F.expr(synth_lat_sql("c_custkey")).alias("elem_lat"),
        F.expr(synth_lon_sql("c_custkey")).alias("elem_lon"),
    )


def _geo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return s.select(
        F.col("s_suppkey").alias("item_id"),
        F.expr(synth_lat_sql("s_suppkey")).alias("item_lat"),
        F.expr(synth_lon_sql("s_suppkey")).alias("item_lon"),
    )


_GEO_CUST_SQL = (
    "SELECT c_custkey AS elem_id, {lat} AS elem_lat, {lon} AS elem_lon FROM customer"
).format(lat=synth_lat_sql("c_custkey"), lon=synth_lon_sql("c_custkey"))
_GEO_SUPP_SQL = (
    "SELECT s_suppkey AS item_id, {lat} AS item_lat, {lon} AS item_lon FROM supplier"
).format(lat=synth_lat_sql("s_suppkey"), lon=synth_lon_sql("s_suppkey"))

_PAIR_DIST_SQL = haversine_sql("i.item_lat", "i.item_lon", "c.elem_lat", "c.elem_lon")

# concave test polygon (lat, lon) — Latvia extent, non-convex (notch)
PIP_RING = [
    (56.2, 22.0),
    (56.2, 27.5),
    (57.8, 27.5),
    (57.8, 25.5),
    (56.8, 25.5),
    (56.8, 24.5),
    (57.8, 24.5),
    (57.8, 22.0),
]


def _pip_crossings_sql(lat: str, lon: str) -> str:
    """Hand-expanded ray-cast parity test for PIP_RING — the exact boundary
    conventions of the engine's ring_contains (OsmPolygon.cs:112-128)."""
    terms = []
    n = len(PIP_RING)
    for a in range(n):
        la, ga = PIP_RING[a]
        lb, gb = PIP_RING[a - 1]  # b = previous vertex, wrapping
        straddle = f"(({ga!r} < {lon} AND {gb!r} >= {lon}) OR ({gb!r} < {lon} AND {ga!r} >= {lon}))"
        cross_lat = f"({la!r} + ({lon} - {ga!r}) / ({gb!r} - {ga!r}) * ({lb!r} - {la!r}))"
        terms.append(f"(CASE WHEN {straddle} AND {cross_lat} < {lat} THEN 1 ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "it"]
_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# queries — Spark implementations
# --------------------------------------------------------------------------


def q01_pricing_summary(spark, sf_dir):
    """A9/§2.4 aggregations: partial-agg friendly groupBy (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q02_json_filter(spark, sf_dir):
    """S8/§2.8 JSON + F5 predicates: extract props.k, filter, tally."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


def q03_unique_values(spark, sf_dir):
    """A3 GetUniqueValues: distinct tag values."""
    return _t(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("segment")).distinct()


def q04_group_split_explode(spark, sf_dir):
    """A1 GroupByValues(split=True): ;/space-delimited value explode + group."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
    )


def q05_topk_per_group(spark, sf_dir):
    """W5/O4 best-per-group ranking."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    return (
        s.withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select(
            F.col("s_nationkey").cast("long").alias("nationkey"),
            F.col("s_suppkey").alias("suppkey"),
            F.round("s_acctbal", 2).alias("acctbal"),
            "rank_in_nation",
        )
    )


def q06_anti_join(spark, sf_dir):
    """J5/SO1 subtract: customers with no order since 2003."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2003-01-01"))
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey")
    )


def q07_semi_join(spark, sf_dir):
    """Semi join: parts shipped after a date."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= F.lit("2001-06-01"))
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        F.col("p_partkey").alias("partkey"), F.col("p_brand").alias("brand")
    )


def _us(col: str):
    # events.ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is lossless
    return F.unix_micros(F.col(col).cast("timestamp"))


def q08_lag_gap(spark, sf_dir):
    """W1 lag/lead: microsecond gap to the user's previous event."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("prev_us", F.lag(_us("ts")).over(w))
        .filter(F.col("prev_us").isNotNull())
        .select(
            "event_id",
            "user_id",
            (_us("ts") - F.col("prev_us")).alias("gap_us"),
        )
    )


def q09_sessionize(spark, sf_dir):
    """W4 gaps-and-islands sessionization (30-min gap)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = _us("ts") - F.lag(_us("ts")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("sess", sess)
        .groupBy("user_id")
        .agg(F.max("sess").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


def q10_knn_radius(spark, sf_dir):
    """J2 cell-bucketed kNN: nearest customer within 5 km per supplier."""
    items = _geo_suppliers(spark, sf_dir)
    elems = _geo_customers(spark, sf_dir)
    top1 = closest_join(
        items,
        elems,
        5000.0,
        probe_id="item_id",
        build_id="elem_id",
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
        broadcast_probe=True,
    )
    return top1.select(
        F.col("item_id").alias("suppkey"),
        F.col("elem_id").alias("custkey"),
        F.round("dist_m", 3).alias("dist_m"),
    )


def q11_mutual_best(spark, sf_dir):
    """J4-lite: mutually-nearest supplier<->customer pairs within 5 km."""
    items = _geo_suppliers(spark, sf_dir)
    elems = _geo_customers(spark, sf_dir)
    pairs = radius_join(
        items,
        elems,
        5000.0,
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
        broadcast_probe=True,
    )
    wi = Window.partitionBy("item_id").orderBy(F.col("dist_m").asc(), F.col("elem_id").asc())
    we = Window.partitionBy("elem_id").orderBy(F.col("dist_m").asc(), F.col("item_id").asc())
    return (
        pairs.withColumn("ri", F.row_number().over(wi))
        .withColumn("re", F.row_number().over(we))
        .filter((F.col("ri") == 1) & (F.col("re") == 1))
        .select(
            F.col("item_id").alias("suppkey"),
            F.col("elem_id").alias("custkey"),
            F.round("dist_m", 3).alias("dist_m"),
        )
    )


def q12_point_in_polygon(spark, sf_dir):
    """J3 PIP: customers inside the concave PIP_RING (vectorized ray cast)."""
    import numpy as np

    from osmalyzer_spark.geo.polygon import Polygon, contains_expr

    poly = Polygon(outers=[np.array(PIP_RING, dtype=float)], polygon_id="test")
    elems = _geo_customers(spark, sf_dir)
    return (
        elems.withColumn("inside", contains_expr(poly, "elem_lat", "elem_lon"))
        .filter(F.col("inside"))
        .select(F.col("elem_id").alias("custkey"))
    )


def q13_tile_assignment(spark, sf_dir):
    """Tiles: slippy-map tile ids at zoom 12 + per-tile counts."""
    z = 12
    n = 1 << z
    elems = _geo_customers(spark, sf_dir)
    lat_r = F.radians("elem_lat")
    xtile = F.floor((F.col("elem_lon") + 180.0) / 360.0 * n).cast("long")
    ytile = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / F.lit(3.141592653589793)) / 2.0 * n
    ).cast("long")
    return (
        elems.withColumn("tile_x", xtile)
        .withColumn("tile_y", ytile)
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def q14_centroid(spark, sf_dir):
    """A4 average coordinate per group."""
    c = _t(spark, sf_dir, "customer")
    geo = c.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.expr(synth_lat_sql("c_custkey")).alias("lat"),
        F.expr(synth_lon_sql("c_custkey")).alias("lon"),
    )
    # round(4): avg() is float-summation-order dependent; 1e-4 deg (~10 m)
    # leaves ample margin over the ~1e-12 partial-agg ordering noise
    return geo.groupBy("nationkey").agg(
        F.round(F.avg("lat"), 4).alias("centroid_lat"),
        F.round(F.avg("lon"), 4).alias("centroid_lon"),
        F.count(F.lit(1)).alias("n"),
    )


def q15_dedup_tokenset(spark, sf_dir):
    """Dedup (exact, normalized): md5 fingerprint over the sorted distinct
    token set; groups sharing a fingerprint are duplicates."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(
            "\x1f", F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
        )
    )
    return (
        docs.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def q16_ngram_jaccard(spark, sf_dir):
    """Near-dup: exact token-set Jaccard >= 0.6 pairs via the
    inverted-index operator (size-band prefilter preserves semantics)."""
    from osmalyzer_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.6)


def q17_cosine_topk(spark, sf_dir):
    """Similarity search: brute-force cosine top-3 neighbors for probe
    vectors (vec_id < 20), JVM-side fold (no UDF)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    cand = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    dot = F.aggregate(
        F.zip_with("pv", "cv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))  # noqa: E731
    pairs = (
        cand.join(F.broadcast(probes), F.col("probe_id") != F.col("cand_id"))
        .withColumn("cosine", dot / (norm(F.col("pv")) * norm(F.col("cv"))))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "cand_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def q18_text_quality(spark, sf_dir):
    """Text quality scoring: token counts + stopword ratio per document."""
    docs = _t(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    n_tok = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stop"),
        F.round(n_stop / n_tok, 4).alias("stop_ratio"),
        F.length("text").cast("long").alias("n_chars_real"),
    )


def q19_lang_guess(spark, sf_dir):
    """Language-ID heuristic: stopword-hit threshold."""
    docs = _t(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    return docs.select(
        "doc_id",
        F.when(n_stop >= 3, F.lit("en")).otherwise(F.lit("other")).alias("guess"),
        "lang",
    )


def q21_minhash_lsh(spark, sf_dir):
    """Dedup scale path: MinHash(128)+LSH(32 bands) near-dup candidate
    pairs with signature-estimated jaccard >= 0.5. Non-SQL (hash family);
    pytest verifies estimates against exact shingle jaccard."""
    from osmalyzer_spark.operators.dedup import minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup(docs, "doc_id", "text", threshold=0.5, num_hashes=128, bands=32)


def q22_simhash(spark, sf_dir):
    """Dedup: 64-bit SimHash fingerprints, near pairs at hamming <= 8 via
    16-bit band buckets + native bit_count. Non-SQL (hash family)."""
    from osmalyzer_spark.operators.dedup import simhash_fingerprints, simhash_near_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_near_pairs(simhash_fingerprints(docs, "doc_id", "text"), max_hamming=8)


def q23_embedding_near_dup(spark, sf_dir):
    """Dedup tier 4: embedding-cosine near-dup pairs via hyperplane LSH
    buckets + exact verify. Threshold 0.4 because the synthetic embeddings
    have no true dups (max pairwise cosine ~0.51) — the operator still
    exercises bucket-join + rerank end to end. Non-SQL (plane family)."""
    from osmalyzer_spark.operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.4)


def q24_cosine_lsh(spark, sf_dir):
    """ANN scale path: LSH-bucketed cosine top-3 for probes vec_id < 20
    (recall checked against q17's exact answer in pytest). Non-SQL."""
    from osmalyzer_spark.operators.similarity import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    return cosine_topk_lsh(emb, probes, k=3, n_planes=10, n_tables=4)


def q25_tile_region(spark, sf_dir):
    """Raster-tile<->vector assignment (north_star): zoom-12 tile id +
    inside/outside the concave PIP_RING region, per-tile-region counts."""
    import numpy as np

    from osmalyzer_spark.geo.polygon import Polygon, contains_expr
    from osmalyzer_spark.operators.tiles import assign_tiles

    poly = Polygon(outers=[np.array(PIP_RING, dtype=float)], polygon_id="region")
    elems = _geo_customers(spark, sf_dir)
    assigned = assign_tiles(elems, zoom=12, lat="elem_lat", lon="elem_lon")
    return (
        assigned.withColumn("in_region", contains_expr(poly, "elem_lat", "elem_lon"))
        .groupBy("tile_x", "tile_y", "in_region")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def q26_sharp_angles(spark, sf_dir):
    """W3 consecutive-segment angles: treat each user's event sequence as a
    polyline over synthetic coords; flag interior angles < 60 deg."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        F.expr(synth_lat_sql("event_id")).alias("lat"),
        F.expr(synth_lon_sql("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    t = (
        pts.withColumn("plat", F.lag("lat").over(w))
        .withColumn("plon", F.lag("lon").over(w))
        .withColumn("nlat", F.lead("lat").over(w))
        .withColumn("nlon", F.lead("lon").over(w))
        .filter(F.col("plat").isNotNull() & F.col("nlat").isNotNull())
    )
    from osmalyzer_spark.geo.distance import angle_between_segments_deg

    angle = angle_between_segments_deg("plat", "plon", "lat", "lon", "nlat", "nlon")
    return (
        t.withColumn("angle_deg", F.round(angle, 3))
        .filter(F.col("angle_deg") < 60.0)
        .select("user_id", "event_id", "angle_deg")
    )


def q27_correlator(spark, sf_dir):
    """J4 flagship: full correlator over synthetic geo views (suppliers as
    items, customers as elements). Iterative mutual-best assignment is not
    SQL-expressible — rows-only driver check; semantics verified in pytest
    against the sequential oracle (tests/test_correlator.py)."""
    from osmalyzer_spark.operators.correlator import CorrelatorParams, correlate

    elements = _geo_customers(spark, sf_dir).withColumn(
        "elem_tag", (F.col("elem_id") % 7).cast("string")
    )
    items = _geo_suppliers(spark, sf_dir).withColumn(
        "item_tag", (F.col("item_id") % 7).cast("string")
    )
    params = CorrelatorParams(
        match_distance=150.0,
        unmatch_distance=1500.0,
        strong_extra_distance=3000.0,
        strength_expr=lambda df: F.when(
            F.col("item_tag") == F.col("elem_tag"), F.lit(3)
        ).otherwise(F.lit(1)),
        lone_allowance_expr=lambda df: F.col("elem_id") % 11 == 0,
    )
    res = correlate(spark, elements, items, params)
    return res.correlations.withColumn("distance", F.round("distance", 3))


def q28_clean_corpus(spark, sf_dir):
    """Training-data composite: quality gate -> exact dedup -> MinHash
    near-dup collapse, reported as per-stage row counts (deterministic;
    rows-only driver check — hash-family ops inside)."""
    from osmalyzer_spark.plans.pipeline import clean_corpus

    docs = _t(spark, sf_dir, "documents")
    _, report = clean_corpus(spark, docs, min_quality=0.4, neardup_threshold=0.6)
    return spark.createDataFrame(report.as_rows(), "stage string, n_docs long")


def q20_route_variants(spark, sf_dir):
    """A8 route-variant extraction: group identical ordered event-type
    sequences (events as GTFS stop_times analog)."""
    ev = _t(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("type_seq")
        )
    )
    return seq.groupBy("type_seq").agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------

_ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_json_filter": r"""
        WITH e AS (
          SELECT event_type, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
          FROM events
        )
        SELECT event_type, count(*) AS n, sum(k) AS sum_k FROM e WHERE k >= 50
        GROUP BY event_type
    """,
    "q03_unique_values": "SELECT DISTINCT c_mktsegment AS segment FROM customer",
    "q04_group_split_explode": """
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word HAVING count(*) >= 50
    """,
    "q05_topk_per_group": """
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey, s_suppkey AS suppkey,
               round(s_acctbal, 2) AS acctbal, rank_in_nation
        FROM (
          SELECT *, row_number() OVER (PARTITION BY s_nationkey
                                       ORDER BY s_acctbal DESC, s_suppkey ASC) AS rank_in_nation
          FROM supplier
        ) WHERE rank_in_nation <= 3
    """,
    "q06_anti_join": """
        SELECT c_custkey AS custkey FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2003-01-01')
    """,
    "q07_semi_join": """
        SELECT p_partkey AS partkey, p_brand AS brand FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01')
    """,
    "q08_lag_gap": """
        SELECT event_id, user_id, gap_us FROM (
          SELECT event_id, user_id,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events
        ) WHERE gap_us IS NOT NULL
    """,
    "q09_sessionize": """
        WITH g AS (
          SELECT user_id,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id ROWS UNBOUNDED PRECEDING) AS sess
          FROM (SELECT user_id, new_sess FROM g) q
        )
        SELECT user_id, max(sess) AS n_sessions, count(*) AS n_events FROM s GROUP BY user_id
    """,
    "q10_knn_radius": f"""
        WITH i AS ({_GEO_SUPP_SQL}), c AS ({_GEO_CUST_SQL}),
        pairs AS (
          SELECT i.item_id, c.elem_id, {_PAIR_DIST_SQL} AS d
          FROM i CROSS JOIN c
        ), ranked AS (
          SELECT item_id, elem_id, d,
                 row_number() OVER (PARTITION BY item_id ORDER BY d ASC, elem_id ASC) AS rn
          FROM pairs WHERE d <= 5000.0
        )
        SELECT item_id AS suppkey, elem_id AS custkey, round(d, 3) AS dist_m
        FROM ranked WHERE rn = 1
    """,
    "q11_mutual_best": f"""
        WITH i AS ({_GEO_SUPP_SQL}), c AS ({_GEO_CUST_SQL}),
        pairs AS (
          SELECT i.item_id, c.elem_id, {_PAIR_DIST_SQL} AS d
          FROM i CROSS JOIN c
        ), flt AS (SELECT * FROM pairs WHERE d <= 5000.0),
        ranked AS (
          SELECT item_id, elem_id, d,
                 row_number() OVER (PARTITION BY item_id ORDER BY d ASC, elem_id ASC) AS ri,
                 row_number() OVER (PARTITION BY elem_id ORDER BY d ASC, item_id ASC) AS re
          FROM flt
        )
        SELECT item_id AS suppkey, elem_id AS custkey, round(d, 3) AS dist_m
        FROM ranked WHERE ri = 1 AND re = 1
    """,
    "q12_point_in_polygon": f"""
        WITH c AS ({_GEO_CUST_SQL})
        SELECT elem_id AS custkey FROM c
        WHERE ({_pip_crossings_sql("elem_lat", "elem_lon")}) % 2 = 1
    """,
    "q13_tile_assignment": f"""
        WITH c AS ({_GEO_CUST_SQL})
        SELECT CAST(floor((elem_lon + 180.0) / 360.0 * 4096) AS BIGINT) AS tile_x,
               CAST(floor((1.0 - ln(tan(radians(elem_lat)) + 1.0/cos(radians(elem_lat))) / 3.141592653589793) / 2.0 * 4096) AS BIGINT) AS tile_y,
               count(*) AS n_points
        FROM c GROUP BY 1, 2
    """,
    "q14_centroid": f"""
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               round(avg({synth_lat_sql("c_custkey")}), 4) AS centroid_lat,
               round(avg({synth_lon_sql("c_custkey")}), 4) AS centroid_lon,
               count(*) AS n
        FROM customer GROUP BY 1
    """,
    "q15_dedup_tokenset": """
        WITH fp AS (
          SELECT doc_id,
                 md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))), 'string_agg', chr(31))) AS fingerprint
          FROM documents
        )
        SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS keep_doc_id
        FROM fp GROUP BY fingerprint HAVING count(*) > 1
    """,
    "q16_ngram_jaccard": """
        WITH words AS (
          SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
          ) WHERE w <> ''
        ), sizes AS (
          SELECT doc_id, count(*) AS sz FROM words GROUP BY doc_id
        ), common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
          FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 4) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_common * 1.0 / (sa.sz + sb.sz - n_common) >= 0.6
    """,
    "q17_cosine_topk": """
        WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        pairs AS (
          SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                 list_dot_product(p.v, c.v) / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))) AS cosine
          FROM emb p JOIN emb c ON p.vec_id <> c.vec_id
          WHERE p.vec_id < 20
        ), ranked AS (
          SELECT probe_id, cand_id, cosine,
                 row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id ASC) AS rank
          FROM pairs
        )
        SELECT probe_id, cand_id, round(cosine, 6) AS cosine, rank FROM ranked WHERE rank <= 3
    """,
    "q18_text_quality": f"""
        WITH w AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words, text
          FROM documents
        )
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(words, x -> x IN ({_STOP_IN}))) AS BIGINT) AS n_stop,
               round(len(list_filter(words, x -> x IN ({_STOP_IN}))) * 1.0 / len(words), 4) AS stop_ratio,
               CAST(length(text) AS BIGINT) AS n_chars_real
        FROM w
    """,
    "q19_lang_guess": f"""
        WITH w AS (
          SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x <> '') AS words
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN len(list_filter(words, x -> x IN ({_STOP_IN}))) >= 3
                    THEN 'en' ELSE 'other' END AS guess,
               lang
        FROM w
    """,
    "q20_route_variants": """
        WITH seqs AS (
          SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS type_seq
          FROM events GROUP BY user_id
        )
        SELECT type_seq, count(*) AS n_users FROM seqs GROUP BY type_seq
    """,
    "q26_sharp_angles": f"""
        WITH pts AS (
          SELECT user_id, event_id,
                 {synth_lat_sql("event_id")} AS lat,
                 {synth_lon_sql("event_id")} AS lon
          FROM events
        ), t AS (
          SELECT user_id, event_id, lat, lon,
                 lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
                 lead(lat) OVER w AS nlat, lead(lon) OVER w AS nlon
          FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        ), ang AS (
          SELECT user_id, event_id,
                 degrees(atan2(
                   abs(((plon - lon) * cos(radians(lat))) * (nlat - lat)
                       - (plat - lat) * ((nlon - lon) * cos(radians(lat)))),
                   ((plon - lon) * cos(radians(lat))) * ((nlon - lon) * cos(radians(lat)))
                       + (plat - lat) * (nlat - lat)
                 )) AS angle
          FROM t WHERE plat IS NOT NULL AND nlat IS NOT NULL
        )
        SELECT user_id, event_id, round(angle, 3) AS angle_deg
        FROM ang WHERE round(angle, 3) < 60.0
    """,
    "q25_tile_region": f"""
        WITH c AS ({_GEO_CUST_SQL})
        SELECT CAST(floor((elem_lon + 180.0) / 360.0 * 4096) AS BIGINT) AS tile_x,
               CAST(floor((1.0 - ln(tan(radians(elem_lat)) + 1.0/cos(radians(elem_lat))) / 3.141592653589793) / 2.0 * 4096) AS BIGINT) AS tile_y,
               ({_pip_crossings_sql("elem_lat", "elem_lon")}) % 2 = 1 AS in_region,
               count(*) AS n_points
        FROM c GROUP BY 1, 2, 3
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_json_filter": q02_json_filter,
        "q03_unique_values": q03_unique_values,
        "q04_group_split_explode": q04_group_split_explode,
        "q05_topk_per_group": q05_topk_per_group,
        "q06_anti_join": q06_anti_join,
        "q07_semi_join": q07_semi_join,
        "q08_lag_gap": q08_lag_gap,
        "q09_sessionize": q09_sessionize,
        "q10_knn_radius": q10_knn_radius,
        "q11_mutual_best": q11_mutual_best,
        "q12_point_in_polygon": q12_point_in_polygon,
        "q13_tile_assignment": q13_tile_assignment,
        "q14_centroid": q14_centroid,
        "q15_dedup_tokenset": q15_dedup_tokenset,
        "q16_ngram_jaccard": q16_ngram_jaccard,
        "q17_cosine_topk": q17_cosine_topk,
        "q18_text_quality": q18_text_quality,
        "q19_lang_guess": q19_lang_guess,
        "q20_route_variants": q20_route_variants,
        "q21_minhash_lsh": q21_minhash_lsh,
        "q22_simhash": q22_simhash,
        "q23_embedding_near_dup": q23_embedding_near_dup,
        "q24_cosine_lsh": q24_cosine_lsh,
        "q25_tile_region": q25_tile_region,
        "q26_sharp_angles": q26_sharp_angles,
        "q27_correlator": q27_correlator,
        "q28_clean_corpus": q28_clean_corpus,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
