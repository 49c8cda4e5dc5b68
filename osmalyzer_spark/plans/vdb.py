"""VDB (Vietvārdu datubāze) place-name pipeline: the reference's
VdbAnalysisData ingest quirks + VdbAnalyzer statistics (reference
`Osmalyzer/Data/Misc Data Fetchers/VdbAnalysisData.cs:160-418`,
`Osmalyzer/Analyzers/Miscellaneous/VdbAnalyzer.cs:20-100`).

Semantics preserved:

- duplicate-candidate key = every compared field joined with '|' (the
  reference drops OBJECTID/OBJEKTAID/DATUMSIZM from the key; nulls join
  as empty strings, VdbAnalysisData.cs:191-199).
- ONLY groups of exactly 2 are resolved (:239-286): if one member is on
  the known whitelist (object id + main name pairs) it is kept and the
  other removed (resolved issue); if neither is known BOTH are removed
  (unresolved issue). Groups of 3+ pass through untouched — quirk
  preserved.
- typed parsing (:290-412): the six STAVOKLIS states (unknown values
  raise, as the reference throws), the seven recognized VEIDS object
  types (everything else is Unparsed), OFICIALS -> bool,
  IsActive == Exists only (VdbEntry.cs:780 "not including PartiallyGone
  to be more strict"), viensēta+mazciems -> hamlets, valstspilsēta +
  novada pilsēta -> cities.
- analyzer stats (VdbAnalyzer.cs:40-95): per-admin-category total and
  active counts, and the alt-name qualifier histograms (pronunciation
  `[..]` vs comment `(..)`) computed through the REAL bracket parser
  (functions/altnames.py, mirrored test-for-test from
  VdbAltNamesParserTests).

Spark shape: the duplicate key is one concat_ws + a count window (one
shuffle on the key); the whitelist is a broadcast join; qualifier
histograms are explode -> groupBy. The reference resolves which of two
known duplicates wins by CSV file order — a DataFrame has no file
order, so when BOTH members are whitelisted the smaller object id wins
(deterministic stand-in; the reference's actual whitelist never lists
both sides of a pair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmalyzer_spark.functions.altnames import parse_alt_names_col

STATE_MAP = {
    "pastāv": "exists",
    "daļēji izzudis": "partially_gone",
    "nepastāv": "gone",
    "nedarbojas": "not_operating",
    "nezināms": "unknown",
    "nosusināts/ nolaists": "drained",
}

TYPE_MAP = {
    "viensēta": "hamlet",
    "ciems": "village",
    "mazciems": "hamlet",
    "pagasts": "parish",
    "novads": "municipality",
    "valstspilsēta": "state_city",
    "novada pilsēta": "municipal_city",
}

ADMIN_CATEGORY = {
    "hamlet": "hamlets",
    "village": "villages",
    "parish": "parishes",
    "municipality": "municipalities",
    "state_city": "cities",
    "municipal_city": "cities",
}


def vdb_resolve_duplicates(
    spark: SparkSession,
    raw: DataFrame,
    compared_cols: list[str],
    known: list[tuple[str, str]],
) -> tuple[DataFrame, DataFrame]:
    """Returns (surviving raw entries, issues).

    raw must carry `object_id` (string) and `main_name` plus the
    compared columns. issues: (kind, main_id, other_id) with kind in
    {resolved_dup, unresolved_dup}; unresolved pairs are reported as
    (min, max) object id.
    """
    key = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in compared_cols]
    )
    w = Window.partitionBy("__key")
    tagged = raw.withColumn("__key", key).withColumn(
        "__cnt", F.count(F.lit(1)).over(w)
    )
    known_df = F.broadcast(
        spark.createDataFrame(
            list(known) or [("", "")], "k_id string, k_name string"
        )
    )
    pairs = (
        tagged.filter(F.col("__cnt") == 2)
        .join(
            known_df,
            (F.col("object_id") == F.col("k_id"))
            & (F.col("main_name") == F.col("k_name")),
            "left",
        )
        .withColumn("__known", F.col("k_id").isNotNull())
        .drop("k_id", "k_name")
    )
    # per pair: the known member wins; ties (both known) break on the
    # smaller object id — see module docstring
    pw = Window.partitionBy("__key").orderBy(
        F.col("__known").desc(), F.col("object_id").cast("long").asc()
    )
    ranked = pairs.withColumn("__rn", F.row_number().over(pw))
    sides = (
        ranked.groupBy("__key")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("object_id"))).alias("main_id"),
            F.max(F.when(F.col("__rn") == 2, F.col("object_id"))).alias("other_id"),
            F.max(F.when(F.col("__rn") == 1, F.col("__known"))).alias("any_known"),
        )
    )
    issues = sides.select(
        F.when(F.col("any_known"), F.lit("resolved_dup"))
        .otherwise(F.lit("unresolved_dup"))
        .alias("kind"),
        F.when(F.col("any_known"), F.col("main_id"))
        .otherwise(F.least(F.col("main_id").cast("long"), F.col("other_id").cast("long")).cast("string"))
        .alias("main_id"),
        F.when(F.col("any_known"), F.col("other_id"))
        .otherwise(F.greatest(F.col("main_id").cast("long"), F.col("other_id").cast("long")).cast("string"))
        .alias("other_id"),
    )
    keep_pairs = ranked.filter(F.col("__known") & (F.col("__rn") == 1))
    survivors = (
        tagged.filter(F.col("__cnt") != 2)
        .unionByName(keep_pairs.drop("__known", "__rn"))
        .drop("__key", "__cnt")
    )
    return survivors, issues


def _map_expr(col: Column, mapping: dict[str, str], default=None) -> Column:
    out = None
    for k, v in mapping.items():
        cond = col == k
        out = F.when(cond, F.lit(v)) if out is None else out.when(cond, F.lit(v))
    return out.otherwise(F.lit(default))


def vdb_typed(entries: DataFrame) -> DataFrame:
    """Typed projection (state/object_type/official/is_active). A state
    outside the six known STAVOKLIS values raises at execution, like the
    reference's throw (VdbAnalysisData.cs:318-319)."""
    state = _map_expr(F.col("state_raw"), STATE_MAP)
    checked = F.when(state.isNotNull(), state).otherwise(
        F.raise_error(
            F.concat(F.lit("Unknown STAVOKLIS value in VDB data: "),
                     F.coalesce(F.col("state_raw"), F.lit("<null>")))
        )
    )
    return entries.withColumns(
        {
            "state": checked,
            "object_type": _map_expr(F.col("type_raw"), TYPE_MAP, "unparsed"),
            "official": F.col("official_raw") == "Oficiāls",
            "is_active": _map_expr(F.col("state_raw"), STATE_MAP) == "exists",
        }
    )


def vdb_stats(typed: DataFrame) -> DataFrame:
    """VdbAnalyzer's overall statistics as (kind, a, n) rows:
    total_entries, per-admin-category totals and active counts, and the
    pronunciation/comment qualifier histograms through the real
    alt-names parser."""
    # three consumers (admin counts, qualifier histogram, total); cache
    # so the upstream dedup/typing lineage executes once
    typed = typed.cache()
    cat = _map_expr(F.col("object_type"), ADMIN_CATEGORY)
    admin = (
        typed.withColumn("cat", cat)
        .filter(F.col("cat").isNotNull())
        .groupBy("cat")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("is_active").cast("long")).alias("active"),
        )
    )
    # both stat kinds from ONE aggregation pass (a per-kind select of the
    # grouped frame would re-execute the aggregate per consumer)
    admin_rows = admin.select(
        F.col("cat").alias("a"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("admin_count").alias("kind"),
                    F.col("total").alias("n"),
                ),
                F.struct(
                    F.lit("admin_active").alias("kind"),
                    F.col("active").alias("n"),
                ),
            )
        ).alias("i"),
    ).select("i.kind", "a", "i.n")
    quals = (
        typed.select(
            F.explode(parse_alt_names_col(F.col("all_names"))).alias("an")
        )
        .select(F.explode("an.qualifiers").alias("q"))
        .groupBy(F.col("q.qtype").alias("kind"), F.col("q.content").alias("a"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = typed.groupBy().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("total_entries").alias("kind"), F.lit("").alias("a"), "n"
    )
    return admin_rows.unionByName(quals).unionByName(total)
