"""CommonBrandsAnalyzer (reference Analyzers/Miscellaneous/
CommonBrandsAnalyzer.cs): most common POI titles per NSI type, with
brand-variation grouping.

Semantics preserved from the reference:
- the POI title is the FIRST present of tags brand, name, operator
  (:21-23); elements with none are out.
- per NSI entry (tag, value-list from the public `NSI tags.tsv`),
  elements carrying any listed value group by title; an element tagged
  with several NSI types repeats in each (:95-101, disclosed in the
  report description).
- titles combine when CleanName matches — trim, lowercase, Latvian
  diacritics folded (:196-215) — or both cleaned titles sit in the
  same `brand variations.tsv` list (BrandsMatch, :217-235). The
  combine is an equivalence on the canonical key: the first
  variation-list containing the cleaned title, else the cleaned title
  itself (FirstOrDefault order preserved).
- groups of >= 10 elements report (:105): a group row (issue when
  multi-variant or generic, plain otherwise, :168-187), one row per
  title variant with its count, one row per distinct NSI-tag value
  with its count (GetUniqueValuesForKey, :131-137), and — for
  non-generic multi-variant groups — the `reportable` low-frequency
  variants with count < 10 and count <= max/2 (C# INTEGER division,
  :146-151).
- generic = any variant's clean equals any cleaned
  `generic poi names.tsv` entry (:109-112).

Spark shape: the NSI config is exploded into a (nsi_idx, tag, value)
mapping and matched with ONE scan — each element emits its candidate
(tag, value) pairs for the config's distinct tags and broadcast-joins
the mapping (the reference's `NSI tags.tsv` has hundreds of entries,
so the naive one-filtered-scan-per-entry shape would re-read the
element table hundreds of times at scale); title cleaning is a native
trim/lower/translate; grouping is two hash aggregations (variant,
then canonical group). No UDFs.

Output: (kind, nsi_idx, canon, value, n1, n2) — kind in {group,
variant, nsi_value, reportable}; group rows carry n1=elements,
n2=variants and value in {generic-issue, issue, plain}.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmalyzer_spark.functions.tags import get_value

TITLE_TAGS = ["brand", "name", "operator"]  # CommonBrandsAnalyzer.cs:21
TITLE_COUNT_THRESHOLD = 10  # :18
_DIACRITICS = ("āčēģīķļņōšūž", "acegiklnosuz")  # :199-212


def clean_name(c: Column) -> Column:
    return F.translate(F.lower(F.trim(c)), _DIACRITICS[0], _DIACRITICS[1])


def _canon(clean: Column, known_brands: list[list[str]]) -> Column:
    """First variation-list containing the cleaned title, else itself."""
    expr = clean
    for i in range(len(known_brands) - 1, -1, -1):
        members = [_py_clean(m) for m in known_brands[i]]
        expr = F.when(clean.isin(members), F.lit(f"kb:{i}")).otherwise(expr)
    return expr


def _py_clean(s: str) -> str:
    s = s.strip().lower()
    return s.translate(str.maketrans(_DIACRITICS[0], _DIACRITICS[1]))


def common_brands(
    elements: DataFrame,
    nsi_entries: list[tuple[str, list[str]]],
    known_brands: list[list[str]],
    generic_names: list[str],
    threshold: int = TITLE_COUNT_THRESHOLD,
) -> DataFrame:
    """elements: (id, tags). nsi_entries / known_brands /
    generic_names: the three public config files as lists."""
    title = F.coalesce(*[get_value("tags", t) for t in TITLE_TAGS])
    spark = elements.sparkSession
    mapping = F.broadcast(
        spark.createDataFrame(
            [
                (idx, tag, value)
                for idx, (tag, values) in enumerate(nsi_entries)
                for value in values
            ],
            "nsi_idx int, __tag string, nsi_value string",
        )
    )
    distinct_tags = sorted({tag for tag, _ in nsi_entries})
    cand = (
        elements.filter(title.isNotNull())
        .select(
            title.alias("title"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("__tag"),
                            get_value("tags", t).alias("nsi_value"),
                        )
                        for t in distinct_tags
                    ]
                )
            ).alias("e"),
        )
        .select("title", "e.__tag", "e.nsi_value")
        .filter(F.col("nsi_value").isNotNull())
    )
    matched = cand.join(mapping, ["__tag", "nsi_value"]).select(
        "nsi_idx", "title", "nsi_value"
    )

    clean = clean_name(F.col("title"))
    matched = matched.withColumn(
        "canon", _canon(clean, known_brands)
    ).withColumn("__clean", clean)

    variants = matched.groupBy("nsi_idx", "canon", "title").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max(
            F.col("__clean").isin([_py_clean(g) for g in generic_names]).cast("int")
        ).alias("__gen"),
    )
    groups = (
        variants.groupBy("nsi_idx", "canon")
        .agg(
            F.sum("cnt").alias("n"),
            F.count(F.lit(1)).alias("n_variants"),
            F.max("cnt").alias("max_cnt"),
            F.max("__gen").alias("generic"),
        )
        .filter(F.col("n") >= threshold)
        .cache()
    )
    gkeys = groups.select("nsi_idx", "canon", "n_variants", "max_cnt", "generic")

    group_rows = groups.select(
        F.lit("group").alias("kind"),
        "nsi_idx",
        "canon",
        F.when(F.col("generic") == 1, F.lit("generic-issue"))
        .when(F.col("n_variants") > 1, F.lit("issue"))
        .otherwise(F.lit("plain"))
        .alias("value"),
        F.col("n").cast("long").alias("n1"),
        F.col("n_variants").cast("long").alias("n2"),
    )
    qvariants = variants.join(gkeys, ["nsi_idx", "canon"])
    variant_rows = qvariants.select(
        F.lit("variant").alias("kind"),
        "nsi_idx",
        "canon",
        F.col("title").alias("value"),
        F.col("cnt").cast("long").alias("n1"),
        F.lit(None).cast("long").alias("n2"),
    )
    nsi_rows = (
        matched.join(gkeys.select("nsi_idx", "canon"), ["nsi_idx", "canon"])
        .groupBy("nsi_idx", "canon", "nsi_value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("nsi_value").alias("kind"),
            "nsi_idx",
            "canon",
            F.col("nsi_value").alias("value"),
            F.col("cnt").cast("long").alias("n1"),
            F.lit(None).cast("long").alias("n2"),
        )
    )
    reportable_rows = qvariants.filter(
        (F.col("generic") == 0)
        & (F.col("n_variants") > 1)
        & (F.col("cnt") < threshold)
        & (F.col("cnt") <= F.floor(F.col("max_cnt") / 2))
    ).select(
        F.lit("reportable").alias("kind"),
        "nsi_idx",
        "canon",
        F.col("title").alias("value"),
        F.col("cnt").cast("long").alias("n1"),
        F.lit(None).cast("long").alias("n2"),
    )
    return (
        group_rows.unionByName(variant_rows)
        .unionByName(nsi_rows)
        .unionByName(reportable_rows)
    )
