"""Transliteration validator: expected-vs-actual `name:xx` checking.

Spark-first equivalent of the reference's ImproperTranslationAnalyzer
(Osmalyzer/Analyzers/Validation/ImproperTranslationAnalyzer.cs):

* nomenclature extraction — the FIRST qualifier (public-table file order)
  that the `name` ends with, as a native `when`-chain
  (ImproperTranslationAnalyzer.cs:382-398 ExtractNomenclature);
* expected-name construction — the LV→RU transliteration cascade plus the
  qualifier's translated prefixes in both word orders, with the
  `'Imantas 1. līnija' -> 'Имантас 1-я линия'` digit special case
  (ImproperTranslationAnalyzer.cs:243-276);
* classification — lowercase equality → `exact`; reference-weighted
  Levenshtein distance ≤ 0.5 → `good_enough`; else `mismatch`
  (ImproperTranslationAnalyzer.cs:336-379,399-425 + the
  CyrillicNameMatcher 0.5-cost confusable pairs at :568-596).

Everything except the fuzzy distance is native Column algebra; the fuzzy
DP runs as an Arrow-batched pandas UDF over ONLY the rows that failed the
native exact test (the rare path on real data).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from osmalyzer_spark.functions.tags import get_value
from osmalyzer_spark.functions.translit import (
    QUALIFIER_TABLE,
    transliterate_lv_en,
    transliterate_lv_ru,
)

# CyrillicNameMatcher.Cost (ImproperTranslationAnalyzer.cs:575-595):
# substitutions between confusable cyrillic letters cost 0.5 either
# direction; everything else 1.0. Insert/delete cost 1.0 (F23
# WeightedLevenshtein defaults).
CHEAP_PAIRS: frozenset[frozenset[str]] = frozenset(
    frozenset(p)
    for p in [("е", "э"), ("е", "ё"), ("и", "й"), ("ш", "щ"), ("х", "г"), ("а", "я"), ("и", "ы")]
)


def weighted_levenshtein(a: str, b: str) -> float:
    """Reference WeightedLevenshtein with CyrillicNameMatcher costs, on
    already-lowercased strings (the analyzer lowercases before matching,
    ImproperTranslationAnalyzer.cs:406-409)."""
    n, m = len(a), len(b)
    if n == 0:
        return float(m)
    if m == 0:
        return float(n)
    prev = [float(j) for j in range(m + 1)]
    cur = [0.0] * (m + 1)
    for i in range(1, n + 1):
        cur[0] = float(i)
        ca = a[i - 1]
        for j in range(1, m + 1):
            cb = b[j - 1]
            if ca == cb:
                sub = 0.0
            elif frozenset((ca, cb)) in CHEAP_PAIRS:
                sub = 0.5
            else:
                sub = 1.0
            cur[j] = min(prev[j] + 1.0, cur[j - 1] + 1.0, prev[j - 1] + sub)
        prev, cur = cur, prev
    return prev[m]


_FUZZY_SCHEMA = StructType(
    [StructField("best", StringType()), StructField("verdict", StringType())]
)


@pandas_udf(_FUZZY_SCHEMA)
def _fuzzy_classify(actual: pd.Series, expected: pd.Series) -> pd.DataFrame:
    """For rows that are not an exact match: first expected candidate (list
    order, mirroring the stable OrderByDescending tie-break at
    ImproperTranslationAnalyzer.cs:346-348) within distance 0.5 wins as
    good_enough; otherwise mismatch against expected[0]."""
    best, verdict = [], []
    for act, exps in zip(actual, expected):
        exps = list(exps) if exps is not None else []
        if not exps:
            best.append(None)
            verdict.append("mismatch")
            continue
        act_l = (act or "").lower()
        hit = None
        for e in exps:
            if weighted_levenshtein(act_l, e.lower()) <= 0.5:
                hit = e
                break
        if hit is not None:
            best.append(hit)
            verdict.append("good_enough")
        else:
            best.append(exps[0])
            verdict.append("mismatch")
    return pd.DataFrame({"best": best, "verdict": verdict})


def _first_suffix_qualifier(name: Column) -> Column:
    """ExtractNomenclature: first table-order qualifier such that the name
    ends with ' ' + qualifier (ImproperTranslationAnalyzer.cs:382-398)."""
    expr = None
    for lv, _ru, _en in QUALIFIER_TABLE:
        cond = name.endswith(" " + lv)
        expr = F.when(cond, F.lit(lv)) if expr is None else expr.when(cond, F.lit(lv))
    return expr


def _prefixes_for(qual: Column, lang: str) -> Column:
    idx = 1 if lang == "ru" else 2
    expr = None
    for row in QUALIFIER_TABLE:
        arr = F.array(*[F.lit(x) for x in row[idx]])
        cond = qual == row[0]
        expr = F.when(cond, arr) if expr is None else expr.when(cond, arr)
    return expr


def check_translations(
    elements: DataFrame,
    lang: str = "ru",
    nomenclature_required: bool = True,
) -> DataFrame:
    """Validate `name:<lang>` tags against the transliterated `name`.

    Input: elements with `elem_id` and `tags` (map) carrying `name` and
    `name:<lang>`. Output: one row per checked element —
    (elem_id, name, actual, expected, verdict) with verdict in
    {exact, good_enough, mismatch, ignored}. `ignored` mirrors the
    reference's ignoredNames list (nomenclature required but absent,
    ImproperTranslationAnalyzer.cs:199-206); its expected is ''.
    """
    name = get_value("tags", "name")
    actual = get_value("tags", f"name:{lang}")
    df = (
        elements.filter(name.isNotNull() & actual.isNotNull())
        .select("elem_id", name.alias("name"), actual.alias("actual"))
        .withColumn("qual", _first_suffix_qualifier(F.col("name")))
    )

    raw = F.trim(
        F.expr("substring(name, 1, length(name) - length(qual))")
    )
    df = df.withColumn("raw", F.when(F.col("qual").isNotNull(), raw).otherwise(F.col("name")))

    if lang == "ru":
        translit = transliterate_lv_ru("raw")
    elif lang == "en":
        translit = transliterate_lv_en("raw")
    else:  # lv: expected is the name itself, exact-only
        translit = F.col("name")
    df = df.withColumn("translit", translit)

    prefixes = _prefixes_for(F.col("qual"), lang) if lang in ("ru", "en") else F.array()
    df = df.withColumn("prefixes", prefixes)

    t = F.col("translit")
    if lang == "ru":
        digit_forms = F.flatten(
            F.transform(
                F.col("prefixes"),
                lambda p: F.array(
                    F.concat(t, F.lit("-я "), p), F.concat(t, F.lit("-й "), p)
                ),
            )
        )
        word_forms = F.flatten(
            F.transform(
                F.col("prefixes"),
                lambda p: F.array(
                    F.concat(p, F.lit(" "), t), F.concat(t, F.lit(" "), p)
                ),
            )
        )
        with_qual = F.when(t.rlike(r"\d\s*$"), digit_forms).otherwise(word_forms)
    elif lang == "en":
        # reference en path: translit + " " + prefix only
        # (ImproperTranslationAnalyzer.cs:283-301)
        with_qual = F.transform(F.col("prefixes"), lambda p: F.concat(t, F.lit(" "), p))
    else:
        with_qual = F.array(t)
    expected = F.when(F.col("qual").isNotNull(), with_qual).otherwise(F.array(t))
    df = df.withColumn("expected", expected)

    ignored = F.col("qual").isNull() & F.lit(nomenclature_required)
    exact_hits = F.filter(
        F.col("expected"), lambda e: F.lower(e) == F.lower(F.col("actual"))
    )
    df = df.withColumn("exact_hit", F.get(exact_hits, 0))

    # fuzzy distance (the UDF) only where the native exact test failed and
    # the row is actually checked; 'lv' and 'en' are exact-only matchers
    # in the reference (MatchBetweenExact), so skip the fuzzy pass there.
    # Spark extracts Python UDFs into an unconditional ArrowEvalPython
    # stage (a when() around the RESULT doesn't gate evaluation), so the
    # gating is applied to the INPUTS: exact/ignored rows ship nulls
    # through Arrow and take the UDF's O(1) null path — both transfer
    # volume and DP work scale with the mismatch count, not the table.
    if lang == "ru":
        gate = F.col("exact_hit").isNull() & ~ignored
        fuzzy = _fuzzy_classify(
            F.when(gate, F.col("actual")), F.when(gate, F.col("expected"))
        )
        df = df.withColumn("fuzzy", F.when(gate, fuzzy))
        fuzzy_best = F.col("fuzzy.best")
        fuzzy_verdict = F.col("fuzzy.verdict")
    else:
        fuzzy_best = F.get(F.col("expected"), 0)
        fuzzy_verdict = F.lit("mismatch")

    verdict = (
        F.when(ignored, F.lit("ignored"))
        .when(F.col("exact_hit").isNotNull(), F.lit("exact"))
        .otherwise(fuzzy_verdict)
    )
    best = (
        F.when(ignored, F.lit(""))
        .when(F.col("exact_hit").isNotNull(), F.col("exact_hit"))
        .otherwise(F.coalesce(fuzzy_best, F.lit("")))
    )
    return df.select(
        "elem_id",
        "name",
        "actual",
        best.alias("expected"),
        verdict.alias("verdict"),
    )
