"""Name matching / canonicalization — native regexp chains.

Spark equivalents of the reference's string surface (SURVEY §2.8):
- FuzzyNameMatcher.Matches: lowercase/trim bidirectional containment
  (Osmalyzer/Helpers/FuzzyNameMatcher.cs:17-30)
- brand substring matching (Osmalyzer/Analyzers/Shops/ShopAnalyzer.cs:47-67)
- GTFS stop-name canonicalization: lowercase, space collapse, trailing
  paren/bracket strip, quote strip, punctuation spacing
  (Public Transport/PublicTransportAnalyzer.cs:791-830 CleanName)
- abbreviation ("E.Smiļģa" vs "Eduarda Smiļģa") and dual-name ("A/B")
  equivalences (PublicTransportAnalyzer.cs:836-862)

The reference memoizes CleanName per string
(PublicTransportAnalyzerBase.cs:5); under Arrow/codegen vectorization the
cache is unnecessary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def fuzzy_name_match(a, b) -> Column:
    """Bidirectional case-insensitive containment after trim."""
    la = F.lower(F.trim(_c(a)))
    lb = F.lower(F.trim(_c(b)))
    return la.contains(lb) | lb.contains(la)


def brand_name_match(name, brand_variants: list[str]) -> Column:
    """Case-insensitive substring match against any brand variant
    (ShopAnalyzer's name/operator/brand matching)."""
    low = F.lower(F.coalesce(_c(name), F.lit("")))
    out = F.lit(False)
    for v in brand_variants:
        out = out | low.contains(v.lower())
    return out


def clean_stop_name(name) -> Column:
    """The GTFS/OSM stop-name canonicalization pipeline, as one native
    regexp_replace chain (semantics of CleanName,
    PublicTransportAnalyzer.cs:795-830)."""
    c = F.lower(_c(name))
    c = F.regexp_replace(c, r"\s{2,}", " ")  # collapse runs of spaces
    c = F.regexp_replace(c, r" \([^\(\)]+\)$", "")  # trailing (...)
    c = F.regexp_replace(c, r" \[[^\[\]]+\]$", "")  # trailing [...]
    c = F.regexp_replace(c, '"', "")  # quote soup
    c = F.regexp_replace(c, r"(?<! )([\./-])", " $1")  # space before ./-
    c = F.regexp_replace(c, r"([\./-])(?! )", "$1 ")  # space after ./-
    return c


def stop_names_match(pt_name, osm_name) -> Column:
    """Full stop-name equivalence (IsStopNameMatchGoodEnough,
    PublicTransportAnalyzer.cs:758-866): raw equality, cleaned equality,
    abbreviation expansion, or dual-name split."""
    pt_raw, osm_raw = _c(pt_name), _c(osm_name)
    pt, osm = clean_stop_name(pt_raw), clean_stop_name(osm_raw)

    # abbreviation: "e. smiļģa iela" vs "eduarda smiļģa iela"
    dot_parts = F.split(pt, r"\.")
    abbrev_ok = (
        pt.contains(".")
        & ~osm.contains(".")
        & (F.size(dot_parts) == 2)
        & osm.startswith(F.rtrim(dot_parts[0]))
        & osm.endswith(F.ltrim(dot_parts[1]))
    )
    # dual name: "a/b" matches "a" or "b"
    slash_parts = F.split(pt, "/")
    dual_ok = (
        pt.contains("/")
        & (F.size(slash_parts) == 2)
        & ((osm == F.rtrim(slash_parts[0])) | (osm == F.ltrim(slash_parts[1])))
    )
    return (pt_raw == osm_raw) | (pt == osm) | abbrev_ok | dual_ok
