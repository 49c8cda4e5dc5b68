"""Overpass QL generation from tag filter rules.

Reference: /root/reference/Osmalyzer/Overpass Query Maker/
(OverpassQuery.cs:1-58 + Rules/): a rule list renders to an
overpass-turbo link for the user to eyeball the same selection the
analyzer ran. Spark-first addition: the SAME rules also compile to a
Column predicate over the engine's `tags` map column, so one rule set
drives both the DataFrame filter and the exported Overpass query —
they cannot drift apart.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import quote_plus

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class HasKey:
    key: str

    def ql(self) -> str:
        return f'["{self.key}"]'

    def expr(self, tags) -> Column:
        return F.map_contains_key(_c(tags), F.lit(self.key))


@dataclass(frozen=True)
class HasValue:
    key: str
    value: str

    def ql(self) -> str:
        return f'["{self.key}"="{self.value}"]'

    def expr(self, tags) -> Column:
        return _c(tags)[self.key] == self.value


@dataclass(frozen=True)
class DoesNotHaveKey:
    key: str

    def ql(self) -> str:
        return f'[!"{self.key}"]'

    def expr(self, tags) -> Column:
        return ~F.map_contains_key(_c(tags), F.lit(self.key))


@dataclass(frozen=True)
class DoesNotHaveValue:
    key: str
    value: str

    def ql(self) -> str:
        return f'["{self.key}"!="{self.value}"]'

    def expr(self, tags) -> Column:
        # Overpass [k!=v] also matches elements missing k entirely
        v = _c(tags)[self.key]
        return v.isNull() | (v != self.value)


def _c(tags) -> Column:
    return tags if isinstance(tags, Column) else F.col(tags)


def overpass_query(rules, area: str = "Latvia") -> str:
    """The Overpass QL text (OverpassQuery.GetQueryLink body)."""
    body = "".join(r.ql() for r in rules)
    return (
        "[out:json][timeout:25];\n"
        f"{{{{geocodeArea:{area}}}}}->.searchArea;\n"
        f"nwr{body}(area.searchArea);\n"
        "out geom;\n"
    )


def overpass_link(rules, area: str = "Latvia") -> str:
    return "https://overpass-turbo.eu/?Q=" + quote_plus(overpass_query(rules, area))


def rules_filter(rules, tags="tags") -> Column:
    """Conjunction of the rules as a predicate over the tags map column —
    the exact element set the generated Overpass query would select."""
    out = F.lit(True)
    for r in rules:
        out = out & r.expr(tags)
    return out
