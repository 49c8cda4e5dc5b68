"""Tag predicates and projections over the open-schema tags map.

Spark equivalents of the reference's OsmFilter family
(Core/Filters/*.cs — HasKey, HasValue, SplitValuesCheck, type filters)
and tag projections (Core/Primitives/OsmElement.cs:136-169,
Core/Helpers/TagUtils.cs). All native expressions — these sit under every
analyzer's scan, so they must stay inside whole-stage codegen and push
down through Catalyst.

The tags column is map<string,string>; null map == untagged element.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# --- key predicates (HasKey.cs, HasAnyKey.cs, HasKeyPrefixed.cs) ----------

def has_key(tags, key: str) -> Column:
    return F.coalesce(F.map_contains_key(_c(tags), F.lit(key)), F.lit(False))


def has_any_key(tags, keys: list[str]) -> Column:
    return F.exists(F.map_keys(_c(tags)), lambda k: k.isin(keys))


def has_key_prefixed(tags, prefix: str) -> Column:
    return F.exists(F.map_keys(_c(tags)), lambda k: k.startswith(prefix))


def doesnt_have_key(tags, key: str) -> Column:
    return ~has_key(tags, key)


# --- value predicates (HasValue.cs, HasAnyValue.cs) ------------------------

def has_value(tags, key: str, value: str, case_sensitive: bool = True) -> Column:
    v = F.element_at(_c(tags), F.lit(key))
    if case_sensitive:
        return F.coalesce(v == value, F.lit(False))
    return F.coalesce(F.lower(v) == value.lower(), F.lit(False))


def has_any_value(tags, key: str, values: list[str], case_sensitive: bool = True) -> Column:
    v = F.element_at(_c(tags), F.lit(key))
    if case_sensitive:
        return F.coalesce(v.isin(values), F.lit(False))
    return F.coalesce(F.lower(v).isin([x.lower() for x in values]), F.lit(False))


def doesnt_have_value(tags, key: str, value: str) -> Column:
    return ~has_value(tags, key, value)


def split_values_check(tags, key: str, pred) -> Column:
    """SplitValuesCheck (Core/Filters/SplitValuesCheck.cs:24-44): split the
    `;`-delimited value; ALL trimmed tokens must pass `pred` (a lambda
    Column -> Column)."""
    v = F.element_at(_c(tags), F.lit(key))
    toks = F.transform(F.split(v, ";"), lambda t: F.trim(t))
    return F.coalesce(F.forall(toks, pred), F.lit(False))


# --- type predicates (IsNode.cs etc., IsClosedWay via node_ids) ------------

def is_node(type_col="type") -> Column:
    return _c(type_col) == "node"


def is_way(type_col="type") -> Column:
    return _c(type_col) == "way"


def is_relation(type_col="type") -> Column:
    return _c(type_col) == "relation"


def is_closed_way(type_col="type", node_ids="node_ids") -> Column:
    """Closed way: first node == last node and >= 3 nodes
    (Core/Primitives/OsmWay.cs:19)."""
    ids = _c(node_ids)
    return (
        is_way(type_col)
        & (F.size(ids) >= 3)
        & (ids[0] == F.element_at(ids, -1))
    )


# --- projections (OsmElement.cs:136-169, TagUtils.cs) -----------------------

def get_value(tags, key: str) -> Column:
    return F.element_at(_c(tags), F.lit(key))


def get_delimited_values(tags, key: str) -> Column:
    """`;`-split + trim (TagUtils.cs:8-14)."""
    return F.transform(F.split(get_value(tags, key), ";"), lambda t: F.trim(t))


def get_prefixed_values(tags, prefix: str) -> Column:
    """Sub-map of keys starting with prefix (OsmElement.cs GetPrefixedValues)."""
    return F.map_filter(_c(tags), lambda k, v: k.startswith(prefix))


def values_equal_unordered(a, b) -> Column:
    """Order-insensitive multiset equality of two `;`-delimited values
    (TagUtils.cs:19-47)."""
    norm = lambda c: F.array_sort(  # noqa: E731
        F.transform(F.split(_c(c), ";"), lambda t: F.trim(t))
    )
    return norm(a) == norm(b)


def values_equal_ordered(a, b) -> Column:
    """Order-sensitive variant (TagUtils.cs:52-80)."""
    norm = lambda c: F.transform(F.split(_c(c), ";"), lambda t: F.trim(t))  # noqa: E731
    return norm(a) == norm(b)
