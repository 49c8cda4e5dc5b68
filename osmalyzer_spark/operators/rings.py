"""Ring assembly (A7): per-relation geometry construction as grouped-map
Arrow UDF.

Distributed equivalent of the reference's multipolygon assembly
(Core/Helpers/OsmAlgorithms.cs:12-108 SortWays/CollectNodes +
GroupConnectedWays; Core/Primitives/OsmRelation.cs:68-196), preserving its
semantics exactly:

- ways chain through shared terminal nodes; a terminal appearing in more
  than two ways is invalid geometry -> null result (we emit valid=false);
- node collection walks each sorted way, reversing when its first node
  does not continue the chain, dropping the repeated junction node;
- a relation's ways first split into connected components (one ring each).

This is genuinely per-group imperative logic, so it is the one place the
engine uses applyInPandas; groups are single relations (tiny), so the
Arrow batches stay small regardless of total relation count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "relation_id long, ring_index int, valid boolean, "
    "ring_node_ids array<long>, ring_lats array<double>, ring_lons array<double>"
)


def _group_connected(ways: list[dict]) -> list[list[dict]]:
    """Connected components of ways sharing terminal nodes
    (OsmAlgorithms.GroupConnectedWays semantics)."""
    parent = {i: i for i in range(len(ways))}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_terminal: dict = {}
    for i, w in enumerate(ways):
        for t in (w["nodes"][0][0], w["nodes"][-1][0]):
            by_terminal.setdefault(t, []).append(i)
    for members in by_terminal.values():
        for j in members[1:]:
            parent[find(j)] = find(members[0])
    groups: dict = {}
    for i in range(len(ways)):
        groups.setdefault(find(i), []).append(ways[i])
    return list(groups.values())


def _sort_ways(ways: list[dict]):
    """SortWays (OsmAlgorithms.cs:12-75): order ways into a closed chain;
    None on invalid geometry (terminal in >2 ways, broken chain)."""
    nodes1: dict = {}
    nodes2: dict = {}
    for w in ways:
        if len(w["nodes"]) < 2:
            return None
        for t in (w["nodes"][0][0], w["nodes"][-1][0]):
            if t not in nodes1:
                nodes1[t] = w
            elif t not in nodes2:
                nodes2[t] = w
            else:
                return None
    sorted_ways = [ways[0]]
    way = ways[0]
    node = way["nodes"][0][0]
    for _ in range(len(ways) - 1):
        first, last = way["nodes"][0][0], way["nodes"][-1][0]
        node = last if node == first else first
        w1 = nodes1.get(node)
        w2 = nodes2.get(node)
        if w1 is None or w2 is None:
            return None
        way = w2 if way is w1 else w1
        sorted_ways.append(way)
    return sorted_ways


def _collect_nodes(sorted_ways: list[dict]) -> list[tuple]:
    """CollectNodes (OsmAlgorithms.cs:80-108): walk sorted ways, reversing
    where needed, excluding each way's trailing junction node."""
    out: list[tuple] = []
    last_node = None
    for w in sorted_ways:
        nodes = w["nodes"]
        reverse = last_node is not None and last_node != nodes[0][0]
        if not reverse:
            out.extend(nodes[:-1])
            last_node = nodes[-1][0]
        else:
            out.extend(reversed(nodes[1:]))
            last_node = nodes[0][0]
    return out


def assemble_rings(way_members: DataFrame) -> DataFrame:
    """Input: one row per relation member way —
    (relation_id long, way_id long,
     nodes array<struct<node_id long, lat double, lon double>>).
    Output: one row per assembled ring (OUT_SCHEMA); invalid geometry
    yields a single valid=false row for the relation (the reference's
    null-return invariant)."""

    def per_relation(pdf: pd.DataFrame) -> pd.DataFrame:
        rel_id = int(pdf["relation_id"].iloc[0])
        ways = [
            {"way_id": int(r.way_id), "nodes": [(int(n["node_id"]), float(n["lat"]), float(n["lon"])) for n in r.nodes]}
            for r in pdf.itertuples()
        ]
        rows = []
        for ring_idx, group in enumerate(_group_connected(ways)):
            sorted_ways = _sort_ways(group)
            if sorted_ways is None:
                rows.append((rel_id, ring_idx, False, [], [], []))
                continue
            nodes = _collect_nodes(sorted_ways)
            rows.append(
                (
                    rel_id,
                    ring_idx,
                    True,
                    [n[0] for n in nodes],
                    [n[1] for n in nodes],
                    [n[2] for n in nodes],
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "relation_id", "ring_index", "valid",
                "ring_node_ids", "ring_lats", "ring_lons",
            ],
        )

    return way_members.groupBy("relation_id").applyInPandas(per_relation, OUT_SCHEMA)
