"""Brute-force sequential oracle replaying the reference Correlator loop.

This is a literal (but independent, numpy/python) re-statement of the
algorithm in /root/reference/Osmalyzer/Correlator/Correlator.cs:110-301,
used only in tests to verify the distributed deferred-acceptance
implementation reaches the same fixed point. Items are processed in
item_id order and candidate scans break distance ties by elem_id — the
deterministic stand-ins for the reference's encounter order (SURVEY §7.3).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

EARTH_R = 6_376_500.0


def haversine(lat1, lon1, lat2, lon2):
    d1 = math.radians(lat1)
    d2 = math.radians(lat2)
    dn = math.radians(lon2) - math.radians(lon1)
    a = math.sin((d2 - d1) / 2) ** 2 + math.cos(d1) * math.cos(d2) * math.sin(dn / 2) ** 2
    return EARTH_R * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))


@dataclass
class OracleResult:
    matched: dict  # elem_id -> (item_id, strength, dist, far)
    unmatched_items: list
    unmatched_elements: list
    lone_elements: list


def correlate_oracle(
    elements: list[dict],
    items: list[dict],
    strength_fn,
    *,
    match_distance=15.0,
    unmatch_distance=75.0,
    good_extra=0.0,
    strong_extra=0.0,
    lone_fn=None,
    lone_strong_strength=None,
):
    seek = max(unmatch_distance, unmatch_distance + good_extra, unmatch_distance + strong_extra)
    allowed_by_strength = {
        1: unmatch_distance,
        2: unmatch_distance + good_extra,
        3: unmatch_distance + strong_extra,
    }

    matched: dict = {}  # elem_id -> dict(item, strength, dist, far)
    unmatchable: list = []
    queue = sorted(items, key=lambda it: it["item_id"])
    while queue:
        current, queue = queue, []
        for item in current:
            cands = []
            for e in elements:
                d = haversine(item["lat"], item["lon"], e["lat"], e["lon"])
                if d > seek:
                    continue
                s = strength_fn(item, e)
                if s <= 0:
                    continue
                if d <= allowed_by_strength[s]:
                    cands.append((d, e["elem_id"], s))
            cands.sort()  # ascending distance, tie elem_id
            claimed = False
            for d, eid, s in cands:
                far = d > match_distance
                prev = matched.get(eid)
                if prev is None:
                    matched[eid] = {"item": item, "strength": s, "dist": d, "far": far}
                    claimed = True
                    break
                if s > prev["strength"] or (s == prev["strength"] and d < prev["dist"]):
                    queue.append(prev["item"])
                    matched[eid] = {"item": item, "strength": s, "dist": d, "far": far}
                    claimed = True
                    break
            if not claimed:
                unmatchable.append(item)

    unmatched_elements = []
    lone_elements = []
    for e in sorted(elements, key=lambda x: x["elem_id"]):
        if e["elem_id"] in matched:
            continue
        if lone_fn is not None and lone_fn(e):
            upgraded = False
            if lone_strong_strength is not None and unmatchable:
                best = None
                for item in unmatchable:
                    s = strength_fn(item, e)
                    if s <= 0 or s < lone_strong_strength:
                        continue
                    d = haversine(item["lat"], item["lon"], e["lat"], e["lon"])
                    key = (-s, d, item["item_id"])
                    if best is None or key < best[0]:
                        best = (key, item, s, d)
                if best is not None:
                    _, item, s, d = best
                    matched[e["elem_id"]] = {
                        "item": item,
                        "strength": s,
                        "dist": d,
                        "far": d > match_distance,
                    }
                    unmatchable.remove(item)
                    upgraded = True
            if not upgraded:
                lone_elements.append(e["elem_id"])
        else:
            unmatched_elements.append(e["elem_id"])

    return OracleResult(
        matched={k: (v["item"]["item_id"], v["strength"], v["dist"], v["far"]) for k, v in matched.items()},
        unmatched_items=sorted(i["item_id"] for i in unmatchable),
        unmatched_elements=sorted(unmatched_elements),
        lone_elements=sorted(lone_elements),
    )
