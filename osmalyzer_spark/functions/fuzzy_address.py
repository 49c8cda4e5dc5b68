"""Fuzzy freeform-address parsing + distributed geocode join.

Re-expresses the reference's FuzzyAddressParsing project:

- parse_fuzzy_address: the confidence-lattice freeform parser
  (/root/reference/FuzzyAddressParsing/FuzzyAddressParser.cs:11-623):
  comma splits each propose street-line / city / parish / municipality /
  postcode interpretations with Low/High confidence (plus Hinted* tiers
  when the caller supplies per-split hints), then a best-first extraction
  loop (descending confidence, fixed type order) resolves the lattice —
  selecting a part consumes its split, removes its type everywhere, and
  applies the street-line/house-name mutual exclusion and slash-sibling
  rules (FuzzyAddressParser.cs:188-266).
- parse_addresses: Arrow-batched application over a DataFrame
  (mapInPandas; the lattice is branchy per-row Python by nature, so the
  distribution win is the batching + partition parallelism, exactly like
  the reference's per-address loop but horizontally scaled).
- fuzzy_geocode: the distributed form of FuzzyAddressFinder.cs:14-192 —
  candidate generation is an EQUI-join on the minimum-match keys (house
  name, or street+number): the reference's scoring requires one of those
  to match (FuzzyAddressFinder.cs:167-169), so the equi-join generates a
  superset of every scorable candidate without any crossJoin; scoring,
  region-tier preference (parish > city > municipality > unfiltered,
  FuzzyAddressFinder.cs:195-225), old-address fallback, and averaged
  coordinates of tied winners are native expressions.

Vocabulary (KNOWN_*) carries the FULL public place-name tables from
functions/known_names.py (the same Wikipedia sources KnownFuzzyNames.cs
cites in its header: 35 municipalities, 509 distinct parishes, 81 cities,
298 largest towns).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# FuzzyConfidence (FuzzyConfidence.cs)
LOW = 0
HINTED_FALLBACK = 1
HINTED_LOW = 2
HIGH = 3
HINTED_HIGH = 4

# part types, in the reference's extraction order (FuzzyAddressParser.cs:156-181)
HOUSE = "house_name"
STREET = "street"
CITY = "city"
PARISH = "parish"
MUNICIPALITY = "municipality"
POSTCODE = "postcode"
_EXTRACT_ORDER = [HOUSE, STREET, CITY, PARISH, MUNICIPALITY, POSTCODE]

# (nominative, locative) street-name suffixes; first entry is the default
# appended when none is present (KnownFuzzyNames.cs:951-968)
STREET_SUFFIXES = [
    ("iela", "ielā"),
    ("bulvāris", "bulvārī"),
    ("ceļš", "ceļā"),
    ("gatve", "gatvē"),
    ("šoseja", "šosejā"),
    ("tilts", "tiltā"),
    ("dambis", "dambī"),
    ("aleja", "alejā"),
    ("apvedceļš", "apvedceļā"),
    ("laukums", "laukumā"),
    ("prospekts", "prospektā"),
    ("pārvads", "pārvadā"),
    ("līnija", "līnijā"),
    ("šķērslīnija", "šķērslīnijā"),
    ("krastmala", "krastmalā"),
]

from osmalyzer_spark.functions.known_names import (
    CITIES as KNOWN_CITIES,
    MUNICIPALITIES as KNOWN_MUNICIPALITIES,
    PARISHES as KNOWN_PARISHES,
    TOWNS as KNOWN_TOWNS,
)

_city_set = {c.lower() for c in KNOWN_CITIES}
_town_set = {t.lower() for t in KNOWN_TOWNS}
_muni_map = {m.lower(): m for m in KNOWN_MUNICIPALITIES}
_parish_map = {p.lower(): p for p in KNOWN_PARISHES}

_STREET_LINE_RE = re.compile(
    r"^(.+?)\s+(?P<number>\d+(?:/\d+)?)"
    r"(?:\s*(?!(?:k\s*-?\d))(?P<letter>[a-zA-Z]))?"
    r"(?:\s*-(?P<unit>\d+))?"
    r"(?:\s*k-?(?P<block>\d+))?$",
    re.IGNORECASE,
)
_MUNI_RE = re.compile(r"^(?P<name>.+?)\s+nov(?:\.|ads?)$", re.IGNORECASE)
_PARISH_RE = re.compile(r"^(?P<name>.+?)\s+pag(?:\.|asts?)$", re.IGNORECASE)


@dataclass
class Part:
    type: str
    index: int
    confidence: int
    value: str | None = None  # house/city/parish/municipality/postcode
    street: str | None = None  # street parts only
    number: str | None = None
    unit: str | None = None
    siblings: list = field(default_factory=list)
    fallbacks: list = field(default_factory=list)


def _n_letters(s: str) -> int:
    return sum(1 for c in s if c.isalpha())


def _looks_like_parish_or_muni(value: str) -> bool:
    v = value.lower()
    return (
        v.endswith("pagasts") or v.endswith("pag.") or v == "pagasts"
        or v.endswith("novads") or v.endswith("nov.") or v == "novads"
    )


def _looks_like_street_name(name: str) -> bool:
    low = name.lower()
    return any(
        low.endswith(nom) or low.endswith(loc) for nom, loc in STREET_SUFFIXES
    )


def _fix_name(name: str) -> tuple[str, bool]:
    low = name.lower()
    for nom, loc in STREET_SUFFIXES:
        if low.endswith(loc):
            return name[: -len(loc)] + nom, True
        if low.endswith(nom):
            return name, True
    return name + " " + STREET_SUFFIXES[0][0], False


def _fix_number(main: str, letter: str | None, block: str | None) -> str:
    core = main + (letter.strip().upper() if letter and letter.strip() else "")
    if block and block.strip():
        return core + " k-" + block.strip()
    return core


def _try_house_name(value: str, index: int) -> Part | None:
    if _looks_like_parish_or_muni(value) or _looks_like_street_name(value):
        return None
    value = (
        value.replace("“", '"').replace("”", '"')
        .replace("‘", "'").replace("’", "'").strip()
    )
    in_quotes = len(value) >= 2 and value.startswith('"') and value.endswith('"')
    if in_quotes:
        value = value[1:-1].strip()
    if len(value) < 3 or _n_letters(value) < 3:
        return None
    return Part(HOUSE, index, HIGH if in_quotes else LOW, value=value)


def _try_split_street_line(value: str):
    m = _STREET_LINE_RE.match(value)
    if not m:
        return None
    name = m.group(1).strip()
    if len(name) < 3 or _n_letters(name) < 3:
        return None
    fixed, had_suffix = _fix_name(name)
    return (
        fixed,
        m.group("number").strip(),
        m.group("letter"),
        m.group("unit"),
        m.group("block"),
        HIGH if had_suffix else LOW,
    )


def _try_street_name_and_number(split: str, index: int) -> list[Part] | None:
    if "/" in split:
        slash_parts = [p.strip() for p in split.split("/") if p.strip()]
        if len(slash_parts) == 2:
            left = _try_street_line(slash_parts[0], index)
            right = _try_street_line(slash_parts[1], index)
            if left is not None and right is not None:
                for lp in left:
                    for rp in right:
                        lp.siblings.append(rp)
                        rp.siblings.append(lp)
                return left + right
    res = _try_split_street_line(split)
    if res is not None:
        street, number, letter, unit, block, conf = res
        words = [p for p in street.split(" ") if p]
        if any(len(p) >= 3 for p in words):
            return [
                Part(
                    STREET, index, conf,
                    street=street,
                    number=_fix_number(number, letter, block),
                    unit=unit.strip() if unit else None,
                )
            ]
    return None


def _try_street_line(split: str, index: int) -> list[Part] | None:
    if _looks_like_parish_or_muni(split):
        return None
    house = _try_house_name(split, index)
    street = _try_street_name_and_number(split, index)
    if house is None and street is None:
        return None
    results: list[Part] = []
    if house is not None:
        results.append(house)
    if street is not None:
        results.extend(street)
    if house is not None and street is not None and len(street) == 1:
        sp = street[0]
        if sp.type == STREET and house.confidence == sp.confidence:
            house.fallbacks.append(sp)
            sp.fallbacks.append(house)
    return results


def _only_letters(value: str) -> bool:
    return value != "" and all(c.isalpha() or c == " " for c in value)


def _try_city(split: str, index: int) -> Part | None:
    if _looks_like_parish_or_muni(split):
        return None
    low = split.lower()
    if low in _city_set or low in _town_set:
        return Part(CITY, index, HIGH, value=split)
    if _only_letters(split):
        return Part(CITY, index, LOW, value=split)
    return None


def _try_municipality(split: str, index: int) -> Part | None:
    m = _MUNI_RE.match(split)
    if not m:
        return None
    name = m.group("name").strip()
    if len(name) < 4:
        return None
    known = _muni_map.get(name.lower())
    if known is not None:
        return Part(MUNICIPALITY, index, HIGH, value=known + " novads")
    if any(c.isdigit() for c in name):
        return None
    return Part(MUNICIPALITY, index, LOW, value=name + " novads")


def _try_parish(split: str, index: int) -> Part | None:
    m = _PARISH_RE.match(split)
    if not m:
        return None
    name = m.group("name").strip()
    if len(name) < 4:
        return None
    known = _parish_map.get(name.lower())
    if known is not None:
        return Part(PARISH, index, HIGH, value=known + " pagasts")
    if any(c.isdigit() for c in name):
        return None
    return Part(PARISH, index, LOW, value=name + " pagasts")


def _try_postcode(split: str, index: int) -> Part | None:
    if re.fullmatch(r"LV-\d{4}", split):
        return Part(POSTCODE, index, HIGH, value=split)
    cleaned = (
        split.upper().replace("LV ", "LV-").replace(" ", "")
        .replace("–", "-").replace("—", "-")
    )
    if re.fullmatch(r"LV-\d{4}", cleaned):
        return Part(POSTCODE, index, HIGH, value=cleaned)
    if re.fullmatch(r"LV\d{4}", cleaned):
        return Part(POSTCODE, index, HIGH, value=cleaned.replace("LV", "LV-"))
    if re.fullmatch(r"\d{4}", cleaned):
        return Part(POSTCODE, index, LOW, value="LV-" + cleaned)
    return None


def _hinted(conf: int) -> int:
    if conf == HIGH:
        return HINTED_HIGH
    if conf == LOW:
        return HINTED_LOW
    raise ValueError(f"cannot hint confidence {conf}")


_HINT_TYPE = {
    "street_line": None,  # special-cased: covers house name + street
    "postcode": POSTCODE,
    "city": CITY,
    "parish": PARISH,
    "municipality": MUNICIPALITY,
}


def _apply_hint(proposed: list[Part], hint_kind: str, split: str, i: int) -> None:
    """Upgrade parsed parts of the hinted type to Hinted* confidence, or
    add a HintedFallback part when nothing parsed
    (FuzzyAddressParser.cs:59-145)."""
    if hint_kind == "street_line":
        hits = [p for p in proposed if p.type in (HOUSE, STREET)]
        if hits:
            for p in hits:
                p.confidence = _hinted(p.confidence)
        else:
            proposed.append(Part(HOUSE, i, HINTED_FALLBACK, value=split))
        return
    ptype = _HINT_TYPE[hint_kind]
    hit = next((p for p in proposed if p.type == ptype), None)
    if hit is not None:
        hit.confidence = _hinted(hit.confidence)
    else:
        proposed.append(Part(ptype, i, HINTED_FALLBACK, value=split))


def _extract_best(
    proposed: list[list[Part]], ptype: str, min_conf: int
) -> list[Part] | None:
    """FuzzyAddressParser.ExtractBest (FuzzyAddressParser.cs:188-266)."""
    best: Part | None = None
    best_count = 1 << 30
    for parts in proposed:
        part: Part | None = None
        for p in parts:  # first-max == stable OrderByDescending.First()
            if (
                p.type == ptype
                and p.confidence >= min_conf
                and (part is None or p.confidence > part.confidence)
            ):
                part = p
        if part is None:
            continue
        if (
            best is None
            or part.confidence > best.confidence
            or (part.confidence == best.confidence and len(parts) < best_count)
        ):
            best = part
            best_count = len(parts)
    if best is None:
        return None
    for parts in proposed:
        parts[:] = [p for p in parts if p.type != ptype]
    proposed[best.index].clear()
    # house name <-> street+number mutual exclusion
    if best.type == STREET:
        for parts in proposed:
            parts[:] = [p for p in parts if p.type != HOUSE]
    elif best.type == HOUSE:
        for parts in proposed:
            parts[:] = [p for p in parts if p.type != STREET]
    if best.siblings:
        results = [best]
        for sib in best.siblings:
            if sib.type == ptype:
                results.append(sib)
            else:
                try:
                    proposed[sib.index].remove(sib)
                except ValueError:
                    pass
        return results
    return [best]


def parse_fuzzy_address(
    raw: str, hints: dict[int, str] | None = None
) -> list[Part] | None:
    """Parse a freeform address into confidence-scored parts, or None.

    hints: optional {split_index: kind} with kind in
    {street_line, postcode, city, parish, municipality}.
    """
    if raw is None:
        raise TypeError("raw address is None")
    if not raw.strip():
        return None
    splits = [s.strip() for s in raw.split(",")]
    proposed: list[list[Part]] = []
    for i, split in enumerate(splits):
        parts: list[Part] = []
        proposed.append(parts)
        if split == "":
            continue
        street_line = _try_street_line(split, i)
        if street_line is not None:
            parts.extend(street_line)
        for fn in (_try_municipality, _try_parish, _try_city, _try_postcode):
            p = fn(split, i)
            if p is not None:
                parts.append(p)
        if hints and i in hints:
            _apply_hint(parts, hints[i], split, i)
    if all(not p for p in proposed):
        return None
    selected: list[Part] = []
    for min_conf in (HINTED_HIGH, HIGH, HINTED_LOW, HINTED_FALLBACK, LOW):
        if not any(proposed):  # everything consumed — skip remaining probes
            break
        for ptype in _EXTRACT_ORDER:
            got = _extract_best(proposed, ptype, min_conf)
            if got is not None:
                selected.extend(got)
    return selected or None


PARSED_SCHEMA = (
    "addr_id long, part_type string, part_index int, confidence int, "
    "value string, street string, number string, unit string, "
    "is_fallback boolean"
)


def parse_addresses(
    df: DataFrame, id_col: str, addr_col: str
) -> DataFrame:
    """Exploded parsed-parts table, one row per selected part (plus
    is_fallback=true rows for each selected part's fallback alternative,
    so the geocode join can apply the reference's fallback rule)."""

    def run(batches):
        for pdf in batches:
            out = []
            for addr_id, raw in zip(pdf[id_col], pdf[addr_col]):
                parts = parse_fuzzy_address(raw) if raw is not None else None
                if parts is None:
                    continue
                for p in parts:
                    out.append(
                        (addr_id, p.type, p.index, p.confidence,
                         p.value, p.street, p.number, p.unit, False)
                    )
                    for fb in p.fallbacks:
                        out.append(
                            (addr_id, fb.type, fb.index, fb.confidence,
                             fb.value, fb.street, fb.number, fb.unit, True)
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "addr_id", "part_type", "part_index", "confidence",
                    "value", "street", "number", "unit", "is_fallback",
                ],
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), addr_col
    ).mapInPandas(run, schema=PARSED_SCHEMA)


def fuzzy_geocode(parsed: DataFrame, addressables: DataFrame) -> DataFrame:
    """Distributed FuzzyAddressFinder (FuzzyAddressFinder.cs:14-192).

    parsed: output of parse_addresses. addressables: one row per
    addressable element with columns (elem_id, lat, lon, house_name,
    street, number, unit, city, parish, municipality, postcode,
    old_house_name, old_street, old_number, old_unit) — nulls allowed.

    Returns (addr_id, lat, lon, score, n_tied): the averaged coordinate
    of the best-scoring candidates per address, preferring candidates in
    the address's single high-confidence parish, then city, then
    municipality tier (FuzzyAddressFinder.cs:195-225).

    Scale: candidates come ONLY from equi-joins on lower(house_name) and
    (lower(street), lower(number)) — the scoring minimum requires one of
    those to match, so this generates a superset of every scorable pair
    with no crossJoin; the parsed side of each join is small per address.
    """
    # pivot parsed parts to per-address arrays (lower-cased for matching)
    low = F.lower
    agg = parsed.groupBy("addr_id").agg(
        F.collect_list(
            F.when(
                (F.col("part_type") == HOUSE) & ~F.col("is_fallback"),
                low("value"),
            )
        ).alias("house_names"),
        F.collect_list(
            F.when(
                (F.col("part_type") == HOUSE) & F.col("is_fallback"), low("value")
            )
        ).alias("fb_house_names"),
        F.collect_list(
            F.when(
                (F.col("part_type") == STREET) & ~F.col("is_fallback"),
                F.struct(low("street").alias("s"), low("number").alias("n"),
                         low("unit").alias("u")),
            )
        ).alias("streets"),
        F.collect_list(
            F.when(
                (F.col("part_type") == STREET) & F.col("is_fallback"),
                F.struct(low("street").alias("s"), low("number").alias("n"),
                         low("unit").alias("u")),
            )
        ).alias("fb_streets"),
        F.collect_list(
            F.when(F.col("part_type") == CITY, low("value"))
        ).alias("cities"),
        F.collect_list(
            F.when(F.col("part_type") == PARISH, low("value"))
        ).alias("parishes"),
        F.collect_list(
            F.when(F.col("part_type") == MUNICIPALITY, low("value"))
        ).alias("municipalities"),
        F.collect_list(
            F.when(F.col("part_type") == POSTCODE, low("value"))
        ).alias("postcodes"),
        # single high-confidence region parts for tier preference
        F.min(
            F.when(
                (F.col("part_type") == PARISH) & (F.col("confidence") >= HIGH),
                low("value"),
            )
        ).alias("single_parish"),
        F.sum((F.col("part_type") == PARISH).cast("int")).alias("n_parish"),
        F.min(
            F.when(
                (F.col("part_type") == CITY) & (F.col("confidence") >= HIGH),
                low("value"),
            )
        ).alias("single_city"),
        F.sum((F.col("part_type") == CITY).cast("int")).alias("n_city"),
        F.min(
            F.when(
                (F.col("part_type") == MUNICIPALITY)
                & (F.col("confidence") >= HIGH),
                low("value"),
            )
        ).alias("single_muni"),
        F.sum((F.col("part_type") == MUNICIPALITY).cast("int")).alias("n_muni"),
    )

    # candidate generation: equi-join keys = the minimum-match fields
    # (fallback parts included — the fallback rule can promote them)
    keys = parsed.select(
        "addr_id",
        F.when(F.col("part_type") == HOUSE, low("value")).alias("k_house"),
        F.when(F.col("part_type") == STREET, low("street")).alias("k_street"),
    )
    house_keys = keys.filter(F.col("k_house").isNotNull()).select(
        "addr_id", F.col("k_house").alias("key")
    ).distinct()
    street_keys = keys.filter(F.col("k_street").isNotNull()).select(
        "addr_id", F.col("k_street").alias("key")
    ).distinct()
    a = addressables
    # both the current and the old_addr values are joinable keys — the
    # old-address rule can score either
    a_house = a.select(
        "elem_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.array(low("house_name"), low("old_house_name")),
                    lambda x: x.isNotNull(),
                )
            )
        ).alias("key"),
    )
    a_street = a.select(
        "elem_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.array(low("street"), low("old_street")),
                    lambda x: x.isNotNull(),
                )
            )
        ).alias("key"),
    )
    cand_ids = (
        house_keys.join(a_house, "key")
        .select("addr_id", "elem_id")
        .unionByName(street_keys.join(a_street, "key").select("addr_id", "elem_id"))
        .dropDuplicates(["addr_id", "elem_id"])
    )
    cand = cand_ids.join(a, "elem_id")

    p = cand.join(agg, "addr_id")

    def in_arr(arr: str, val) -> F.Column:
        return F.when(
            val.isNull(), F.lit(False)
        ).otherwise(F.array_contains(F.col(arr), low(val)))

    def street_field_match(arr: str, fld: str, val) -> F.Column:
        return F.when(val.isNull(), F.lit(False)).otherwise(
            F.exists(F.col(arr), lambda s: s[fld] == low(val))
        )

    hn = in_arr("house_names", F.col("house_name"))
    st = street_field_match("streets", "s", F.col("street"))
    num = street_field_match("streets", "n", F.col("number"))
    unit = street_field_match("streets", "u", F.col("unit"))
    city = in_arr("cities", F.col("city"))
    parish = in_arr("parishes", F.col("parish"))
    muni = in_arr("municipalities", F.col("municipality"))
    postc = in_arr("postcodes", F.col("postcode"))

    # fallback rule (FuzzyAddressFinder.cs:74-88)
    fb_hn = in_arr("fb_house_names", F.col("house_name"))
    fb_st = street_field_match("fb_streets", "s", F.col("street"))
    fb_num = street_field_match("fb_streets", "n", F.col("number"))
    none_main = ~st & ~num & ~hn
    hn = hn | (none_main & fb_hn)
    st = st | (none_main & fb_st)
    num = num | (none_main & fb_num)

    # old-address fallback (FuzzyAddressFinder.cs:92-133)
    old_hn = in_arr("house_names", F.col("old_house_name"))
    old_st = street_field_match("streets", "s", F.col("old_street"))
    old_num = street_field_match("streets", "n", F.col("old_number"))
    old_unit = street_field_match("streets", "u", F.col("old_unit"))
    incomplete = ~st | ~num | ~hn
    hn2 = F.when(incomplete & old_hn, F.lit(True)).otherwise(hn)
    st2 = F.when(incomplete & old_st, F.lit(True)).otherwise(st)
    num2 = F.when(incomplete & old_num, F.lit(True)).otherwise(num)
    unit2 = F.when(incomplete & old_unit, F.lit(True)).otherwise(unit)
    n_old = (
        old_hn.cast("int") + old_st.cast("int")
        + old_num.cast("int") + old_unit.cast("int")
    )
    n_cur = (
        hn2.cast("int") + st2.cast("int") + num2.cast("int") + unit2.cast("int")
    )
    is_old = incomplete & (n_old >= n_cur) & (n_old > 0)

    street_line_ok = hn2 | (st2 & num2)
    min_ok = street_line_ok & (city | parish | postc)
    score = (
        F.when(hn2, F.when(is_old, 10).otherwise(20)).otherwise(0)
        + F.when(st2, F.when(is_old, 5).otherwise(10)).otherwise(0)
        + F.when(num2, F.when(is_old, 5).otherwise(10)).otherwise(0)
        + F.when(unit2, 2).otherwise(0)
        + F.when(city, 5).otherwise(0)
        + F.when(parish, 5).otherwise(0)
        + F.when(muni, 5).otherwise(0)
        + F.when(postc, 5).otherwise(0)
    )

    tier = (
        F.when(
            (F.col("n_parish") == 1)
            & F.col("single_parish").isNotNull()
            & (low(F.col("parish")) == F.col("single_parish")),
            F.lit(0),
        )
        .when(
            (F.col("n_city") == 1)
            & F.col("single_city").isNotNull()
            & (low(F.col("city")) == F.col("single_city")),
            F.lit(1),
        )
        .when(
            (F.col("n_muni") == 1)
            & F.col("single_muni").isNotNull()
            & (low(F.col("municipality")) == F.col("single_muni")),
            F.lit(2),
        )
        .otherwise(F.lit(3))
    )

    scored = p.filter(min_ok).select(
        "addr_id", "elem_id", "lat", "lon",
        score.alias("score"), tier.alias("tier"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("addr_id").orderBy(
        F.col("tier").asc(), F.col("score").desc()
    )
    best = scored.withColumn(
        "best_tier", F.first("tier").over(w)
    ).withColumn("best_score", F.first("score").over(w))
    winners = best.filter(
        (F.col("tier") == F.col("best_tier"))
        & (F.col("score") == F.col("best_score"))
    )
    return winners.groupBy("addr_id").agg(
        F.avg("lat").alias("lat"),
        F.avg("lon").alias("lon"),
        F.max("score").alias("score"),
        F.count(F.lit(1)).alias("n_tied"),
    )
