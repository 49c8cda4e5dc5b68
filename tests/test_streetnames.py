"""StreetNameAnalyzer cascade: suffix priority + too-short rule,
known-name list, route full/partial via CleanName (braces, dashes),
law fallback, LVM full/partial, Kuldiga match, unknown."""

from osmalyzer_spark.plans.streetnames import (
    KNOWN_SUFFIXES,
    street_name_check,
)


def _ways(spark, rows):
    return spark.createDataFrame(rows, "id long, tags map<string,string>")


def _routes(spark, rows):
    return spark.createDataFrame(
        rows, "route_id long, route_name string, route_ref string"
    )


def _law(spark, rows):
    return spark.createDataFrame(rows, "law_code string, law_name string")


def test_street_name_cascade(spark):
    hw = {"highway": "residential"}
    ways = _ways(
        spark,
        [
            # suffix group: two variants of 'iela', one 'gatve'
            (1, {**hw, "name": "Ozolu iela"}),
            (2, {**hw, "name": "Ozolu iela"}),
            (3, {**hw, "name": "Liepu iela"}),
            (4, {**hw, "name": "Kastanu gatve"}),
            # all-suffix name is NOT a suffix match -> cascades on
            (5, {**hw, "name": "iela"}),
            # known name
            (6, {**hw, "name": "Vecais tirgus"}),
            # exact route match
            (7, {**hw, "name": "Riga-Liepaja"}),
            # partial route match (braces + spaced ndash clean to equal)
            (8, {**hw, "name": "Riga – Ventspils (apvedcels)"}),
            # law match only
            (9, {**hw, "name": "Valsts celins A7"}),  # 'celins' no suffix
            # LVM partial: two segments, one with the operator
            (10, {**hw, "name": "Meza stiga", "operator": "Latvijas valsts meži"}),
            (11, {**hw, "name": "Meza stiga"}),
            # Kuldiga
            (12, {**hw, "name": "Kuldigas lauki"}),
            # unknown
            (13, {**hw, "name": "Saulespuke"}),
            # filtered out: wrong class / unnamed
            (14, {"highway": "footway", "name": "Taciņa taka"}),
            (15, hw),
        ],
    )
    routes = _routes(
        spark,
        [
            (100, "Riga-Liepaja", "A9"),
            (101, "Riga–Ventspils", "A10"),
        ],
    )
    law = _law(spark, [("A7", "Valsts celins A7 (posms)")])
    out = street_name_check(
        spark,
        ways,
        routes,
        law,
        known_names=["Vecais tirgus"],
        kuldiga_names=["Kuldigas  lauki".replace("  ", " ")],
    ).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r.kind, []).append(r)

    sfx = {r.name: (r.n1, r.n2) for r in by_kind["suffix"]}
    assert len(sfx) == len(KNOWN_SUFFIXES)  # every suffix emits a row
    assert sfx["0:iela"] == (2, 3)  # 2 variants, 3 segments
    assert sfx["1:gatve"] == (1, 1)
    assert sfx["8:taka"] == (0, 0)  # footway filtered out before grouping

    assert [(r.name, r.n1) for r in by_kind["known_name"]] == [("Vecais tirgus", 1)]
    assert [(r.name, r.ref) for r in by_kind["route_full_osm"]] == [
        ("Riga-Liepaja", "A9")
    ]
    assert [(r.name, r.ref) for r in by_kind["route_partial_osm"]] == [
        ("Riga – Ventspils (apvedcels)", "A10")
    ]
    assert [(r.name, r.ref) for r in by_kind["route_partial_law"]] == [
        ("Valsts celins A7", "A7")
    ]
    assert [(r.name, r.n1, r.n2) for r in by_kind["lvm_partial"]] == [
        ("Meza stiga", 1, 2)
    ]
    assert [r.name for r in by_kind["kuldiga"]] == ["Kuldigas lauki"]
    assert sorted(r.name for r in by_kind["unknown"]) == ["Saulespuke", "iela"]
