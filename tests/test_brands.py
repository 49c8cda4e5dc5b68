"""CommonBrandsAnalyzer semantics: title pick order, diacritic
cleaning, variation-list grouping, threshold, generic flag, NSI value
counts, and the reportable low-frequency rule."""

from osmalyzer_spark.plans.brands import common_brands


def _els(spark, rows):
    return spark.createDataFrame(rows, "id long, tags map<string,string>")


def test_common_brands(spark):
    rows = []
    nid = 0

    def add(n, tags):
        nonlocal nid
        for _ in range(n):
            nid += 1
            rows.append((nid, tags))

    # canon 'kb:0' (maxima family): 12 'Maxima', 4 'Maksima ', 2 'MAXIMA'
    add(12, {"brand": "Maxima", "shop": "supermarket"})
    add(4, {"name": "Maksima ", "shop": "supermarket"})  # title falls to name
    add(2, {"brand": "MAXIMA", "shop": "convenience"})
    # canon 'rimi': 11 identical -> plain single-variant group
    add(11, {"brand": "Rimi", "shop": "supermarket"})
    # generic 'Veikals' incl. diacritic-folded variant: 7 + 5 >= 10
    add(7, {"name": "Veikals", "shop": "supermarket"})
    add(5, {"name": "Veikāls", "shop": "supermarket"})
    # below threshold
    add(9, {"brand": "Mego", "shop": "supermarket"})
    # different NSI entry (bakery) — separate group even for same title
    add(10, {"brand": "Maxima", "shop": "bakery"})
    # brand beats name in the title pick
    add(1, {"brand": "Maxima", "name": "Cits", "shop": "convenience"})
    # no title tags -> excluded entirely
    add(30, {"shop": "supermarket"})

    out = common_brands(
        _els(spark, rows),
        nsi_entries=[("shop", ["supermarket", "convenience"]), ("shop", ["bakery"])],
        known_brands=[["maxima", "maksima"]],
        generic_names=["veikals"],
    ).collect()
    by = {}
    for r in out:
        by.setdefault((r.kind, r.nsi_idx, r.canon), []).append(r)

    g_max = by[("group", 0, "kb:0")][0]
    assert g_max.n1 == 19 and g_max.n2 == 3 and g_max.value == "issue"
    g_rimi = by[("group", 0, "rimi")][0]
    assert g_rimi.n1 == 11 and g_rimi.n2 == 1 and g_rimi.value == "plain"
    g_gen = by[("group", 0, "veikals")][0]
    assert g_gen.n1 == 12 and g_gen.value == "generic-issue"
    g_bak = by[("group", 1, "kb:0")][0]
    assert g_bak.n1 == 10 and g_bak.value == "plain"
    assert ("group", 0, "mego") not in by  # under threshold

    vmax = {r.value: r.n1 for r in by[("variant", 0, "kb:0")]}
    assert vmax == {"Maxima": 13, "Maksima ": 4, "MAXIMA": 2}
    nsiv = {r.value: r.n1 for r in by[("nsi_value", 0, "kb:0")]}
    assert nsiv == {"supermarket": 16, "convenience": 3}
    # reportable: count < 10 AND count <= floor(max/2)=6 -> both small ones
    rep = {r.value: r.n1 for r in by[("reportable", 0, "kb:0")]}
    assert rep == {"Maksima ": 4, "MAXIMA": 2}
    # generic group emits no reportable rows
    assert ("reportable", 0, "veikals") not in by


def test_element_in_multiple_nsi_entries(spark):
    # an element carrying BOTH a listed shop and a listed amenity repeats
    # in each NSI group (CommonBrandsAnalyzer.cs:95-101) — the one-scan
    # mapping join must instance it once per matching entry
    rows = [
        (i, {"brand": "Circle K", "shop": "convenience", "amenity": "fuel"})
        for i in range(1, 13)
    ]
    out = common_brands(
        _els(spark, rows),
        nsi_entries=[("shop", ["convenience"]), ("amenity", ["fuel"])],
        known_brands=[],
        generic_names=[],
    ).collect()
    groups = {
        (r.nsi_idx, r.canon): r.n1 for r in out if r.kind == "group"
    }
    assert groups == {(0, "circle k"): 12, (1, "circle k"): 12}
