"""PostCodeAnalyzer semantics over a hand-built micro-fixture: region
formation, syntax validation with the not-in-Latvia skip, office
single/repeat/unused handling, and the 50 km distant check."""

import numpy as np

from osmalyzer_spark.geo.polygon import Polygon
from osmalyzer_spark.plans.postcodes import postcode_check

# simple box around Riga-ish coordinates
_BOX = np.array(
    [(56.0, 23.0), (56.0, 25.0), (58.0, 25.0), (58.0, 23.0)], dtype=float
)
_POLY = Polygon(outers=[_BOX], polygon_id="box")


def _els(spark, rows):
    return spark.createDataFrame(
        list(rows), "id long, tags map<string,string>, lat double, lon double"
    )


def test_postcode_regions_offices_distant(spark):
    rows = []
    # region LV-1010: 11 members near (56.95, 24.1) -> proper region
    for k in range(11):
        rows.append(
            (100 + k, {"addr:postcode": "LV-1010"}, 56.95 + k * 1e-4, 24.10)
        )
    # one distant member of LV-1010 (> 50 km away, still in the box)
    rows.append((150, {"addr:postcode": "LV-1010"}, 57.60, 24.10))
    # region LV-2020: 3 members -> sparse
    for k in range(3):
        rows.append((200 + k, {"addr:postcode": "LV-2020"}, 56.50, 24.50))
    # invalid syntax inside the box, no country -> reported
    rows.append((300, {"addr:postcode": "1234"}, 56.70, 24.00))
    # invalid syntax but explicitly foreign -> silently skipped
    rows.append(
        (301, {"addr:postcode": "EE-123", "addr:country": "EE"}, 56.70, 24.00)
    )
    # invalid syntax outside the polygon -> silently skipped
    rows.append((302, {"addr:postcode": "9999"}, 56.70, 26.50))
    # offices: single for LV-1010; two sharing LV-2020 (repeat group);
    # single with an unused code; one outside the polygon (regular elem)
    rows.append(
        (400, {"amenity": "post_office", "addr:postcode": "LV-1010"}, 56.95, 24.11)
    )
    rows.append(
        (401, {"amenity": "post_office", "addr:postcode": "LV-2020"}, 56.50, 24.51)
    )
    rows.append(
        (402, {"amenity": "post_office", "addr:postcode": "LV-2020"}, 56.51, 24.51)
    )
    rows.append(
        (403, {"amenity": "post_office", "addr:postcode": "LV-3030"}, 56.60, 24.20)
    )
    rows.append(
        (404, {"amenity": "post_office", "addr:postcode": "LV-4040"}, 56.60, 26.90)
    )
    rows.append((405, {"amenity": "post_office"}, 56.60, 24.20))  # no code

    out = postcode_check(_els(spark, rows), _POLY).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r.kind, []).append(r)

    regions = {r.postcode: r for r in by_kind["region"]}
    assert set(regions) == {"LV-1010"}
    assert regions["LV-1010"].n == 12
    sparse = {r.postcode: r.n for r in by_kind["region_sparse"]}
    # office 404 is outside the polygon -> regular element -> region LV-4040
    assert sparse == {"LV-2020": 3, "LV-4040": 1}

    assert {r.elem_id for r in by_kind["invalid_code"]} == {300}
    assert {r.elem_id for r in by_kind["office_no_postcode"]} == {405}
    assert "office_invalid_code" not in by_kind
    assert {r.postcode: r.n for r in by_kind["office_repeat"]} == {"LV-2020": 2}
    assert {r.elem_id for r in by_kind["office_ok"]} == {400, 403}
    assert {r.elem_id for r in by_kind["office_unused_code"]} == {403}
    # LV-2020 has only repeat offices, LV-4040 none -> no single office
    assert {r.postcode for r in by_kind["region_no_office"]} == {
        "LV-2020",
        "LV-4040",
    }
    assert {r.elem_id for r in by_kind["distant"]} == {150}
