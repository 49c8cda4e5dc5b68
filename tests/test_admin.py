"""Administrative group semantics: admin-center self-assignment
preference rules and external-entry assignment with its issue
taxonomy (multiple matches, coordinate mismatch, missing, extra)."""

from osmalyzer_spark.plans.admin import assign_admin_centers, external_assign


def _members(spark, rows):
    return spark.createDataFrame(
        rows, "relation_id long, mtype string, role string, ref long"
    )


def _nodes(spark, rows):
    return spark.createDataFrame(rows, "id long, tags map<string,string>")


def test_assign_admin_centers(spark):
    nodes = _nodes(
        spark,
        [
            (1, {"place": "city"}),
            (2, {"place": "town"}),
            (3, {}),
            (4, {"place": "city"}),
            (5, {}),
        ],
    )
    members = _members(
        spark,
        [
            # r10: one preferred (city) label beats the admin_centre
            (10, "node", "label", 1),
            (10, "node", "admin_centre", 2),
            # r11: two preferred -> nothing, and NO fallback
            (11, "node", "admin_centre", 1),
            (11, "node", "label", 4),
            (11, "node", "admin_centre", 2),
            # r12: no preferred, single admin_centre wins
            (12, "node", "admin_centre", 3),
            (12, "node", "label", 5),
            # r13: no admin_centre, single label wins
            (13, "node", "label", 5),
            # r14: two admin_centres -> nothing (no label fallback)
            (14, "node", "admin_centre", 3),
            (14, "node", "admin_centre", 5),
            (14, "node", "label", 2),
            # r15: way members don't count
            (15, "way", "admin_centre", 3),
        ],
    )
    got = {
        r.relation_id: r.center_id
        for r in assign_admin_centers(
            members, nodes, preferred_tag_value=("place", "city")
        ).collect()
    }
    assert got == {10: 1, 12: 3, 13: 5}


def test_external_assign(spark):
    items = spark.createDataFrame(
        [
            (1, "Alfa", 56.0, 24.0),
            (2, "Beta", 56.0, 24.0),   # two entries -> multiple
            (3, "Gamma", 56.0, 24.0),  # no entry -> missing only
            (4, "Delta", 56.0, 24.0),  # single but too far -> mismatch
            (5, "Eps", 56.0, 24.0),    # single entry, no coord -> assigned
        ],
        "item_id long, name string, lat double, lon double",
    )
    entries = spark.createDataFrame(
        [
            (100, "Alfa", 56.001, 24.001),
            (101, "Beta", 56.0, 24.0),
            (102, "Beta", 56.1, 24.1),
            (103, "Delta", 57.5, 24.0),  # ~167 km away
            (104, "Eps", None, None),
            (105, "Zeta", 56.0, 24.0),  # matches nothing -> extra
        ],
        "entry_id long, name string, elat double, elon double",
    )
    rows = external_assign(items, entries, max_dist_m=75000.0).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)

    assert {(r.item_id, r.entry_id) for r in by_kind["assigned"]} == {
        (1, 100),
        (5, 104),
    }
    assert [(r.item_id, r.n) for r in by_kind["multiple_matches"]] == [(2, 2)]
    mm = by_kind["coord_mismatch"]
    assert [(r.item_id, r.entry_id) for r in mm] == [(4, 103)]
    assert abs(mm[0].dist_m - round(1.5 * 111139.0)) <= 1.0
    # missing covers EVERY unassigned item, issue items included
    assert {r.item_id for r in by_kind["missing"]} == {2, 3, 4}
    # extra covers entries assigned to no item, even ones that matched
    assert {r.entry_id for r in by_kind["extra_entry"]} == {101, 102, 103, 105}
