import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.functions.address import fuzzy_address_match
from osmalyzer_spark.functions.strings import (
    brand_name_match,
    clean_stop_name,
    fuzzy_name_match,
    stop_names_match,
)
from osmalyzer_spark.functions.tags import (
    get_delimited_values,
    get_prefixed_values,
    has_any_value,
    has_key,
    has_key_prefixed,
    has_value,
    is_closed_way,
    split_values_check,
    values_equal_unordered,
)


@pytest.fixture(scope="module")
def tagged(spark):
    rows = [
        (1, "node", {"shop": "supermarket", "name": "Rimi Mini", "addr:street": "Ozolu iela", "addr:housenumber": "9"}, None),
        (2, "node", {"amenity": "post_box", "surface": "gravel;asphalt"}, None),
        (3, "way", {"building": "yes"}, [5, 6, 7, 5]),
        (4, "way", None, [5, 6]),
    ]
    return spark.createDataFrame(
        rows, "id int, type string, tags map<string,string>, node_ids array<bigint>"
    ).cache()


def _ids(df, cond):
    return sorted(r["id"] for r in df.filter(cond).collect())


def test_tag_predicates(spark, tagged):
    assert _ids(tagged, has_key("tags", "shop")) == [1]
    assert _ids(tagged, has_key_prefixed("tags", "addr:")) == [1]
    assert _ids(tagged, has_value("tags", "shop", "supermarket")) == [1]
    assert _ids(tagged, has_value("tags", "shop", "SUPERMARKET", case_sensitive=False)) == [1]
    assert _ids(tagged, has_any_value("tags", "amenity", ["post_box", "post_office"])) == [2]
    # SplitValuesCheck: all `;` tokens in allowed set
    ok = split_values_check("tags", "surface", lambda t: t.isin(["gravel", "asphalt"]))
    assert _ids(tagged, ok) == [2]
    bad = split_values_check("tags", "surface", lambda t: t.isin(["gravel"]))
    assert _ids(tagged, bad) == []


def test_type_predicates(spark, tagged):
    assert _ids(tagged, is_closed_way()) == [3]


def test_tag_projections(spark, tagged):
    row = tagged.filter("id = 2").select(
        get_delimited_values("tags", "surface").alias("vals"),
    ).first()
    assert row["vals"] == ["gravel", "asphalt"]
    row = tagged.filter("id = 1").select(get_prefixed_values("tags", "addr:").alias("m")).first()
    assert set(row["m"]) == {"addr:street", "addr:housenumber"}
    eq = spark.createDataFrame([("a; b;c", "c;a ;b")], "x string, y string").select(
        values_equal_unordered("x", "y").alias("e")
    ).first()["e"]
    assert eq is True


def test_fuzzy_and_brand_names(spark):
    df = spark.createDataFrame(
        [("Rimi Mini Ozolu", "rimi"), ("Maxima X", "Rimi"), (" LaTS veikals ", "lats veikals dienvidi")],
        "a string, b string",
    )
    got = [r[0] for r in df.select(fuzzy_name_match("a", "b")).collect()]
    assert got == [True, False, True]
    brands = [r[0] for r in df.select(brand_name_match("a", ["rimi", "lats"])).collect()]
    assert brands == [True, False, True]


def test_stop_name_canonicalization(spark):
    cases = [
        ("Majoru stacija (Majori)", "majoru stacija"),
        ('Arēna "Rīga"', "arēna rīga"),
        ("TEC-2 pārvalde", "tec - 2 pārvalde"),
        ("DS  Salūts", "ds salūts"),
        ("Promenādes iela [Rīgas iela]", "promenādes iela"),
    ]
    df = spark.createDataFrame(cases, "raw string, want string")
    bad = df.filter(clean_stop_name("raw") != F.col("want")).collect()
    assert not bad, bad


def test_stop_names_match(spark):
    cases = [
        ("E.Smiļģa iela", "Eduarda Smiļģa iela", True),  # abbreviation
        ("Botāniskais dārzs/Rīgas Stradiņa universitāte", "Botāniskais dārzs", True),  # dual
        ("Majoru stacija", "Majoru stacija (Majori)", False),  # paren is on OSM side, cleaned -> equal
        ("Preču - 2", "Preču-2", True),  # punctuation spacing
        ("Alfa", "Beta", False),
    ]
    df = spark.createDataFrame(cases, "pt string, osm string, want boolean")
    got = df.select("pt", "osm", "want", stop_names_match("pt", "osm").alias("got")).collect()
    for r in got:
        if r["pt"] == "Majoru stacija":
            # OSM side cleaned strips its paren -> matches
            assert r["got"] is True
        else:
            assert r["got"] == r["want"], r


def test_fuzzy_address_match(spark):
    cases = [
        # (tag_street, tag_housenumber, tag_unit, fuzzy, want)
        ("Ozolu iela", "9", None, "Ozolu 9", True),  # suffix omitted
        ("Ozolu iela", "9", None, "Ozolu iela 9", True),
        ("Ozolu iela", "9", None, "Ozolu gatve 9", False),  # suffix mismatch
        ("Ozolu iela", "9", None, "Liepu 9", False),  # wrong street, no suffix...
        ("Ozolu iela", "9", None, "Ozolu 13", False),  # wrong number
        ("Brīvības iela", "13b", None, "Brīvības 13B", True),  # letter suffix
        ("Brīvības iela", "13", "2", "Brīvības 13-2", True),  # unit match
        ("Brīvības iela", "13", "3", "Brīvības 13-2", False),  # unit mismatch
        (None, "9", None, "Ozolu 9", False),
    ]
    df = spark.createDataFrame(
        cases, "street string, num string, unit string, addr string, want boolean"
    )
    got = df.select(
        "addr", "want",
        fuzzy_address_match("street", "num", "addr", tag_unit="unit").alias("got"),
    ).collect()
    for r in got:
        if r["addr"] == "Liepu 9":
            # reference quirk: "Liepu 9" has no suffix and "ozolu" (base) is
            # checked via contains -> False. keep strict expectation
            assert r["got"] is False
        else:
            assert r["got"] == r["want"], r


def test_transliteration(spark):
    from osmalyzer_spark.functions.translit import transliterate_lv_en, transliterate_lv_ru

    df = spark.createDataFrame(
        [("Elizabetes iela",), ("Meistaru iela",), ("Jēkabpils",), ("Kļavu iela",), ("Stacijas iela",)],
        "name string",
    )
    got = [r[0] for r in df.select(transliterate_lv_ru("name")).collect()]
    assert got[0] == "Элизабетес иела"
    assert got[1] == "Мейстару иела"
    assert got[2] == "Екабпилс"
    assert got[3] == "Кляву иела"
    assert got[4] == "Стацияс иела"
    df2 = spark.createDataFrame([("Jaunciema 2.",), ("Linija 1.",)], "name string")
    got2 = [r[0] for r in df2.select(transliterate_lv_en("name")).collect()]
    assert got2 == ["Jaunciema 2nd", "Linija 1st"]
