"""ImproperTranslationAnalyzer semantics mirrored from the reference
(Osmalyzer/Analyzers/Validation/ImproperTranslationAnalyzer.cs)."""

import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.functions.translation_check import (
    check_translations,
    weighted_levenshtein,
)
from osmalyzer_spark.functions.translit import (
    QUALIFIER_TABLE,
    transliterate_lv_ru_py,
)


# ---------------------------------------------------------------- pure DP


def test_weighted_levenshtein_reference_costs():
    # plain unit costs
    assert weighted_levenshtein("абв", "абв") == 0.0
    assert weighted_levenshtein("абв", "абг") == 1.0
    assert weighted_levenshtein("абв", "аб") == 1.0
    assert weighted_levenshtein("", "аб") == 2.0
    # each CyrillicNameMatcher cheap pair costs 0.5, both directions
    for a, b in [("е", "э"), ("е", "ё"), ("и", "й"), ("ш", "щ"), ("х", "г"), ("а", "я"), ("и", "ы")]:
        assert weighted_levenshtein(a, b) == 0.5
        assert weighted_levenshtein(b, a) == 0.5
    # composes: one cheap + one full substitution
    assert weighted_levenshtein("еб", "эв") == 1.5


def test_python_mirror_matches_reference_examples():
    # the exact examples the reference cites in Transliterator.cs comments
    cases = {
        "Kaņepju": "Канепью",
        "Eizenšteina": "Эйзенштейна",
        "Elizabetes": "Элизабетес",
        "Meistaru": "Мейстару",
        "Jēkabpils": "Екабпилс",
        "Krišjāņa": "Кришьяня",
        "Stacijas": "Стацияс",
        "Kļavu": "Кляву",
        # Transliterator.cs's comment says 'Гравю', but its own
        # consonant+j+vowel soft-sign rule (the Kaņepju -> Канепью rule,
        # which runs earlier) also fires on 'Grāvju' -> actual behavior ью
        "Grāvju": "Гравью",
        "Hipokrāta": "Гипократа",
        "Tirgoņu": "Тиргоню",
        "Ilmeņa": "Илменя",
    }
    for lv, ru in cases.items():
        assert transliterate_lv_ru_py(lv) == ru, lv


def test_spark_cascade_agrees_with_python_mirror(spark):
    from osmalyzer_spark.functions.translit import transliterate_lv_ru

    names = [
        "Elizabetes iela", "Meistaru iela", "Kļavu iela", "Stacijas iela",
        "Kaņepju iela", "Brīvības bulvāris", "Tērbatas iela",
        "Ģertrūdes iela", "Krišjāņa Valdemāra iela", "2. līnija",
        "Eizenšteina iela", "Hipokrāta iela", "Ozolu gatve",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {r["name"]: r["t"] for r in df.select("name", transliterate_lv_ru("name").alias("t")).collect()}
    for n in names:
        assert got[n] == transliterate_lv_ru_py(n), n


# ------------------------------------------------------------ the checker


def _elements(spark, rows):
    return spark.createDataFrame(
        [(i, {"name": n, "name:ru": ru}) for i, (n, ru) in enumerate(rows)],
        "elem_id long, tags map<string,string>",
    )


def test_check_translations_verdicts(spark):
    t = transliterate_lv_ru_py
    rows = [
        # exact: prefix + " " + translit
        ("Elizabetes iela", "улица " + t("Elizabetes")),
        # exact: translit + " " + prefix (both orders accepted)
        ("Meistaru iela", t("Meistaru") + " улица"),
        # exact via the SECOND ru variant of 'iela' ("ул.")
        ("Kļavu iela", "ул. " + t("Kļavu")),
        # exact is case-insensitive (reference lowercases both sides)
        ("Stacijas iela", ("улица " + t("Stacijas")).upper()),
        # good enough: one confusable substitution (е -> э), distance 0.5
        ("Tērbatas iela", "улица " + t("Tērbatas").replace("е", "э", 1)),
        # mismatch: wrong qualifier word
        ("Brīvības iela", "переулок " + t("Brīvības")),
        # ignored: no known nomenclature suffix
        ("Jēkabpils", "Екабпилс"),
    ]
    out = {
        r["name"]: r
        for r in check_translations(_elements(spark, rows), "ru").collect()
    }
    assert out["Elizabetes iela"]["verdict"] == "exact"
    assert out["Meistaru iela"]["verdict"] == "exact"
    assert out["Kļavu iela"]["verdict"] == "exact"
    assert out["Stacijas iela"]["verdict"] == "exact"
    assert out["Tērbatas iela"]["verdict"] == "good_enough"
    assert out["Tērbatas iela"]["expected"] == "улица " + t("Tērbatas")
    m = out["Brīvības iela"]
    assert m["verdict"] == "mismatch"
    # mismatch reports the FIRST expected candidate (stable tie-break)
    assert m["expected"] == "улица " + t("Brīvības")
    assert out["Jēkabpils"]["verdict"] == "ignored"
    assert out["Jēkabpils"]["expected"] == ""


def test_check_translations_digit_line_names(spark):
    # 'Imantas 1. līnija' -> 'Имантас 1-я линия' special case:
    # translit of the raw name ends with a digit -> '-я '/' -й ' forms
    rows = [
        ("2. līnija", "2-я линия"),
        ("3. līnija", "3-й линия"),
        ("4. līnija", "линия 4"),  # word order NOT offered for digit names
    ]
    out = {r["name"]: r for r in check_translations(_elements(spark, rows), "ru").collect()}
    assert out["2. līnija"]["verdict"] == "exact"
    assert out["3. līnija"]["verdict"] == "exact"
    assert out["4. līnija"]["verdict"] == "mismatch"
    assert out["4. līnija"]["expected"] == "4-я линия"


def test_nomenclature_multiword_qualifier(spark):
    # ' šķērslīnija' matches as a whole word (EndsWith requires the space,
    # so the embedded 'līnija' cannot fire early); raw name is 'Pirmā' and
    # the ru translation is the two-word 'поперечная линия'.
    name = "Pirmā šķērslīnija"
    assert "šķērslīnija" in [q for q, _, _ in QUALIFIER_TABLE]
    rows = [(name, "whatever")]
    out = check_translations(_elements(spark, rows), "ru").collect()[0]
    assert out["verdict"] == "mismatch"
    assert out["expected"] == "поперечная линия " + transliterate_lv_ru_py("Pirmā")


def test_check_translations_en_exact_only(spark):
    df = spark.createDataFrame(
        [
            (0, {"name": "Ozolu iela", "name:en": "Ozolu street"}),
            (1, {"name": "Ozolu iela", "name:en": "street Ozolu"}),
        ],
        "elem_id long, tags map<string,string>",
    )
    out = {r["elem_id"]: r for r in check_translations(df, "en").collect()}
    assert out[0]["verdict"] == "exact"
    # en matcher is exact-only: reversed word order is a mismatch
    assert out[1]["verdict"] == "mismatch"
    assert out[1]["expected"] == "Ozolu street"
