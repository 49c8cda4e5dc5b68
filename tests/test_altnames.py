"""VDB alternative-name parser: mirrors every case in
OsmalyzerTests/VdbAltNamesParserTests.cs (the last reference test suite
without an analog here)."""

import pytest

from osmalyzer_spark.functions.altnames import (
    COMMENT as C,
    PRONUNCIATION as P,
    parse_alt_names,
    parse_alt_names_col,
)


def test_single_square_bracket_qualifier():
    assert parse_alt_names("Name1 [q1]") == [("Name1", [(P, "q1")])]


def test_single_round_bracket_qualifier():
    assert parse_alt_names("Name1 (q1)") == [("Name1", [(C, "q1")])]


def test_comma_in_square_bracket():
    assert parse_alt_names("Name1 [q1, q2]") == [("Name1", [(P, "q1, q2")])]


def test_comma_in_round_bracket():
    assert parse_alt_names("Name1 (q1, q2, q3)") == [("Name1", [(C, "q1, q2, q3")])]


def test_both_bracket_types():
    assert parse_alt_names("Name1 [q1] (q2)") == [("Name1", [(P, "q1"), (C, "q2")])]


def test_both_bracket_types_reversed():
    assert parse_alt_names("Name1 (q1) [q2]") == [("Name1", [(C, "q1"), (P, "q2")])]


def test_multiple_square_bracket_qualifiers():
    assert parse_alt_names("Name1 [q1] [q2] [q3]") == [
        ("Name1", [(P, "q1"), (P, "q2"), (P, "q3")])
    ]


def test_multiple_round_bracket_qualifiers():
    assert parse_alt_names("Name1 (q1) (q2) (q3)") == [
        ("Name1", [(C, "q1"), (C, "q2"), (C, "q3")])
    ]


def test_mixed_multiple_qualifiers():
    assert parse_alt_names("Name1 [q1] (q2) [q3] (q4)") == [
        ("Name1", [(P, "q1"), (C, "q2"), (P, "q3"), (C, "q4")])
    ]


def test_single_name_without_qualifiers():
    assert parse_alt_names("Name1") == [("Name1", [])]


def test_two_names_without_qualifiers():
    assert parse_alt_names("Name1, Name2") == [("Name1", []), ("Name2", [])]


def test_two_names_with_square_bracket_qualifiers():
    assert parse_alt_names("Name1 [q1], Name2 [q2]") == [
        ("Name1", [(P, "q1")]),
        ("Name2", [(P, "q2")]),
    ]


def test_two_names_with_round_bracket_qualifiers():
    assert parse_alt_names("Name1 (q1), Name2 (q2)") == [
        ("Name1", [(C, "q1")]),
        ("Name2", [(C, "q2")]),
    ]


def test_three_names_with_mixed_qualifiers():
    assert parse_alt_names("Name1 [q1], Name2 (q2), Name3 [q3] (q4)") == [
        ("Name1", [(P, "q1")]),
        ("Name2", [(C, "q2")]),
        ("Name3", [(P, "q3"), (C, "q4")]),
    ]


def test_multiple_names_some_without_qualifiers():
    assert parse_alt_names("Name1, Name2 (q1), Name3, Name4 [q2]") == [
        ("Name1", []),
        ("Name2", [(C, "q1")]),
        ("Name3", []),
        ("Name4", [(P, "q2")]),
    ]


def test_extra_whitespace():
    assert parse_alt_names("Name1 [q1]  ,  Name2 (q2)  ,  Name3") == [
        ("Name1", [(P, "q1")]),
        ("Name2", [(C, "q2")]),
        ("Name3", []),
    ]


def test_complex_qualifier_content():
    assert parse_alt_names("Name1 (qualifier with spaces, punctuation! and 123)") == [
        ("Name1", [(C, "qualifier with spaces, punctuation! and 123")])
    ]


def test_five_names_varied_combinations():
    assert parse_alt_names(
        "Name1, Name2 [q1], Name3 (q2), Name4 [q3] (q4), Name5 [q5] [q6] (q7)"
    ) == [
        ("Name1", []),
        ("Name2", [(P, "q1")]),
        ("Name3", [(C, "q2")]),
        ("Name4", [(P, "q3"), (C, "q4")]),
        ("Name5", [(P, "q5"), (P, "q6"), (C, "q7")]),
    ]


def test_empty_qualifiers():
    assert parse_alt_names("Name1 [] ()") == [("Name1", [(P, ""), (C, "")])]


def test_alternating_bracket_types():
    assert parse_alt_names("Name1 [q1] (q2) [q3], Name2 (q4) [q5] (q6)") == [
        ("Name1", [(P, "q1"), (C, "q2"), (P, "q3")]),
        ("Name2", [(C, "q4"), (P, "q5"), (C, "q6")]),
    ]


def test_qualifiers_with_nested_commas():
    assert parse_alt_names("Name1 [a, b, c], Name2 (x, y, z)") == [
        ("Name1", [(P, "a, b, c")]),
        ("Name2", [(C, "x, y, z")]),
    ]


def test_six_names_complex_combination():
    assert parse_alt_names(
        "Name1, Name2 [q1], Name3 (q2, q3), Name4 [q4] (q5), "
        "Name5 [q6, q7] [q8], Name6 (q9) (q10) [q11]"
    ) == [
        ("Name1", []),
        ("Name2", [(P, "q1")]),
        ("Name3", [(C, "q2, q3")]),
        ("Name4", [(P, "q4"), (C, "q5")]),
        ("Name5", [(P, "q6, q7"), (P, "q8")]),
        ("Name6", [(C, "q9"), (C, "q10"), (P, "q11")]),
    ]


def test_unmatched_bracket_raises():
    with pytest.raises(ValueError, match="unmatched bracket"):
        parse_alt_names("Name1 [q1")


def test_nested_same_brackets():
    """Depth tracking: the closing bracket must balance nesting of the
    SAME bracket character (VdbAnalysisData.cs:700-708)."""
    assert parse_alt_names("Name1 [a [b] c]") == [("Name1", [(P, "a [b] c")])]


def test_column_form(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Rīga [riːɡa], Riga (English)",), (None,), ("Bad [oops",)],
        "raw string",
    )
    rows = df.select(parse_alt_names_col(F.col("raw")).alias("p")).collect()
    assert [
        (e["name"], [(q["qtype"], q["content"]) for q in e["qualifiers"]])
        for e in rows[0]["p"]
    ] == [("Rīga", [(P, "riːɡa")]), ("Riga", [(C, "English")])]
    assert rows[1]["p"] == []
    assert rows[2]["p"] is None  # malformed -> NULL, filterable
