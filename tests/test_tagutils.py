"""Mirrors /root/reference/CoreTests/TagUtilsTests.cs case by case —
SplitValue / ValuesMatch / ValuesMatchOrderSensitive semantics."""

import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.functions.tags import (
    _split_value,
    split_values_check,
    values_equal_ordered,
    values_equal_unordered,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "value,expected",
    [
        ("abc", ["abc"]),
        (" a ; b ;  c  ", ["a", "b", "c"]),
        ("a;b;a", ["a", "b", "a"]),  # duplicates preserved
        ("a;b;", ["a", "b"]),  # trailing semicolon ignored
    ],
)
def test_split_value(spark, value, expected):
    assert _eval(spark, _split_value(F.lit(value))) == expected


MATCH_TRUE = [
    ("abc", "abc"),
    ("zebra;dots", "dots;zebra"),
    (" a ; b ", "b; a"),
    ("a;b;c", "c;b;a"),
    # repeats ignored
    ("a;a;b", "b;a"),
    ("a;a", "a; a"),
    ("x;x;y;y", "y;x"),
    ("a;a;b", "a;b"),
    # empty / whitespace-only tokens ignored
    ("a; ;b", "a;b"),
    (" ; a ; b ", "a;b"),
    ("a; ; ;b", "a;b"),
]

MATCH_FALSE = [
    ("abc", "abd"),
    # case-sensitive
    ("A;b", "a;b"),
    ("a;B", "a;b"),
    ("Ab", "ab"),
    # different tokens
    ("a;b", "a;c"),
    ("a", "b"),
    ("a;b", "a;b;c"),
    ("x;y", "x;z"),
    # only one side has semicolons
    ("ab", "a;b"),
    ("a;b", "ab"),
    ("a;b", "a,b"),
]


@pytest.mark.parametrize("v1,v2", MATCH_TRUE)
def test_values_match_true(spark, v1, v2):
    assert _eval(spark, values_equal_unordered(F.lit(v1), F.lit(v2))) is True


@pytest.mark.parametrize("v1,v2", MATCH_FALSE)
def test_values_match_false(spark, v1, v2):
    assert _eval(spark, values_equal_unordered(F.lit(v1), F.lit(v2))) is False


ORDERED_CASES = [
    # whitespace around tokens ignored
    ("a; b", "a;b", True),
    (" a ; b ", "a ;b", True),
    ("x; y;z", "x;y; z", True),
    # order matters
    ("a;b", "b;a", False),
    ("x;y;z", "z;y;x", False),
    ("1;2;3", "1;3;2", False),
    # repeats preserved
    ("a;a", "a", False),
    ("a;a", "a;a", True),
    ("a;a;b", "a;b;a", False),
    ("a;a;b", "a;a;b", True),
    # case-sensitive
    ("A;b", "a;b", False),
    ("a;B", "a;b", False),
    # empty tokens preserved and compared
    ("hi;;bye", "hi; ;bye", True),
    (";a", " ;a", True),
    ("a;;", "a; ;", True),
    ("hi;;bye", "hi;bye", False),
    (";;a;b", ";a;b", False),
    ("a; ;b", "a;b", False),
    ("a;;b", "a;b;", False),
    ("a;;b", "a;;b;;", False),
    (";a;b", "a;b", False),
]


@pytest.mark.parametrize("v1,v2,expected", ORDERED_CASES)
def test_values_match_order_sensitive(spark, v1, v2, expected):
    assert _eval(spark, values_equal_ordered(F.lit(v1), F.lit(v2))) is expected


def test_split_values_check_semantics(spark):
    """Non-empty token list required; all tokens must pass; pre-trim
    empties dropped so 'a;b;' still passes a non-empty predicate."""
    df = spark.createDataFrame(
        [
            (1, {"k": "a;b;"}),
            (2, {"k": ";"}),      # no tokens -> False
            (3, {"k": "a;;b"}),   # empties dropped, a/b pass
            (4, {"x": "a"}),      # key missing -> False
        ],
        "id int, tags map<string,string>",
    )
    pred = lambda t: t.isin(["a", "b"])  # noqa: E731
    got = sorted(
        r["id"] for r in df.filter(split_values_check("tags", "k", pred)).collect()
    )
    assert got == [1, 3]
