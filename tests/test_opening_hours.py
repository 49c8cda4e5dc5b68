"""Mirrors /root/reference/CoreTests/OsmOpeningHoursHelperTests.cs
case by case (all 18 TestCases) against the native-expression fold."""

import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.functions.opening_hours import merge_weekday_lines

CASES = [
    (["Tu 08:00-12:00", "We 08:00-12:00"], ["Tu-We 08:00-12:00"]),
    (["Mo 08:00-12:00", "Tu 08:00-12:00"], ["Mo-Tu 08:00-12:00"]),
    (["Sa 08:00-12:00", "Su 08:00-12:00"], ["Sa-Su 08:00-12:00"]),
    (
        ["Tu 08:00-12:00", "We 08:00-12:00", "Th 08:00-12:00"],
        ["Tu-Th 08:00-12:00"],
    ),
    (
        ["Tu 08:00-12:00", "We 09:00-13:00"],
        ["Tu 08:00-12:00", "We 09:00-13:00"],
    ),
    (
        ["Tu 08:00-12:00", "Th 08:00-12:00"],
        ["Tu 08:00-12:00", "Th 08:00-12:00"],
    ),
    (
        ["Tu 08:00-12:00", "We 08:00-12:00", "Th 09:00-13:00"],
        ["Tu-We 08:00-12:00", "Th 09:00-13:00"],
    ),
    (
        ["Tu 08:00-12:00", "We 09:00-13:00", "Th 09:00-13:00"],
        ["Tu 08:00-12:00", "We-Th 09:00-13:00"],
    ),
    (
        ["Tu 08:00-12:00", "We 08:00-12:00", "Fr 08:00-12:00"],
        ["Tu-We 08:00-12:00", "Fr 08:00-12:00"],
    ),
    (["Tu 08:00-12:00"], ["Tu 08:00-12:00"]),
    # duplicate day is NOT sequential -> not merged
    (
        ["Tu 08:00-12:00", "Tu 08:00-12:00"],
        ["Tu 08:00-12:00", "Tu 08:00-12:00"],
    ),
    (["Tu", "We"], ["Tu", "We"]),
    (["Tu", "We 08:00-12:00"], ["Tu", "We 08:00-12:00"]),
    (["Tu 08:00-12:00", "We"], ["Tu 08:00-12:00", "We"]),
    (
        ["Xx 08:00-12:00", "We 08:00-12:00"],
        ["Xx 08:00-12:00", "We 08:00-12:00"],
    ),
    (
        ["Tu 08:00-12:00", "Xx 08:00-12:00"],
        ["Tu 08:00-12:00", "Xx 08:00-12:00"],
    ),
    (["Sa Off", "Su Off"], ["Sa-Su Off"]),
    # seasonal prefix lines pass through unmerged
    (
        ["Sep-May Mo 08:00-12:00", "Sep-May Tu 08:00-12:00"],
        ["Sep-May Mo 08:00-12:00", "Sep-May Tu 08:00-12:00"],
    ),
]


@pytest.mark.parametrize("lines,expected", CASES)
def test_merge_sequential_weekdays(spark, lines, expected):
    df = spark.createDataFrame([(lines,)], "lines array<string>")
    got = df.select(merge_weekday_lines("lines").alias("m")).first()["m"]
    assert got == expected


def test_merge_range_extends(spark):
    # "Mo-Tu ..." + "We ..." -> "Mo-We ..." (range end day advances)
    df = spark.createDataFrame(
        [(["Mo-Tu 08:00-12:00", "We 08:00-12:00"],)], "lines array<string>"
    )
    got = df.select(merge_weekday_lines("lines").alias("m")).first()["m"]
    assert got == ["Mo-We 08:00-12:00"]


def test_merge_empty_and_batch(spark):
    df = spark.createDataFrame(
        [(1, []), (2, ["Mo 08:00-17:00", "Tu 08:00-17:00", "We 08:00-17:00"])],
        "id int, lines array<string>",
    )
    rows = {
        r["id"]: r["m"]
        for r in df.select("id", merge_weekday_lines("lines").alias("m")).collect()
    }
    assert rows[1] == []
    assert rows[2] == ["Mo-We 08:00-17:00"]


def test_whole_stage_codegen(spark):
    """No UDF: the fold must stay JVM-side."""
    df = spark.createDataFrame([(["Mo 08:00-12:00"],)], "lines array<string>")
    plan = (
        df.select(merge_weekday_lines("lines").alias("m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
