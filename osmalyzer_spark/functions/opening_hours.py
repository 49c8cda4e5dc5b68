"""OSM opening-hours weekday-line merging (W4 real semantics).

Port of /root/reference/Core/Helpers/OsmOpeningHoursHelper.cs:19-127:
consecutive weekday lines with identical time parts merge into day
ranges ("Tu 08:00-12:00" + "We 08:00-12:00" -> "Tu-We 08:00-12:00");
seasonal-prefixed lines ("Sep-May Mo ...") pass through unmerged; any
malformed line passes through untouched (no input validation, same as
the reference).

Implemented as ONE native F.aggregate fold over the line array — all
string/array expressions, zero UDFs, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DAYS = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]


def _day_index(day: Column) -> Column:
    """1-based position in the weekday list; 0 = unrecognized."""
    return F.array_position(F.array(*[F.lit(d) for d in _DAYS]), day)


def merge_weekday_lines(lines) -> Column:
    """array<string> -> array<string> with sequential same-time weekday
    lines merged into ranges. Mirrors MergeSequentialWeekdaysWithSameTimes
    exactly, including its non-merging of duplicate days, unrecognized
    day names, and length-guard edge cases."""
    col = lines if isinstance(lines, Column) else F.col(lines)

    def step(acc: Column, cur: Column) -> Column:
        prev = F.element_at(acc, -1)
        # seasonal prefix: 4th char is '-' (e.g. "Sep-May Mo 08:00-12:00")
        seasonal = (F.length(cur) > 3) & (F.substring(cur, 4, 1) == "-")

        # DoesTimeMatch(prev, cur)
        space_idx = F.instr(prev, " ")
        a_time = F.substring(prev, space_idx + 1, F.lit(1 << 20))
        b_time = F.substring(cur, F.lit(4), F.lit(1 << 20))
        time_match = (space_idx > 0) & (F.length(cur) >= 4) & (a_time == b_time)

        # AreDaysSequential(prev, cur)
        a_is_range = (F.length(prev) >= 3) & (F.substring(prev, 3, 1) == "-")
        a_end_day = F.when(
            a_is_range,
            F.when(F.length(prev) >= 5, F.substring(prev, 4, 2)),
        ).otherwise(F.substring(prev, 1, 2))
        b_day = F.substring(cur, 1, 2)
        a_idx = _day_index(a_end_day)
        b_idx = _day_index(b_day)
        days_seq = (
            (F.length(prev) >= 2) & (F.length(cur) >= 2)
            & a_end_day.isNotNull()
            & (a_idx > 0) & (b_idx > 0) & (a_idx == b_idx - 1)
        )

        merged = F.concat(
            F.substring(prev, 1, 2), F.lit("-"), b_day, F.lit(" "),
            F.substring(cur, F.lit(4), F.lit(1 << 20)),
        )
        replace_last = F.concat(
            F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
        )
        append = F.concat(acc, F.array(cur))
        return (
            F.when(F.size(acc) == 0, F.array(cur))
            .when(seasonal, append)
            .when(time_match & days_seq, replace_last)
            .otherwise(append)
        )

    return F.aggregate(
        col, F.array().cast("array<string>"), step
    )
