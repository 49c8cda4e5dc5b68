"""VDB (Latvian place-name database) alternative-name parser.

Re-expresses the reference's ParseAltNamesWithQualifiers
(Osmalyzer/Data/Misc Data Fetchers/VdbAnalysisData.cs:640-737, tests in
OsmalyzerTests/VdbAltNamesParserTests.cs): a raw VDB "all names" cell
like ``"Name1 [pron], Name2 (comment) [pron2], Name3"`` splits into
(name, qualifiers) entries — ``[...]`` qualifiers are pronunciations,
``(...)`` are comments, consecutive qualifiers attach to the same name,
commas inside brackets do not split (same-bracket nesting tracked), and
an unmatched bracket raises.

The scalar parser is the semantic unit (mirrored test-for-test); the
Spark surface is an Arrow-batched pandas UDF returning the parsed
structure as ``array<struct<name, qualifiers array<struct<qtype,
content>>>>`` for explode/filter downstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

PRONUNCIATION = "pronunciation"  # [...] (VdbAltNameQualifierType.Pronunciation)
COMMENT = "comment"  # (...) (VdbAltNameQualifierType.Comment)

_OPEN = {"[": ("]", PRONUNCIATION), "(": (")", COMMENT)}

ALT_NAMES_TYPE = (
    "array<struct<name:string,"
    "qualifiers:array<struct<qtype:string,content:string>>>>"
)


def _parse_single(text: str, start: int) -> tuple[str, list[tuple[str, str]], int]:
    """One name + its consecutive qualifiers from `start`; returns
    (name, [(qtype, content)...], next_index). Mirrors
    VdbAnalysisData.ParseSingleAltName:670-737."""
    i = start
    quals: list[tuple[str, str]] = []
    while i < len(text):
        ch = text[i]
        if ch in _OPEN:
            name = text[start:i].strip()
            while i < len(text) and text[i] in _OPEN:
                open_b = text[i]
                close_b, qtype = _OPEN[open_b]
                q_start = i
                depth = 1
                i += 1
                while i < len(text) and depth > 0:
                    if text[i] == open_b:
                        depth += 1
                    elif text[i] == close_b:
                        depth -= 1
                    i += 1
                if depth != 0:
                    raise ValueError(
                        f"unmatched bracket in alternative names at "
                        f"position {q_start}: {text}"
                    )
                quals.append((qtype, text[q_start + 1 : i - 1]))
                while i < len(text) and text[i].isspace() and text[i] != ",":
                    i += 1
            return name, quals, i
        if ch == "," and not quals:
            return text[start:i].strip(), quals, i
        i += 1
    return text[start:i].strip(), quals, i


def parse_alt_names(all_names: str) -> list[tuple[str, list[tuple[str, str]]]]:
    """-> [(name, [(qtype, content), ...]), ...]."""
    out: list[tuple[str, list[tuple[str, str]]]] = []
    i = 0
    while i < len(all_names):
        name, quals, i = _parse_single(all_names, i)
        out.append((name, quals))
        while i < len(all_names) and (all_names[i] == "," or all_names[i].isspace()):
            i += 1
    return out


def parse_alt_names_col(col) -> Column:
    """Arrow-batched column form; NULL input -> empty array, a malformed
    cell (unmatched bracket) -> NULL (filterable, instead of failing the
    whole job — the reference throws per record)."""

    @F.pandas_udf(ALT_NAMES_TYPE)
    def udf(names: pd.Series) -> pd.Series:
        out = []
        for s in names:
            if s is None:
                out.append([])
                continue
            try:
                out.append(
                    [
                        (n, [(t, c) for t, c in qs])
                        for n, qs in parse_alt_names(s)
                    ]
                )
            except ValueError:
                out.append(None)
        return pd.Series(out, dtype=object)

    return udf(col)
