"""LV->RU transliteration as a data-driven native regexp cascade.

Spark equivalent of the reference's rule table
(Osmalyzer/Misc/Transliterator.cs:5-197): ordered context-sensitive
digraph rules (soft consonants, word-initial E, diphthongs, j-vowel
fusion), then a single-character table via translate(). Case preservation
follows the reference's scheme of paired upper/lower rules. Used by the
ImproperTranslationAnalyzer equivalent to validate name:ru tags.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered digraph/context rules: (java regex, replacement)
_RULES: list[tuple[str, str]] = [
    (r"(\d+)\.", "$1"),  # numbers drop the period
    # soft consonant followed by a non-vowel gets a soft sign
    (r"ņ(?![euioaēūīōāņ])", "нь"),
    (r"ķ(?![euioaēūīōāķ])", "кь"),
    (r"ļ(?![euioaēūīōāļ])", "ль"),
    (r"ģ(?![euioaēūīōāģ])", "гь"),
    # consonant + j + vowel -> soft sign before the fused vowel
    (r"(?<=[rtplkgfdscvbnmļķņčģ])(?=j[aeuioāēūīō])", "ь"),
    # word-initial Ei/E
    (r"\b[EĒ]i", "Эй"),
    (r"\b[eē]i", "эй"),
    (r"\b[EĒ]", "Э"),
    (r"\b[eē]", "э"),
    # diphthongs (case-preserving pairs)
    (r"Ai", "Ай"), (r"ai", "ай"),
    (r"Ei", "Ей"), (r"ei", "ей"),
    (r"Ui", "Уй"), (r"ui", "уй"),
    # soft consonant + u
    (r"Ģu", "Гю"), (r"ģu", "гю"),
    (r"Ķu", "Кю"), (r"ķu", "кю"),
    (r"Ļu", "Лю"), (r"ļu", "лю"),
    (r"Ņu", "Ню"), (r"ņu", "ню"),
    # j-vowel fusion
    (r"J[eē]", "Е"), (r"j[eē]", "е"),
    (r"Šj[aā]", "Шья"), (r"šj[aā]", "шья"),
    (r"J[aā]", "Я"), (r"j[aā]", "я"),
    (r"Ļ[aā]", "Ля"), (r"ļ[aā]", "ля"),
    (r"Ņa", "Ня"), (r"ņa", "ня"),
    (r"J[uū]", "Ю"), (r"j[uū]", "ю"),
    (r"Hi", "Ги"), (r"hi", "ги"),
]

# single-character table (both cases) applied after the rules
_CHAR_MAP = {
    "a": "а", "ā": "а", "b": "б", "c": "ц", "č": "ч", "d": "д", "e": "е",
    "ē": "е", "f": "ф", "g": "г", "ģ": "г", "h": "х", "i": "и", "ī": "и",
    "j": "й", "k": "к", "ķ": "к", "l": "л", "ļ": "л", "m": "м", "n": "н",
    "ņ": "н", "o": "о", "p": "п", "r": "р", "s": "с", "š": "ш", "t": "т",
    "u": "у", "ū": "у", "v": "в", "z": "з", "ž": "ж",
}
_LAT = "".join(_CHAR_MAP) + "".join(_CHAR_MAP).upper()
_CYR = "".join(_CHAR_MAP.values()) + "".join(_CHAR_MAP.values()).upper()


def transliterate_lv_ru(name) -> Column:
    c = name if isinstance(name, Column) else F.col(name)
    for pat, rep in _RULES:
        c = F.regexp_replace(c, pat, rep)
    c = F.translate(c, _LAT, _CYR)
    c = F.regexp_replace(c, "ьйо", "ё")
    return c


def transliterate_lv_en(name) -> Column:
    """Ordinal suffixing (Transliterator.cs:92-100): '1.' -> '1st' etc. at
    end of string."""
    c = name if isinstance(name, Column) else F.col(name)
    c = F.regexp_replace(c, r"(?<!1)1\.\s*$", "1st")
    c = F.regexp_replace(c, r"(?<!1)2\.\s*$", "2nd")
    c = F.regexp_replace(c, r"(?<!1)3\.\s*$", "3rd")
    c = F.regexp_replace(c, r"(\d)\.\s*$", "$1th")
    return c


# --------------------------------------------------------------------------
# Feature-name qualifier translations (public table: the reference ships it
# as `data/feature name qualifiers.tsv`; FeatureNameQualifiersAnalysisData.cs
# parses latvian \t russian \t english with ';'-separated variants).
# Order matters: ExtractNomenclature (ImproperTranslationAnalyzer.cs:382-398)
# scans in file order and takes the FIRST suffix match.
# --------------------------------------------------------------------------

QUALIFIER_TABLE: list[tuple[str, list[str], list[str]]] = [
    ("iela", ["улица", "ул."], ["street", "st."]),
    ("bulvāris", ["бульвар"], ["boulevard"]),
    ("ceļš", ["дорога"], ["road"]),
    ("gatve", ["гатве", "проспект"], ["gatve"]),
    ("šoseja", ["шоссе"], ["highway"]),
    ("tilts", ["мост"], ["bridge"]),
    ("dambis", ["дамбис", "дамба"], ["dam"]),
    ("aleja", ["аллея"], ["alley"]),
    ("apvedceļš", ["окружная дорога"], ["bypass"]),
    ("laukums", ["площадь"], ["square"]),
    ("prospekts", ["проспект"], ["avenue"]),
    ("pārvads", ["переезд"], ["crossing"]),
    ("līnija", ["линия"], ["line"]),
    ("šķērslīnija", ["поперечная линия"], ["cross line"]),
    ("krastmala", ["набережная"], ["waterfront"]),
    ("stacija", ["станция"], ["station"]),
]


def transliterate_lv_ru_py(name: str) -> str:
    """Pure-Python mirror of :func:`transliterate_lv_ru` (the Column
    cascade above), used to generate test fixtures and oracle literals.

    It deliberately re-applies the SAME rule table through Python's `re`
    engine — an independent execution path from Spark's Java regex — so a
    driver query comparing the two is a genuine differential test of the
    cascade (reference: Osmalyzer/Misc/Transliterator.cs:5-88).
    """
    import re

    s = name
    for pat, rep in _RULES:
        s = re.sub(pat, rep.replace("$1", r"\1"), s)
    s = s.translate(str.maketrans(_LAT, _CYR))
    return s.replace("ьйо", "ё")
