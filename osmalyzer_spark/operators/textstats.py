"""Text analysis for training-data pipelines — all native expressions.

- token counts (whitespace + BPE-ish regex word pieces)
- quality scoring (length / punctuation / stopword ratios)
- language-ID n-gram/stopword heuristic
- document fingerprinting (order-sensitive rolling hash, JVM-side fold)

The reference's string surface (SURVEY §2.8) is all regexp/lower chains;
same philosophy here: zero UDFs, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "it"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "zu", "mit"]
ES_STOPWORDS = ["el", "la", "de", "que", "y", "en", "un", "es"]

# BPE-ish word pieces: runs of letters, runs of digits, or single
# punctuation marks (the usual pre-tokenizer split)
BPE_TOKEN_RE = r"([A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-z0-9À-ɏ])"


def _words(text) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def token_count_ws(text) -> Column:
    """Whitespace token count."""
    return F.size(_words(text)).cast("long")


def token_count_bpe(text) -> Column:
    """BPE-ish regex token count (letters / digits / punctuation pieces)."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE))).cast("long")


def stopword_ratio(text, stopwords: list[str] | None = None) -> Column:
    words = _words(text)
    stops = stopwords or EN_STOPWORDS
    n_stop = F.size(F.filter(words, lambda w: F.lower(w).isin(stops)))
    return F.when(F.size(words) > 0, n_stop / F.size(words)).otherwise(F.lit(0.0))


def punct_ratio(text) -> Column:
    c = text if isinstance(text, Column) else F.col(text)
    n_punct = F.length(F.regexp_replace(c, r"[^\.,;:!\?]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def quality_score(text) -> Column:
    """[0,1] heuristic: long enough, some stopwords, not punctuation soup.
    The component weights mirror common pretrain-filter recipes."""
    words = _words(text)
    n = F.size(words)
    mean_len = F.when(n > 0, F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n).otherwise(F.lit(0.0))
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.3))
    word_len_ok = F.when((mean_len >= 2.5) & (mean_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.4))
    stop_ok = F.when(stopword_ratio(text) >= 0.01, F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.4))
    return F.round(0.3 * len_ok + 0.2 * word_len_ok + 0.3 * stop_ok + 0.2 * punct_ok, 4)


def lang_guess(text) -> Column:
    """Stopword-vote language ID (en/de/es/other). For real pipelines this
    would be a fastText-style model in a pandas UDF; the heuristic keeps
    the operator JVM-side and deterministic."""
    words = _words(text)
    low = F.transform(words, F.lower)

    def hits(stops: list[str]) -> Column:
        return F.size(F.filter(low, lambda w: w.isin(stops)))

    en, de, es = hits(EN_STOPWORDS), hits(DE_STOPWORDS), hits(ES_STOPWORDS)
    best = F.greatest(en, de, es)
    return (
        F.when(best == 0, F.lit("other"))
        .when(best == en, F.lit("en"))
        .when(best == de, F.lit("de"))
        .otherwise(F.lit("es"))
    )


def doc_fingerprint(text) -> Column:
    """Order-sensitive 62-bit rolling hash over word tokens.

    Two independent 31-bit modular streams (mod Mersenne prime 2^31-1,
    multipliers 31 / 37) folded natively and packed into one long —
    staying under 2^42 per step so ANSI-mode long arithmetic never
    overflows. Equal word *sequences* (not just sets) collide.
    """
    words = _words(text)
    m = F.lit((1 << 31) - 1).cast("long")
    hashes = F.transform(words, lambda w: F.pmod(F.xxhash64(w), m))

    def stream(mult: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: F.pmod(acc * F.lit(mult).cast("long") + h, m),
        )

    return stream(31) * F.lit(1 << 31).cast("long") + stream(37)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass stats projection used by the pipeline entry points."""
    return df.select(
        F.col(id_col),
        token_count_ws(text_col).alias("n_tokens_ws"),
        token_count_bpe(text_col).alias("n_tokens_bpe"),
        F.round(stopword_ratio(text_col), 4).alias("stop_ratio"),
        F.round(punct_ratio(text_col), 4).alias("punct_ratio"),
        quality_score(text_col).alias("quality"),
        lang_guess(text_col).alias("lang_guess"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )
