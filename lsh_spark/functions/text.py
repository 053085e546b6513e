"""Text-analysis functions for training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` column
expressions — no Python UDFs — so the whole pipeline stays inside
whole-stage codegen and scales linearly with executors.  Each function
returns a ``Column`` and has an exact DuckDB-SQL twin used by the oracle
queries (the token regex is restricted to a subset with identical
semantics in Java regex and RE2).

Functions:
  * ``tokens`` / ``token_count`` — whitespace tokenization
  * ``word_tokens`` / ``word_token_count`` — BPE-ish lexical tokens
    (letter runs | digit runs | single non-space symbol)
  * ``stopword_ratio`` — fraction of tokens in a fixed stopword list
  * ``punct_ratio``, ``digit_ratio``, ``upper_ratio`` — char-class ratios
  * ``quality_score`` — composite [0,1] heuristic
  * ``lang_guess`` — deterministic rule: CJK-char ratio, then marker
    stopwords
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed, ordered stopword list (kept tiny so the SQL twin is identical)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this", "be",
)

# identical meaning in Java regex (Spark) and RE2 (DuckDB)
WORD_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
_PUNCT_RE = "[^A-Za-z0-9\\s]"
_DIGIT_RE = "[0-9]"
_UPPER_RE = "[A-Z]"
_CJK_RE = "[\\u4e00-\\u9fff]"

SPANISH_MARKERS = ("el", "la", "los", "las", "de", "que", "es", "un", "una", "y")


def tokens(col) -> Column:
    """Whitespace tokens (empty string → empty array)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, "\\s+"))


def token_count(col) -> Column:
    return F.size(tokens(col))


def word_token_count(col) -> Column:
    """BPE-ish lexical token count: letter runs, digit runs, single
    symbols."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.regexp_count(c, F.lit(WORD_TOKEN_RE)), F.lit(0))


def char_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(0.0))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _ratio(F.regexp_count(c, F.lit(_PUNCT_RE)), F.length(c))


def digit_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _ratio(F.regexp_count(c, F.lit(_DIGIT_RE)), F.length(c))


def upper_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _ratio(F.regexp_count(c, F.lit(_UPPER_RE)), F.length(c))


def stopword_ratio(col) -> Column:
    """Fraction of whitespace tokens that are stopwords (case-insensitive;
    multiplicity counts, hence filter rather than array_intersect)."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return _ratio(n_stop, F.size(toks))


def avg_token_len(col) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return _ratio(total, F.size(toks))


def quality_score(col) -> Column:
    """Composite quality heuristic in [0,1]: rewards moderate length,
    low punctuation/digit density, presence of stopwords (prose-ness)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4)
    digit_pen = F.greatest(F.lit(0.0), F.lit(1.0) - digit_ratio(c) * 4)
    stop_score = F.least(stopword_ratio(c) * 4, F.lit(1.0))
    return F.round(
        len_score * 0.25 + punct_pen * 0.25 + digit_pen * 0.25
        + stop_score * 0.25, 6)


def lang_guess(col) -> Column:
    """Deterministic language rule: CJK ratio > 0.3 → 'zh'; Spanish marker
    ratio > 0.15 → 'es'; else 'en'."""
    c = F.col(col) if isinstance(col, str) else col
    cjk = _ratio(F.regexp_count(c, F.lit(_CJK_RE)), F.length(c))
    toks = tokens(F.lower(c))
    marker_arr = F.array(*[F.lit(s) for s in SPANISH_MARKERS])
    es_ratio = _ratio(
        F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))),
        F.size(toks))
    return (
        F.when(cjk > 0.3, F.lit("zh"))
        .when(es_ratio > 0.15, F.lit("es"))
        .otherwise(F.lit("en"))
    )


def compression_ratio(col) -> Column:
    """zlib-compressibility quality signal (Gopher's compression-ratio
    heuristic: highly repetitive text compresses far below natural
    prose): ``deflated_size / utf8_size``, rounded to 6dp; empty/NULL
    text → NULL.  Runs as an Arrow-batched pandas UDF (zlib is not
    SQL-expressible, so this feature is pytest-pinned against the
    python reference rather than oracle-checked; level is FIXED at 6 —
    zlib output is deterministic for a given level and input)."""
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _udf(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None or len(t) == 0:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(round(len(zlib.compress(raw, 6)) / len(raw), 6))
        return pd.Series(out, dtype="float64")

    return _udf(F.col(col) if isinstance(col, str) else col)
