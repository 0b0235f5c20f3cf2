"""Text column-expression builders (JVM-only, no UDFs).

Everything here returns ``pyspark.sql.Column`` trees built from
built-in functions, so the hot path stays inside whole-stage codegen
and the same arithmetic is expressible 1:1 in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: str = "text") -> Column:
    """Lowercase, trim, collapse whitespace — the canonical form used
    by exact dedup and fingerprinting."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of the trimmed text."""
    return F.split(F.trim(F.col(col)), r"\s+")


def word_set(col: str = "text") -> Column:
    """Distinct lowercase token set (the 1-gram shingle set) —
    dedup shingling is case-insensitive by convention."""
    return F.array_distinct(F.split(F.lower(F.trim(F.col(col))), r"\s+"))


def word_ngrams(tokens_col: str, n: int) -> Column:
    """Distinct word n-gram shingles from a token-array column.
    Caller must guarantee ``size(tokens) >= n``."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, size({tokens_col}) - {n - 1}),"
            f" i -> concat_ws(' ', slice({tokens_col}, i, {n})))"
        )
    )


def char_ngram_hashes(
    norm_col: str, n: int = 8, cap: int = 1000, stride: int = 4
) -> Column:
    """md5 of char n-grams of the (capped) normalized text, sampled
    every `stride` positions — the raw material for bottom-k
    fingerprints. Striding keeps one hash per `stride` chars
    (winnowing-style density) at 1/stride the hash cost; bottom-k
    over the sampled set is equally order-invariant."""
    return F.expr(
        f"transform(sequence(1, greatest(length(substring({norm_col}, 1, {cap})) - {n - 1}, 1), {stride}),"
        f" i -> md5(substring(substring({norm_col}, 1, {cap}), i, {n})))"
    )


def count_matches(col: str, pattern: str) -> Column:
    """Number of characters matching a regex class (global replace
    delta — identical semantics to DuckDB's regexp_replace 'g')."""
    return F.length(F.col(col)) - F.length(F.regexp_replace(F.col(col), pattern, ""))


def stopword_hits(tokens_col: str, words: tuple[str, ...]) -> Column:
    """Occurrences (not distinct types) of any of `words` in the
    token array."""
    quoted = ",".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({tokens_col}, t -> t IN ({quoted})))")
