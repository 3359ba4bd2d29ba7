"""Deterministic, engine-portable hashing primitives.

All content hashing in the engine routes through md5 so results are
reproducible across Spark, DuckDB (oracle checks), and any other engine a
user validates against: Spark's builtin ``hash``/``xxhash64`` are
JVM-specific.

``h60``: the first 15 hex digits of md5 as a non-negative 60-bit BIGINT —
small enough to stay exact in a signed 64-bit int in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def h60(col: Column | str) -> Column:
    """60-bit md5-derived hash (Spark side).
    DuckDB equivalent: ``('0x' || substr(md5(x),1,15))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_seeded(col: Column | str, seed: Column | int) -> Column:
    """Seeded variant: one independent-ish hash family member per seed —
    the MinHash permutation trick."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(seed) if isinstance(seed, int) else seed
    return h60(F.concat_ws("#", c, s.cast("string")))


def char_shingles_expr(text_col: str, n: int = 5) -> Column:
    """Distinct character n-grams of a string column, as an array.
    Stays fully JVM-side (transform over sequence — no UDF; substring with
    a dynamic start requires the expr form).

    Texts shorter than n yield an EMPTY array: Spark's
    ``sequence(1, len-n+1)`` would otherwise count DOWN for short texts
    (sequence(1,0) == [1,0]) and emit junk shingles — DuckDB's
    generate_series returns empty there, so the guard is also what keeps
    the two engines' shingle sets identical."""
    return F.expr(
        f"CASE WHEN length({text_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, length({text_col}) - {n - 1}),"
        f" i -> substring({text_col}, i, {n}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def word_tokens(text_col: str) -> Column:
    """Non-empty whitespace tokens."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def word_ngrams_expr(text_col: str, n: int) -> Column:
    """Distinct word n-grams (space-joined) of a text column, as an array.

    Uses the let-binding idiom — ``transform`` over a 1-element array
    binds the ``split`` ONCE per row.  Writing ``slice(split(text), i,
    n)`` inside the per-gram lambda would re-split the text for every
    gram (O(words²) per document: Spark's subexpression elimination does
    not reach inside higher-order-function lambdas), which profiling
    showed dominating the corpus n-gram queries."""
    return F.expr(
        f"flatten(transform(array(split({text_col}, ' ')), ws -> "
        f"CASE WHEN size(ws) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(ws) - {n - 1}), "
        f"i -> array_join(slice(ws, i, {n}), ' '))) "
        f"ELSE CAST(array() AS array<string>) END))"
    )


def explode_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """(id, shingle) rows — the inverted-index input for Jaccard/MinHash."""
    return df.select(
        F.col(id_col), F.explode(char_shingles_expr(text_col, n)).alias("g")
    )
