"""Text-analysis operators: language-ID, quality scoring, token counting,
fingerprinting.  All pure column expressions (whole-stage codegen; no
Python in the hot path), so they compose with filters/joins and scan at
parquet speed on any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import word_tokens

#: marker tokens per language for the n-gram heuristic; extend freely.
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", " the "),
    ("de", " der "),
    ("es", " el "),
    ("fr", " le "),
    ("zh", " de "),
]

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Append a predicted-language column: counts of per-language marker
    tokens, priority-ordered argmax (deterministic ties)."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    counts = {
        lang: (
            (F.length(padded) - F.length(F.replace(padded, F.lit(m)))) / F.lit(len(m))
        ).cast("long")
        for lang, m in LANG_MARKERS
    }
    mx = F.greatest(*counts.values())
    expr = None
    for lang, cnt in counts.items():
        cond = cnt == mx
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return df.withColumn(out_col, expr)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_tokens (whitespace), n_bpe_est (~chars/4, the BPE-ish
    estimate), avg_tok_len."""
    toks = word_tokens(text_col)
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("n_bpe_est", F.ceil(F.length(text_col) / 4.0).cast("long"))
        .withColumn(
            "avg_tok_len",
            F.length(F.regexp_replace(text_col, " ", "")) * 1.0 / F.size(toks),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text", out_col: str = "score") -> DataFrame:
    """Append a [0,1] quality score: stopword ratio + length + token
    shape.  Deliberately simple and fully declarative — swap the formula,
    keep the shape."""
    toks = word_tokens(text_col)
    stop_toks = F.filter(
        F.split(F.col(text_col), " "), lambda x: x.isin(*STOPWORDS)
    )
    n = F.size(toks)
    stop_ratio = F.size(stop_toks) * F.lit(1.0) / n
    avg_len = F.length(F.regexp_replace(text_col, " ", "")) * 1.0 / n
    score = (
        0.4 * stop_ratio
        + 0.3 * F.when(n >= 20, F.lit(1.0)).otherwise(n / F.lit(20.0))
        + 0.3 * F.when((avg_len >= 3) & (avg_len <= 8), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return df.withColumn("stop_ratio", stop_ratio).withColumn(out_col, score)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Append a normalized content fingerprint (md5 of lower/trim) —
    engine-portable (see functions.hashing)."""
    return df.withColumn(out_col, F.md5(F.lower(F.trim(F.col(text_col)))))
