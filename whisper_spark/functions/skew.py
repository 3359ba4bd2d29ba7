"""Skew mitigation for shuffle joins.

AQE's skew-join splitting (on by default in ``session.get_spark``)
handles sort-merge skew at runtime; explicit salting is the static
fallback for engines/plans AQE can't rewrite (e.g. a shuffle-hash join
inside a streaming query, or a deployment with AQE off).  The technique:
scatter the big side's hot keys across ``n_salt`` sub-keys and replicate
the small side once per salt, turning one oversized shuffle partition
into ``n_salt`` bounded ones at the cost of duplicating the small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the ``large`` side may carry skewed keys.

    The large side gets a deterministic per-row salt (hash of the full
    row, so re-runs shuffle identically); the small side is exploded
    ``n_salt``-fold so every (key, salt) pair finds its match.  Output
    equals ``large.join(small, on, how)`` exactly.

    Cost model: small side state x ``n_salt`` vs the hot key's rows / 
    ``n_salt`` per task — pick ``n_salt`` around hot-partition-bytes /
    target-partition-bytes.  Rows that are full duplicates hash to the
    same salt (they cannot be told apart); distinct-valued rows under a
    hot key scatter uniformly.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(n_salt))
    l_ = large.withColumn("_salt", salt)
    s_ = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l_.join(s_, [*keys, "_salt"], how).drop("_salt")
