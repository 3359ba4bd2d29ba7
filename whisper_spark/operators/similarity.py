"""Similarity search over embedding columns (``array<float>``).

Two tiers, matching how ANN systems scale:

* :func:`cosine_topk` — exact brute force.  The query set is broadcast;
  the corpus streams through one narrow projection + windowed top-k.
  Right answer for <= a few thousand queries against any corpus size
  (work is one corpus scan), and the verification oracle for the ANN path.
* :func:`ivf_topk` — IVF-style: corpus bucketed by nearest coarse
  centroid (a broadcast join against <= a few thousand centroids); a
  query probes only its ``nprobe`` nearest buckets.  Corpus scan shrinks
  by ~n_buckets/nprobe; the bucket assignment is precomputable and
  persistable (partition the corpus table by ``centroid`` and Catalyst
  prunes buckets at scan time).

All kernels are built-in expressions (zip_with/aggregate folds) — no
Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sqnorm(c: str):
    return F.aggregate(
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, nid, rank, score): exact top-k by cosine, ties broken by id.

    ``queries``/``corpus`` both carry (id_col, emb_col); a query never
    matches itself."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(emb_col).alias("qe"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(emb_col).alias("ce"))
    j = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            (_dot("qe", "ce") / F.sqrt(_sqnorm("qe") * _sqnorm("ce"))).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "score")
    )


def seed_centroids(
    corpus: DataFrame,
    n_buckets: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic coarse centroids: the ``n_buckets`` corpus vectors
    with the smallest ids.  (Swap in KMeans offline for better recall —
    the bucketing contract (cid, ce) is the same.)"""
    return (
        corpus.orderBy(id_col)
        .limit(n_buckets)
        .select(F.col(id_col).alias("cid"), F.col(emb_col).alias("ce"))
    )


def ivf_assign(
    corpus: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_buckets: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(id, centroid, dist2): nearest-centroid assignment — IVF coarse
    quantization.  Broadcast the centroids; one corpus scan."""
    cent = centroids if centroids is not None else seed_centroids(corpus, n_buckets, emb_col, id_col)
    d2 = F.aggregate(
        F.zip_with(
            emb_col, "ce",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    j = corpus.crossJoin(F.broadcast(cent)).select(
        F.col(id_col), F.col("cid"), d2.alias("dist2")
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "cid")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("cid").alias("centroid"), "dist2")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    n_buckets: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(qid, nid, rank, score): approximate top-k — each query scans only
    its ``nprobe`` nearest IVF buckets instead of the whole corpus."""
    cent = centroids if centroids is not None else seed_centroids(corpus, n_buckets, emb_col, id_col)
    cent = cent.persist()
    assigned = ivf_assign(corpus, emb_col, id_col, n_buckets, centroids=cent)
    bucketed = corpus.join(assigned.select(id_col, "centroid"), id_col)

    # probe set per query: its nprobe nearest centroids
    qd2 = F.aggregate(
        F.zip_with(
            "qe", "ce",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(emb_col).alias("qe"))
    wq = Window.partitionBy("qid").orderBy("qd2", "cid")
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("qid", "qe", "cid", qd2.alias("qd2"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "qe", F.col("cid").alias("centroid"))
    )

    c = bucketed.select(
        F.col(id_col).alias("nid"), F.col(emb_col).alias("ce"), "centroid"
    )
    j = (
        F.broadcast(probes)
        .join(c, "centroid")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            (_dot("qe", "ce") / F.sqrt(_sqnorm("qe") * _sqnorm("ce"))).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "score")
    )
