"""Similarity search over embedding columns (``array<float>``).

Two tiers, matching how ANN systems scale:

* :func:`cosine_topk` — exact brute force.  The query set is broadcast;
  the corpus streams through one narrow projection + windowed top-k.
  Right answer for <= a few thousand queries against any corpus size
  (work is one corpus scan), and the verification oracle for the ANN path.
* :func:`ivf_topk` — IVF-style: corpus bucketed by nearest coarse
  centroid; a query probes only its ``nprobe`` nearest buckets.  Corpus
  scan shrinks by ~n_buckets/nprobe; the bucket assignment is
  precomputable and persistable (partition the corpus table by
  ``centroid`` and Catalyst prunes buckets at scan time).

Centroid assignment strategy: the centroid set is small by contract, so
it is collected once and inlined as a LITERAL array column — assignment
becomes ``array_min`` over per-centroid ``(dist2, cid)`` structs, a
narrow projection with NO shuffle and no per-side recompute when the
result feeds a self-join.  (The previous design — crossJoin against
broadcast centroids + a row_number window partitioned by vector id —
shuffled n_buckets× the corpus, twice for self-joins.)  Above
``LITERAL_FLOATS_MAX`` inlined floats the plan would bloat, so large
centroid sets fall back to that broadcast-join path automatically.

All kernels are built-in expressions (zip_with/aggregate folds) — no
Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: above this many inlined floats (n_buckets * dim) the literal-array
#: assignment falls back to the broadcast-join form
LITERAL_FLOATS_MAX = 65536


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


def _dist2(a, b) -> Column:
    """Squared L2 between two array columns, folded in element order
    (bit-identical to the DuckDB oracle's list_sum/list_transform)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


#: above this many query rows, cosine_topk refuses to broadcast the
#: query side (a silent driver OOM waiting to happen) and falls back to
#: a shuffled cross join
COSINE_TOPK_BROADCAST_LIMIT = 100_000


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    broadcast_limit: int = COSINE_TOPK_BROADCAST_LIMIT,
) -> DataFrame:
    """(qid, nid, rank, score): exact top-k by cosine, ties broken by id.

    ``queries``/``corpus`` both carry (id_col, emb_col); a query never
    matches itself.  Intended for ≤ a few thousand queries against one
    corpus scan — the contract is ENFORCED, not just documented: if the
    query side exceeds ``broadcast_limit`` rows (one cheap count against
    limit+1, not a full count), the broadcast hint is dropped so Spark
    plans a shuffled join instead of silently OOMing the driver.  For
    genuinely large query sets use :func:`ivf_topk_indexed` (bucketed,
    partition-pruned) instead of exact all-pairs."""
    # norms fold ONCE per row on each side (qn before the broadcast, cn on
    # the corpus scan) instead of once per (q, c) pair inside the join —
    # at scale that is corpus+queries folds instead of corpus*queries
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(emb_col).alias("qe")
    ).withColumn("qn", _sqnorm("qe"))
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(emb_col).alias("ce")
    ).withColumn("cn", _sqnorm("ce"))
    small_enough = (
        broadcast_limit is None
        or len(q.select("qid").limit(broadcast_limit + 1).take(broadcast_limit + 1))
        <= broadcast_limit
    )
    qh = F.broadcast(q) if small_enough else q
    j = (
        qh
        .join(c, F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            (_dot("qe", "ce") / F.sqrt(F.col("qn") * F.col("cn"))).alias("score"),
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


#: finished (literal-column, n_floats) per (applicationId, centroid-plan
#: semanticHash) — the ONE driver collect in the IVF path.  Every probed
#: query otherwise repeats the same <= n_buckets-row collect job (and the
#: literal build): at the bench's per-query granularity that is ~half the
#: wall time, and across the assign/topk/recall/bucket-stats family it is
#: pure repeat work.  Keyed by plan semantics, so a different
#: path/filter/bucket count misses; a same-session rewrite of the
#: underlying table is NOT detected (index metadata semantics — rebuild
#: via a fresh session or ``build_ivf_index``, which persists centroids
#: explicitly).
_CENTROID_ROWS_CACHE: dict[tuple, tuple] = {}


def centroid_literal(centroids: DataFrame) -> tuple[Column | None, int]:
    """Collect the (small-by-contract) centroid set and inline it as a
    literal ``array<struct<cid,ce>>`` column.  Returns ``(column,
    n_floats)``; column is None when the set exceeds
    :data:`LITERAL_FLOATS_MAX` and the caller should use the
    broadcast-join fallback."""
    elem_type = centroids.schema["ce"].dataType.simpleString()
    sel = centroids.select("cid", "ce").orderBy("cid")
    try:
        key = (
            centroids.sparkSession.sparkContext.applicationId,
            sel.semanticHash(),
        )
    except Exception:  # pragma: no cover - connect-mode etc.
        key = None
    cached = _CENTROID_ROWS_CACHE.get(key) if key is not None else None
    if cached is not None:
        return cached
    rows = sel.collect()
    n_floats = sum(len(r["ce"]) for r in rows)
    if not rows or n_floats > LITERAL_FLOATS_MAX:
        if key is not None:
            _CENTROID_ROWS_CACHE[key] = (None, n_floats)
        return None, n_floats
    # Two SINGLE constant nodes (array<bigint> + array<array<float>>), not
    # a CreateArray of n_buckets*dim scalar literals: the plan carries two
    # array objects instead of ~10^3 constant expression nodes.  Built via
    # from_json of ONE string — a nested-list F.lit ships every float as
    # its own py4j call (~0.9 s at 16x64; measured), from_json is one
    # string and ConstantFolding collapses it to the same Literal in the
    # optimized plan.  json round-trip is exact: python float repr
    # round-trips float64, and double -> float32 of an exact float32
    # value is the identity.
    import json

    cids = F.from_json(
        F.lit(json.dumps([int(r["cid"]) for r in rows])), "array<bigint>"
    )
    vecs = F.from_json(
        F.lit(json.dumps([[float(x) for x in r["ce"]] for r in rows])),
        f"array<{elem_type}>",
    )
    arr = F.transform(
        F.sequence(F.lit(1), F.lit(len(rows))),
        lambda i: F.struct(
            F.element_at(cids, i).alias("cid"),
            F.element_at(vecs, i).alias("ce"),
        ),
    )
    if key is not None:
        _CENTROID_ROWS_CACHE[key] = (arr, n_floats)
    return arr, n_floats


def centroid_scores(emb_col: str, cent_arr: Column) -> Column:
    """array<struct<dist2,cid>>: squared distance of ``emb_col`` to every
    inlined centroid; struct order makes (dist2 asc, cid asc) the sort
    key, so ``array_min`` = nearest assignment and
    ``slice(array_sort(..), 1, nprobe)`` = probe set."""
    return F.transform(
        cent_arr,
        lambda c: F.struct(
            _dist2(F.col(emb_col), c["ce"]).alias("dist2"),
            c["cid"].alias("cid"),
        ),
    )


def _assign_join(
    corpus: DataFrame, emb_col: str, id_col: str, cent: DataFrame
) -> DataFrame:
    """Fallback assignment for centroid sets too large to inline:
    crossJoin against the broadcast centroids + per-id window."""
    j = corpus.crossJoin(F.broadcast(cent)).select(
        F.col(id_col), F.col("cid"), _dist2(F.col(emb_col), F.col("ce")).alias("dist2")
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "cid")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("cid").alias("centroid"), "dist2")
    )


def ivf_assign(
    corpus: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_buckets: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(id, centroid, dist2): nearest-centroid assignment — IVF coarse
    quantization as one narrow corpus scan (literal centroids), falling
    back to broadcast-join + window above :data:`LITERAL_FLOATS_MAX`."""
    cent = centroids if centroids is not None else seed_centroids(corpus, n_buckets, emb_col, id_col)
    cent_arr, _ = centroid_literal(cent)
    if cent_arr is None:
        return _assign_join(corpus, emb_col, id_col, cent)
    best = F.array_min(centroid_scores(emb_col, cent_arr))
    return corpus.select(
        F.col(id_col),
        best["cid"].alias("centroid"),
        best["dist2"].alias("dist2"),
    )


def train_ivf(
    corpus: DataFrame,
    n_buckets: int = 16,
    rounds: int = 2,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd-trained coarse centroids: ``rounds`` k-means iterations in
    the EXACT integer domain (the emb_kmeans2 convention — vectors
    quantize to ``floor(x*1000)`` longs, centroid updates are floor-div
    means), seeded from the ``n_buckets`` smallest-id vectors.

    Returns the same ``(cid, ce)`` contract as :func:`seed_centroids`
    (``ce`` scaled back to double, ``cid`` = the seed's id), so it
    drops into :func:`ivf_assign` / :func:`ivf_topk` /
    :func:`build_ivf_index` unchanged.  Integer arithmetic makes
    training bit-reproducible AND oracle-mirrorable (DuckDB unrolls the
    identical rounds — see the emb_ivf_recall_trained query).  Between
    rounds only the k x dim centroid table is driver-collected and
    re-inlined as literals; each round is one narrow assignment
    projection plus one posexplode aggregation.

    Trained centroids fix what seeding cannot: seeds drawn from the
    first ids land wherever those vectors happen to sit, leaving hot,
    wide buckets (straggler probes, poor recall per probe); Lloyd
    rounds move them toward cluster means, tightening buckets and
    raising recall at the same nprobe.  Clusters that lose all members
    drop out deterministically."""
    qv = corpus.select(
        F.col(id_col),
        F.transform(
            emb_col, lambda x: F.floor(x.cast("double") * 1000).cast("long")
        ).alias("q"),
    )
    cent_rows = sorted(
        (int(r[id_col]), [int(x) for x in r["q"]])
        for r in qv.orderBy(id_col).limit(n_buckets).collect()
    )

    def assign(rows):
        # centroids inline as ONE from_json literal (2 plan nodes at any
        # k — the centroid_literal trick, integer domain), never k x dim
        # individual literal nodes: at n_buckets=1000 the naive form is
        # a 64k-node plan
        import json

        cents = F.from_json(
            F.lit(json.dumps([{"k": k, "cq": cq} for k, cq in rows])),
            "array<struct<k:int,cq:array<long>>>",
        )
        scored = F.transform(
            cents,
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with("q", c["cq"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                c["k"].alias("k"),
            ),
        )
        # struct order (d, k): array_min = nearest centroid, ties to
        # the lower cid — matching the oracle's ORDER BY dist, cid
        return qv.select("q", F.array_min(scored)["k"].alias("k"))

    for _ in range(rounds):
        upd = (
            assign(cent_rows)
            .select("k", F.posexplode("q").alias("i", "qi"))
            .groupBy("k", "i")
            .agg(F.floor(F.sum("qi") / F.count("*")).cast("long").alias("val"))
            .groupBy("k")
            .agg(F.array_sort(F.collect_list(F.struct("i", "val"))).alias("p"))
            .select("k", F.transform("p", lambda x: x["val"]).alias("q"))
        )
        cent_rows = sorted(
            (int(r["k"]), [int(x) for x in r["q"]]) for r in upd.collect()
        )
    return corpus.sparkSession.createDataFrame(
        [(k, [v / 1000.0 for v in q]) for k, q in cent_rows],
        "cid long, ce array<double>",
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_buckets: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    train_rounds: int = 2,
) -> None:
    """Persist an IVF index: the corpus written as parquet PARTITIONED BY
    its coarse-quantization bucket, plus the centroid table.

    Centroids default to :func:`train_ivf` (``train_rounds`` exact-
    integer Lloyd rounds — tighter buckets, higher recall per probe
    than raw seeds); pass ``centroids=`` to supply your own, or
    ``train_rounds=0`` for the bare smallest-id seeds.

    This is the 100 TB search layout: a probe query then reads only its
    ``nprobe`` bucket directories — Catalyst partition pruning, verified
    by ``PartitionFilters`` in the scan (see
    tests/test_operators.py::test_ivf_indexed_pruning) — instead of
    re-bucketing the corpus per query."""
    if centroids is not None:
        cent = centroids
    elif train_rounds > 0:
        cent = train_ivf(corpus, n_buckets, train_rounds, emb_col, id_col)
    else:
        cent = seed_centroids(corpus, n_buckets, emb_col, id_col)
    assigned = ivf_assign(corpus, emb_col, id_col, n_buckets, centroids=cent)
    bucketed = corpus.join(
        assigned.select(id_col, "centroid"), id_col
    )
    (
        bucketed.write.partitionBy("centroid")
        .mode("overwrite")
        .parquet(f"{path}/vectors")
    )
    cent.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, nid, rank, score) against a :func:`build_ivf_index` layout.

    The probe set's distinct bucket ids (<= n_buckets values) are
    collected and pushed as a literal IN predicate on the PARTITION
    column, so the scan touches only the probed bucket directories."""
    cent = spark.read.parquet(f"{path}/centroids")
    cent_arr, _ = centroid_literal(cent)
    q = queries.select(F.col(id_col).alias("qid"), F.col(emb_col).alias("qe"))
    if cent_arr is not None:
        probes = q.select(
            "qid",
            "qe",
            F.explode(
                F.slice(F.array_sort(centroid_scores("qe", cent_arr)), 1, nprobe)
            ).alias("p"),
        ).select("qid", "qe", F.col("p.cid").alias("centroid"))
    else:  # huge centroid set: broadcast-join probe selection
        wq = Window.partitionBy("qid").orderBy("qd2", "cid")
        probes = (
            q.crossJoin(F.broadcast(cent))
            .select("qid", "qe", "cid", _dist2(F.col("qe"), F.col("ce")).alias("qd2"))
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= nprobe)
            .select("qid", "qe", F.col("cid").alias("centroid"))
        )
    # collecting the distinct bucket ids costs one extra pass over the
    # (tiny, narrow) probe projection — cheaper than persisting it, and
    # it buys the literal IN that prunes the corpus scan to nprobe dirs
    probe_cids = [
        int(r["centroid"]) for r in probes.select("centroid").distinct().collect()
    ]
    corpus = spark.read.parquet(f"{path}/vectors").filter(
        F.col("centroid").isin(probe_cids)  # literal IN -> partition pruning
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(emb_col).alias("ce"), "centroid"
    ).withColumn("cn", _sqnorm("ce"))
    j = (
        F.broadcast(probes.withColumn("qn", _sqnorm("qe")))
        .join(c, "centroid")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            (_dot("qe", "ce") / F.sqrt(F.col("qn") * F.col("cn"))).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "score")
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
    its ``nprobe`` nearest IVF buckets instead of the whole corpus.

    With inlined centroids both the corpus bucketing and the per-query
    probe selection are narrow projections; the only shuffle-bearing
    steps are the probe->bucket broadcast join and the final top-k."""
    cent = centroids if centroids is not None else seed_centroids(corpus, n_buckets, emb_col, id_col)
    cent_arr, _ = centroid_literal(cent)
    q = queries.select(F.col(id_col).alias("qid"), F.col(emb_col).alias("qe"))

    if cent_arr is not None:
        bucketed = corpus.withColumn(
            "centroid", F.array_min(centroid_scores(emb_col, cent_arr))["cid"]
        )
        probes = q.select(
            "qid",
            "qe",
            F.explode(
                F.slice(F.array_sort(centroid_scores("qe", cent_arr)), 1, nprobe)
            ).alias("p"),
        ).select("qid", "qe", F.col("p.cid").alias("centroid"))
    else:
        assigned = ivf_assign(corpus, emb_col, id_col, n_buckets, centroids=cent)
        bucketed = corpus.join(assigned.select(id_col, "centroid"), id_col)
        wq = Window.partitionBy("qid").orderBy("qd2", "cid")
        probes = (
            q.crossJoin(F.broadcast(cent))
            .select("qid", "qe", "cid", _dist2(F.col("qe"), F.col("ce")).alias("qd2"))
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= nprobe)
            .select("qid", "qe", F.col("cid").alias("centroid"))
        )

    c = bucketed.select(
        F.col(id_col).alias("nid"), F.col(emb_col).alias("ce"), "centroid"
    ).withColumn("cn", _sqnorm("ce"))
    j = (
        F.broadcast(probes.withColumn("qn", _sqnorm("qe")))
        .join(c, "centroid")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid", "nid",
            (_dot("qe", "ce") / F.sqrt(F.col("qn") * F.col("cn"))).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "score")
    )


def quantize_int8(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = floor(x_i * 127 /
    amax + 0.5)`` with ``amax = max(|x|)`` (zero vectors quantize to all
    zeros).  The training-pipeline compression step before ANN shipping.

    floor(x + 0.5) is used instead of round() because engines disagree on
    half-even vs half-up rounding; the floor form is pure IEEE arithmetic
    and bit-identical everywhere.  Output is (id, amax, qvec) — a narrow
    map over the scan, no shuffle, no Python.
    """
    x = F.col(emb_col)
    amax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    q = F.when(amax == 0.0, F.transform(x, lambda v: F.lit(0).cast("long"))).otherwise(
        F.transform(
            x,
            lambda v: F.floor(v.cast("double") * F.lit(127.0) / amax + F.lit(0.5)),
        )
    )
    return df.select(
        F.col(id_col),
        amax.alias("amax"),
        q.alias("qvec"),
    )


# --------------------------------------------------------------------- #
# product quantization (PQ) with asymmetric-distance (ADC) search
# --------------------------------------------------------------------- #
#
# The memory-scale ANN tier: each vector compresses to n_sub codebook
# indices (n_sub bytes at n_codes<=256), and search scores candidates by
# summing per-subspace query->centroid distance-table lookups instead of
# touching the raw vectors.  Everything here runs on INTEGER-quantized
# vectors (floor(x*1000)), so codes, distance tables, and ADC scores are
# exact integer arithmetic — bit-reproducible in any engine, which is
# what lets the DuckDB oracle check the whole pipeline.


def int_quantize(df: DataFrame, emb_col: str = "embedding", out_col: str = "q") -> DataFrame:
    """floor(x*1000) integer quantization (the emb_kmeans2 convention)."""
    return df.withColumn(
        out_col,
        F.transform(emb_col, lambda x: F.floor(x.cast("double") * 1000).cast("long")),
    )


def pq_codebook(
    corpus_q: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    q_col: str = "q",
    dim: int | None = None,
) -> DataFrame:
    """Seeded PQ codebook: subspace s's codes are the sub-vectors of the
    first ``n_codes`` corpus vectors (deterministic; swap in Lloyd-trained
    centroids — see the emb_kmeans2 query — without changing the search).

    ``dim``: the vector dimensionality, when the caller already knows it
    — skips the one-row discovery collect (a whole Spark job when these
    stages chain, e.g. emb_pq_recall pays it twice otherwise).

    Returns a TINY DataFrame (n_sub * n_codes rows): (s, code, cq)."""
    if dim is None:
        dim_df = corpus_q.select(F.size(q_col).alias("d")).limit(1)
        dim = dim_df.collect()[0]["d"]
    sub_len = dim // n_sub
    seeds = corpus_q.filter(F.col(id_col) < n_codes).select(
        F.col(id_col).alias("code"), q_col
    )
    subs = seeds.select(
        "code",
        q_col,
        F.explode(
            F.array(*[F.lit(s) for s in range(n_sub)])
        ).alias("s"),
    ).select(
        "s",
        "code",
        F.expr(f"slice({q_col}, s * {sub_len} + 1, {sub_len})").alias("cq"),
    )
    return subs


def pq_encode(
    corpus_q: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    q_col: str = "q",
) -> DataFrame:
    """Assign each vector its per-subspace nearest code: (id, s, code).

    One broadcast join against the tiny codebook + a min_by aggregate —
    shuffle keyed on (id, s), volume = corpus x n_sub rows of 3 ints.
    At 100 TB this is the one-off encode pass whose output (n_sub small
    ints per vector) replaces the raw vectors in the search index."""
    d2 = F.aggregate(
        F.zip_with(
            F.expr(f"slice({q_col}, s * size(cq) + 1, size(cq))"),
            F.col("cq"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        corpus_q.select(F.col(id_col), F.col(q_col))
        .crossJoin(F.broadcast(codebook))
        .select(F.col(id_col), "s", "code", d2.alias("d2"))
    )
    return scored.groupBy(id_col, "s").agg(
        F.min_by("code", F.struct("d2", "code")).alias("code")
    )


def pq_adc_topk(
    queries_q: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    q_col: str = "q",
) -> DataFrame:
    """ADC search: per-query distance tables (query sub-vector -> every
    code, n_sub * n_codes ints per query) joined to the corpus codes and
    summed — candidates are scored WITHOUT touching their raw vectors.

    (qid, nid, rank, adist): top-k by approximate squared L2, ascending,
    ties to lower nid; a query never matches itself.  The codes join
    broadcasts the distance tables (|queries| * n_sub * n_codes rows),
    so the corpus side needs one shuffle keyed on (qid, nid) for the sum."""
    d2 = F.aggregate(
        F.zip_with(
            F.expr(f"slice({q_col}, s * size(cq) + 1, size(cq))"),
            F.col("cq"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dtable = (
        queries_q.select(F.col(id_col).alias("qid"), F.col(q_col))
        .crossJoin(F.broadcast(codebook))
        .select("qid", "s", "code", d2.alias("d"))
    )
    adc = (
        codes.withColumnRenamed(id_col, "nid")
        .join(F.broadcast(dtable), ["s", "code"])
        .filter(F.col("qid") != F.col("nid"))
        .groupBy("qid", "nid")
        .agg(F.sum("d").alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adist"), F.col("nid"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "adist")
    )


def pq_train_round(
    corpus_q: DataFrame,
    codes: DataFrame,
    n_sub: int = 8,
    id_col: str = "vec_id",
    q_col: str = "q",
    dim: int | None = None,
) -> DataFrame:
    """One Lloyd round over the PQ codebook: each (subspace, code)
    centroid moves to the element-wise floor-div mean of its assigned
    sub-vectors — exact integer arithmetic (the emb_kmeans2 convention),
    so training is bit-reproducible.  Codes with no members drop out
    (deterministically, in any engine).

    Returns the updated codebook (s, code, cq).  Iterate as needed; one
    round already roughly doubles ADC recall on the test corpus.
    ``dim``: pass the known dimensionality to skip the discovery collect
    (same contract as :func:`pq_codebook`)."""
    if dim is None:
        dim = corpus_q.select(F.size(q_col).alias("d")).limit(1).collect()[0]["d"]
    sub_len = dim // n_sub
    sub = (
        codes.join(corpus_q.select(id_col, q_col), id_col)
        .select(
            "s",
            "code",
            F.posexplode(F.expr(f"slice({q_col}, s * {sub_len} + 1, {sub_len})")).alias(
                "i", "qi"
            ),
        )
    )
    return (
        sub.groupBy("s", "code", "i")
        .agg(F.floor(F.sum("qi") / F.count("*")).cast("long").alias("val"))
        .groupBy("s", "code")
        .agg(F.array_sort(F.collect_list(F.struct("i", "val"))).alias("pairs"))
        .select("s", "code", F.transform("pairs", lambda p: p["val"]).alias("cq"))
    )


def ivf_residual_assign(
    corpus_q: DataFrame,
    n_coarse: int = 4,
    id_col: str = "vec_id",
    q_col: str = "q",
) -> DataFrame:
    """IVF coarse quantization in the integer domain + residuals:
    (id, cid, r) where ``cid`` is the nearest of ``n_coarse`` seeded
    coarse centroids (integer L2, ties to lower cid) and ``r = q -
    centroid`` elementwise — the input PQ encodes in an IVF-PQ index.

    Residual encoding is what makes PQ codebooks sharp: within a coarse
    cell the residuals are centered near zero, so 16 codes per subspace
    cover them far better than they cover raw vectors.  All integer
    arithmetic — bit-reproducible."""
    cents = corpus_q.filter(F.col(id_col) < n_coarse).select(
        F.col(id_col).alias("cid"), F.col(q_col).alias("_cq0")
    )
    d2 = F.aggregate(
        F.zip_with(q_col, "_cq0", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    asg = (
        corpus_q.crossJoin(F.broadcast(cents))
        .select(F.col(id_col), "cid", d2.alias("_d2"))
        .groupBy(id_col)
        .agg(F.min_by("cid", F.struct("_d2", "cid")).alias("cid"))
    )
    return (
        corpus_q.join(asg, id_col)
        .join(F.broadcast(cents), "cid")
        .select(
            F.col(id_col),
            "cid",
            F.zip_with(q_col, "_cq0", lambda a, b: a - b).alias("r"),
        )
    )


# --------------------------------------------------------------------- #
# signed-random-projection (cosine) LSH
# --------------------------------------------------------------------- #


def srp_planes(bits: int, dim: int) -> list[list[float]]:
    """Deterministic Rademacher hyperplanes for sign-random-projection
    LSH (Charikar 2002): entry (k, d) is +1/-1 from the top bit of
    md5(f"{k}#{d}") — reproducible in any engine that has md5, no RNG
    state.  DuckDB equivalent: ``substr(md5(k || '#' || d), 1, 1)``
    in '89abcdef' -> +1."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{k}#{d}".encode()).hexdigest()[0], 16) >= 8
            else -1.0
            for d in range(dim)
        ]
        for k in range(bits)
    ]


def srp_fingerprints(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 16,
) -> DataFrame:
    """(id, simhash): packed sign-random-projection fingerprint — bit k
    set iff dot(v, plane_k) >= 0.  Cosine-similar vectors agree on most
    bits, so the output feeds :func:`simhash_candidates` directly (the
    column is named ``simhash`` on purpose): banding, candidate joins
    and Hamming verification are shared with the text pipeline.

    One narrow projection per row (the planes inline as a single
    from_json literal, same shape as the centroid path) — zero shuffle,
    so it is also legal on a streaming DataFrame."""
    import json

    probe = df.select(emb_col).first()
    if probe is None:
        # empty input: empty fingerprint frame with the right schema
        return df.select(
            F.col(id_col), F.lit(0).cast("long").alias("simhash")
        ).limit(0)
    dim = len(probe[0])
    planes = F.from_json(
        F.lit(json.dumps(srp_planes(bits, dim))), "array<array<double>>"
    )
    # element-order folds: bit-identical to DuckDB list_sum/list_transform
    dots = F.transform(
        planes,
        lambda p: F.aggregate(
            F.zip_with(
                F.col(emb_col), p, lambda x, r: x.cast("double") * r
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            dots,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            # 2^k via pow: exact in a double up to 2^53, bits <= 60 by
            # the simhash-band contract anyway
            lambda d, k: F.when(
                d >= 0, F.pow(F.lit(2.0), k).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col).alias("doc_id"), packed.alias("simhash")) \
        .withColumnRenamed("doc_id", id_col)


def srp_candidate_pairs(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 16,
    bands: int = 4,
    collapse_identical: bool = True,
) -> DataFrame:
    """(id_a, id_b) cosine-near-dup candidates: vectors whose SRP
    fingerprints collide in >= bands-1 of ``bands`` bit-bands — the
    Charikar-LSH analog of the text pipeline's simhash banding, one
    equi-join, never all-pairs.  ``collapse_identical`` passes through
    to the banding stage (identical-fingerprint mega-bucket guard,
    dedup._collapse_groups; ON by default — at small ``bits`` identical
    fingerprints are common, and a clique over one hot fingerprint is
    exactly the blowup banding exists to avoid)."""
    from .dedup import simhash_candidates

    fp = srp_fingerprints(df, emb_col, id_col, bits)
    return simhash_candidates(
        fp, id_col=id_col, bits=bits, bands=bands,
        collapse_identical=collapse_identical,
    )


# --------------------------------------------------------------------- #
# covariance / PCA
# --------------------------------------------------------------------- #


def embedding_covariance(
    df: DataFrame,
    emb_col: str = "embedding",
    dim: int | None = None,
    id_col: str = "vec_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Population covariance matrix of the embedding column as
    (i, j, cov) rows for the upper triangle (1-based, j >= i).

    No join: each row expands to its d(d+1)/2 upper-triangle products
    via a nested transform (JVM expression).  The moments are
    full-precision float64 — the round-5 fixed-point floor(x*1e12)
    route quantized them at 1e-12 — and bit-deterministic via a
    TWO-LEVEL fold, because a single value-sorted fold per (i, j) would
    buffer the whole corpus per cell (unbounded state at 100 TB):

    * level 1 groups on (i, j, ``id % n_buckets``) and folds each
      bucket's value-sorted array — the data-deterministic bucket key
      caps the buffer at ~rows/n_buckets regardless of partitioning;
    * level 2 folds the n_buckets partial sums in BUCKET ORDER — a
      bounded second aggregation (d^2/2 x n_buckets rows total).

    Both levels are exactly mirrorable in SQL (list_sort folds +
    ``list(p ORDER BY b)``), so cov stays oracle-checkable; at larger
    corpora raise ``n_buckets`` to keep rows/n_buckets in memory."""
    if dim is None:
        probe = df.select(F.size(emb_col).alias("d")).first()
        dim = int(probe["d"])
    cells = df.select(
        F.pmod(F.col(id_col), F.lit(n_buckets)).alias("_b"),
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, {dim}), i -> "
                f"transform(sequence(i, {dim}), j -> struct("
                f"i AS i, j AS j, "
                f"cast(element_at({emb_col}, i) AS double) AS xi, "
                f"cast(element_at({emb_col}, j) AS double) AS xj))))"
            )
        ).alias("c"),
    ).select("_b", "c.i", "c.j", "c.xi", "c.xj")

    from ..functions import folds

    part = cells.groupBy("i", "j", "_b").agg(
        F.count("*").alias("_n"),
        folds.fsum(F.col("xi") * F.col("xj")).alias("_pxy"),
        folds.fsum(F.col("xi")).alias("_pxi"),
        folds.fsum(F.col("xj")).alias("_pxj"),
    )

    def bucket_fold(c: Column) -> Column:
        # fold the bucket partials in bucket order (b unique per group)
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("_b").alias("b"), c.alias("v")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["v"],
        )

    agg = part.groupBy("i", "j").agg(
        F.sum("_n").alias("_n"),
        bucket_fold(F.col("_pxy")).alias("_sxy"),
        bucket_fold(F.col("_pxi")).alias("_sxi"),
        bucket_fold(F.col("_pxj")).alias("_sxj"),
    )
    return agg.select(
        "i", "j",
        (
            F.col("_sxy") / F.col("_n")
            - (F.col("_sxi") / F.col("_n")) * (F.col("_sxj") / F.col("_n"))
        ).alias("cov"),
    )


def pca_project(
    df: DataFrame,
    n_components: int = 2,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Project embeddings onto their top principal components.

    The covariance matrix is d x d — bounded driver data (the
    centroid-literal precedent), so the eigendecomposition runs
    driver-side on the collected matrix; the projection itself is a
    literal-vector dot product per component, a narrow zero-shuffle
    map over the corpus.  Eigenvector SIGN is normalized (first
    nonzero coordinate positive) so output is deterministic.

    Returns (id, pc1..pcN, plus ``explained``: each component's
    variance share, constant per row for downstream filters)."""
    import numpy as np

    if dim is None:
        probe = df.select(F.size(emb_col).alias("d")).first()
        dim = int(probe["d"])
    tri = embedding_covariance(df, emb_col, dim=dim, id_col=id_col).collect()
    cov = np.zeros((dim, dim))
    for r in tri:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:n_components]
    total = float(vals.sum()) or 1.0
    cols = [F.col(id_col)]
    for c, k in enumerate(order):
        v = vecs[:, k]
        nz = v[np.nonzero(v)[0][0]] if np.any(v) else 1.0
        if nz < 0:
            v = -v
        lits = ", ".join(repr(float(x)) for x in v)
        expr = (
            f"aggregate(zip_with({emb_col}, array({lits}), "
            "(a, b) -> cast(a AS double) * b), cast(0.0 AS double), "
            "(acc, x) -> acc + x)"
        )
        cols.append(F.expr(expr).alias(f"pc{c + 1}"))
        cols.append(
            F.lit(float(vals[k]) / total).alias(f"explained_{c + 1}")
        )
    return df.select(*cols)
