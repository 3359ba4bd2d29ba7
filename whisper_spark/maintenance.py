"""Fleet-maintenance operators (reference: bin/find-corrupt-whisper-files.py,
contrib/whisper-auto-resize.py, contrib/whisper-auto-update.py).

Where the reference walks directory trees of .wsp files, we walk
directories of stores; where it forks a process pool
(contrib/update-storage-times.py:136-148), Spark's own parallelism applies
inside each store operation.
"""

from __future__ import annotations

import fnmatch
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import CorruptWhisperFile
from .retention import parse_retention_defs
from .store import WhisperStore


def find_stores(root: str) -> list[str]:
    """All store directories (those holding a policy.json) under root —
    the namespace walk (reference: bin/find-corrupt-whisper-files.py:13-24)."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if "policy.json" in filenames:
            out.append(dirpath)
    return sorted(out)


def find_corrupt(
    spark: SparkSession, root: str, delete: bool = False
) -> list[tuple[str, str]]:
    """Probe every store under root; return [(path, error)] for those
    whose metadata or data is unreadable (reference:
    bin/find-corrupt-whisper-files.py:26-51).  ``delete`` removes corrupt
    stores like the reference's --delete-corrupt."""
    import shutil

    bad = []
    for path in find_stores(root):
        try:
            store = WhisperStore.open(spark, path)
            store.info()
            # probe the data files too (a bad parquet footer = corrupt)
            if store._has_data():
                store._read_points().limit(1).collect()
        except Exception as e:  # noqa: BLE001 - any failure marks corruption
            bad.append((path, str(e)))
            if delete:
                shutil.rmtree(path, ignore_errors=True)
    return bad


@dataclass
class PolicyRule:
    """One storage-schemas/aggregation rule: glob-or-regex pattern ->
    desired config (reference: contrib/whisper-auto-resize.py:123-139
    reads the same shape from carbon's conf files)."""

    pattern: str
    archives: list | str
    x_files_factor: float | None = None
    aggregation_method: str | None = None
    #: which carbon conf file the rule came from: "schemas",
    #: "aggregation", or None (hand-built rule that supplies both).
    #: Carbon matches storage-schemas.conf and storage-aggregation.conf
    #: INDEPENDENTLY per metric (first match in each file), so
    #: reconcile runs one first-match pass per source.
    source: str | None = None

    def matches(self, metric_or_path: str) -> bool:
        if self.pattern.startswith("^"):
            import re

            return re.search(self.pattern, metric_or_path) is not None
        return fnmatch.fnmatch(metric_or_path, self.pattern)


def reconcile_policies(
    spark: SparkSession,
    root: str,
    rules: list[PolicyRule],
    apply: bool = False,
    now: int | None = None,
) -> list[dict]:
    """Compare every store against the first matching rule; report (and
    optionally fix) drift — the auto-resize analog (reference:
    contrib/whisper-auto-resize.py:102-246).

    Returns a report: [{path, drift: [...], fixed: bool}].  ``apply``
    runs set_aggregation_method/set_x_files_factor for header drift and a
    resize (with re-aggregation) for archive drift.
    """
    report = []
    for path in find_stores(root):
        # carbon matches storage-schemas.conf and storage-aggregation.conf
        # INDEPENDENTLY (first match in each file); hand-built rules
        # (source=None) participate in both passes
        schemas_rule = next(
            (r for r in rules
             if r.source in (None, "schemas") and r.matches(path)),
            None,
        )
        agg_rule = next(
            (r for r in rules
             if r.source in (None, "aggregation") and r.matches(path)),
            None,
        )
        if schemas_rule is None and agg_rule is None:
            continue
        store = WhisperStore.open(spark, path)
        want = (
            parse_retention_defs(schemas_rule.archives)
            if schemas_rule is not None and schemas_rule.archives
            else None
        )
        want_method = agg_rule.aggregation_method if agg_rule else None
        want_xff = agg_rule.x_files_factor if agg_rule else None
        have = [(a.seconds_per_point, a.points) for a in store.archives]
        drift = []
        if want is not None and want != have:
            drift.append(f"archives {have} != {want}")
        if (
            want_method is not None
            and store.aggregation_method != want_method
        ):
            drift.append(
                f"aggregation {store.aggregation_method} != {want_method}"
            )
        from .store import _f32

        if want_xff is not None and abs(
            store.x_files_factor - _f32(want_xff)
        ) > 1e-9:
            drift.append(f"xff {store.x_files_factor} != {want_xff}")
        fixed = False
        if drift and apply:
            if want_method is not None:
                store.set_aggregation_method(want_method)
            if want_xff is not None:
                store.set_x_files_factor(want_xff)
            if want is not None and want != have:
                store.resize(
                    want,
                    x_files_factor=want_xff,
                    aggregation_method=want_method,
                    use_aggregate=True,
                    now=now,
                )
            fixed = True
        if drift:
            report.append({"path": path, "drift": drift, "fixed": fixed})
    return report


def auto_update(
    store: WhisperStore,
    update_value: Callable[[Column, Column], Column],
    metrics=None,
    from_time: int | None = None,
    until_time: int | None = None,
    now: int | None = None,
) -> None:
    """Read-modify-write over a time range — the reference's only UDF
    surface (contrib/whisper-auto-update.py:17-20 exposes a user-editable
    ``update_value(timestamp, value)``).

    ``update_value(ts_col, value_col) -> Column`` is a COLUMN transform
    (stays JVM-side); wrap a Python function in ``F.udf``/``pandas_udf``
    only if its logic genuinely can't be expressed in expressions.
    """
    now = int(now) if now is not None else store._wallclock()
    from_time = from_time if from_time is not None else now - store.max_retention + 1
    res = store.fetch(
        metrics=metrics, from_time=from_time, until_time=until_time, now=now
    )
    if res is None:
        return
    (_, df) = res
    updated = (
        df.filter(F.col("value").isNotNull())
        .select(
            "metric",
            "ts",
            update_value(F.col("ts"), F.col("value")).alias("value"),
            F.lit(0).cast("long").alias("seq"),
        )
    )
    store.update_many(updated, now=now)


def integrity_report(store: WhisperStore) -> DataFrame:
    """Per-archive stats: row counts, LWW-duplicate factor, time bounds —
    the whisper-dump summary view reimagined as a query
    (reference: bin/whisper-dump.py:40-138)."""
    raw = store._read_points()
    return raw.groupBy("resolution").agg(
        F.count("*").alias("rows_raw"),
        F.countDistinct("metric", "ts").alias("rows_live"),
        (F.count("*") / F.countDistinct("metric", "ts")).alias("write_amplification"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.countDistinct("metric").alias("n_metrics"),
    )


# --------------------------------------------------------------------- #
# consistent-hash sharding (carbon-relay fleet analog)
# --------------------------------------------------------------------- #


def consistent_hash_ring(
    nodes: list[str], replica_count: int = 100
) -> list[tuple[int, str]]:
    """Carbon-relay's consistent hash ring (public carbon algorithm,
    lib/carbon/hashing.py): each node gets ``replica_count`` ring
    positions at ``int(md5(f"{node}:{i}").hexdigest()[:4], 16)``; a key
    routes to the first position >= its own hash, wrapping to the ring
    start.  Returned sorted by (position, node) — the tie order the
    bisect-based original produces."""
    import hashlib

    ring = [
        (int(hashlib.md5(f"{node}:{i}".encode()).hexdigest()[:4], 16), node)
        for node in nodes
        for i in range(replica_count)
    ]
    return sorted(ring)


def shard_assignments(
    df,
    nodes: list[str],
    replica_count: int = 100,
    metric_col: str = "metric",
):
    """Assign each metric to its carbon-ring shard as a pure projection.

    The ring inlines as ONE from_json literal (the centroid-literal
    trick), so assignment costs zero shuffle at any metric count — the
    relay semantics (which whisper host owns this metric) reproduced as
    a column expression.  DuckDB-mirrorable: both engines compute
    ``('0x' || substr(md5(...), 1, 4))::INT`` identically."""
    import json

    ring = consistent_hash_ring(nodes, replica_count)
    lit = F.from_json(
        F.lit(json.dumps([{"pos": p, "node": n} for p, n in ring])),
        "array<struct<pos:long,node:string>>",
    )
    p = F.conv(F.substring(F.md5(F.col(metric_col)), 1, 4), 16, 10).cast("long")
    best = F.array_min(F.filter(lit, lambda e: e["pos"] >= p))
    chosen = F.coalesce(best, F.element_at(lit, 1))["node"]
    return df.withColumn("shard", chosen)


def read_storage_schemas(
    schemas_path: str, aggregation_path: str | None = None
) -> list[PolicyRule]:
    """Parse carbon's ``storage-schemas.conf`` (and optionally
    ``storage-aggregation.conf``) into :class:`PolicyRule`s — the files
    a reference deployment already maintains, so its retention policy
    drives :func:`reconcile_policies` unchanged.

    Format (public carbon docs)::

        [rule-name]
        pattern = ^servers\\.
        retentions = 10s:6h,1min:7d,10min:5y

    storage-aggregation.conf adds ``xFilesFactor`` and
    ``aggregationMethod`` per pattern.  Carbon matches the two files
    INDEPENDENTLY per metric (first match in each file), so aggregation
    rules are returned as separate ``source="aggregation"`` rules —
    never merged onto schemas rules by pattern identity —
    and :func:`reconcile_policies` runs one first-match pass per
    source.  Rule order is file order within each source."""
    import configparser

    def _carbon_pat(pat: str) -> str:
        """Carbon patterns are regexes over METRIC NAMES; reconcile
        matches store PATHS.  Re-anchor ^ to a path-segment boundary so
        '^servers\\.' matches both 'servers.web1.cpu' and
        '/data/stores/servers.web1.cpu', and mark bare patterns as
        regex (leading ^ is PolicyRule's regex marker)."""
        if pat.startswith("^"):
            return "^(.*/)?" + pat[1:]
        return "^(.*/)?.*" + pat

    def load(path):
        cp = configparser.ConfigParser()
        with open(path) as f:
            cp.read_string(f.read())
        return cp

    rules: list[PolicyRule] = []
    cp = load(schemas_path)
    for section in cp.sections():
        pat = cp.get(section, "pattern", fallback=None)
        ret = cp.get(section, "retentions", fallback=None)
        if not pat or not ret:
            continue
        rules.append(
            PolicyRule(pattern=_carbon_pat(pat), archives=ret, source="schemas")
        )
    if aggregation_path:
        ag = load(aggregation_path)
        for section in ag.sections():
            pat = ag.get(section, "pattern", fallback=None)
            if not pat:
                continue
            xff = ag.get(section, "xFilesFactor", fallback=None)
            method = ag.get(section, "aggregationMethod", fallback=None)
            rules.append(
                PolicyRule(
                    pattern=_carbon_pat(pat),
                    archives="",
                    x_files_factor=float(xff) if xff is not None else None,
                    aggregation_method=method,
                    source="aggregation",
                )
            )
    return rules
