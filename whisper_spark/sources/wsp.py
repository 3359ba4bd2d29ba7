"""Reference ``.wsp`` binary files as a Spark source and sink — the
migration path between a graphite whisper tree and this engine.

A reference-stack user switches over by importing their existing
storage directory (``import_wsp``), and can switch back — or feed
legacy dashboards — by exporting any store as a tree of files the
reference library reads byte-for-byte (``export_wsp``).

On-disk format (reference whisper.py:113-118, public):

* metadata ``!2LfL``: (aggregationType u32, maxRetention u32,
  xFilesFactor f32, archiveCount u32) — 16 bytes
* per archive ``!3L``: (offset, secondsPerPoint, points) — 12 bytes
* point ``!Ld``: (interval u32, value f64) — 12 bytes; interval 0
  marks an empty ring slot (whisper.py:1026-1031 treats stale/zero
  intervals as gaps)

Both directions are distributed: the reader lists POSIX trees via a
capped driver glob that switches to sharded executor-side listing on
huge fleets (see :func:`_wsp_files_rdd`; remote schemes use
``binaryFiles``), parses header+ring executor-side, and the writer
repartitions by metric so each task packs complete files.  Files are
per-metric and small (16 + 12·archives + 12·Σpoints bytes), so the
driver never materializes point data.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METADATA_FMT = "!2LfL"
ARCHIVE_FMT = "!3L"
POINT_FMT = "!Ld"
METADATA_SIZE = struct.calcsize(METADATA_FMT)
ARCHIVE_SIZE = struct.calcsize(ARCHIVE_FMT)
POINT_SIZE = struct.calcsize(POINT_FMT)

#: reference whisper.py:121-130 aggregationTypeToMethod
AGG_NUM_TO_METHOD = {
    1: "average", 2: "sum", 3: "last", 4: "max", 5: "min",
    6: "avg_zero", 7: "absmax", 8: "absmin",
}
METHOD_TO_AGG_NUM = {v: k for k, v in AGG_NUM_TO_METHOD.items()}

WSP_POINTS_SCHEMA = "metric string, resolution long, ts long, value double"
WSP_HEADER_SCHEMA = (
    "metric string, aggregation_method string, max_retention long, "
    "x_files_factor double, "
    "archives array<struct<seconds_per_point:long, points:long>>"
)


#: <scheme>:[//authority] prefix of a Hadoop filesystem URI.  Manual
#: regex, NOT urlparse: metric path segments may legally contain '#'
#: and '?' (graphite names allow '#'), which urlparse would truncate
#: as fragment/query.
_SCHEME_RE = None


def _strip_scheme(path: str) -> str:
    """Drop any ``<scheme>:`` / ``<scheme>://authority`` prefix (file:,
    hdfs://nn:8020, s3a://bucket, ...) so relpath math over
    ``binaryFiles`` paths works on every filesystem — preserving ``#``
    and ``?`` characters inside the path itself."""
    import re

    global _SCHEME_RE
    if _SCHEME_RE is None:
        _SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:(//[^/]*)?(?=/)")
    return _SCHEME_RE.sub("", path)


def _metric_name(path: str, root: str | None) -> str:
    """Filesystem path -> dotted metric name (graphite tree layout:
    ``<root>/a/b/c.wsp`` is metric ``a.b.c``; without a root, the
    basename)."""
    p = _strip_scheme(path)
    rel = os.path.relpath(p, _strip_scheme(root)) if root else os.path.basename(p)
    if rel.endswith(".wsp"):
        rel = rel[:-4]
    return rel.replace(os.sep, ".")


def _parse_header(blob: bytes):
    aggr, max_ret, xff, count = struct.unpack_from(METADATA_FMT, blob, 0)
    archives = []
    off = METADATA_SIZE
    for _ in range(count):
        a_off, spp, pts = struct.unpack_from(ARCHIVE_FMT, blob, off)
        off += ARCHIVE_SIZE
        archives.append((a_off, spp, pts))
    return aggr, max_ret, xff, archives


def _is_posix_path(path: str, spark: SparkSession | None = None) -> bool:
    """True when ``path`` denotes the LOCAL filesystem: an explicit
    ``file:`` URI, or a scheme-less path on a session whose Hadoop
    ``fs.defaultFS`` is local.  A scheme-less path on a cluster whose
    default filesystem is ``hdfs://`` (or s3a, ...) resolves to THAT
    filesystem — treating it as driver-local would silently glob the
    driver's disk and return wrong/missing data instead of an error,
    so those take the ``binaryFiles`` path.  (The reference engine
    requires POSIX file semantics — graphite storage dirs are
    local/NFS mounts executors reach as shared filesystems, the same
    contract :func:`export_wsp` documents for its output dir — which
    is why the local fast path exists at all.)"""
    if path.startswith("file:"):
        return True
    if _strip_scheme(path) != path:
        return False  # explicit non-file scheme (hdfs://, s3a://, ...)
    if spark is None:
        return True
    try:
        default_fs = spark.sparkContext._jsc.hadoopConfiguration().get(
            "fs.defaultFS", "file:///")
    except Exception:  # non-JVM session stub in unit tests
        return True
    return default_fs.startswith("file:")


def _expand_alternation(pattern: str) -> list[str]:
    """Expand Hadoop-glob ``{a,b}`` alternation (which Python's glob
    lacks) into the cross product of plain glob patterns."""
    i = pattern.find("{")
    if i < 0:
        return [pattern]
    depth = 0
    for j in range(i, len(pattern)):
        if pattern[j] == "{":
            depth += 1
        elif pattern[j] == "}":
            depth -= 1
            if depth == 0:
                break
    else:
        return [pattern]  # unbalanced: treat literally, like Hadoop
    body = pattern[i + 1:j]
    parts, buf, depth = [], "", 0
    for ch in body:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(buf)
            buf = ""
        else:
            buf += ch
    parts.append(buf)
    out = []
    for part in parts:
        for rest in _expand_alternation(pattern[:i] + part
                                        + pattern[j + 1:]):
            out.append(rest)
    return out


def _visible(p: str) -> bool:
    """FileInputFormat's hidden-file filter: names starting with
    ``.`` or ``_`` are excluded from listings (binaryFiles parity)."""
    base = os.path.basename(p.rstrip("/"))
    return not base.startswith((".", "_"))


def _glob_tagged(pattern: str):
    """Evaluate ONE plain glob pattern (alternation already expanded)
    into tagged hits: ``("D", dir)`` for every directory the pattern
    matches, ``("F", file)`` for every visible file it denotes — a
    matched directory contributing its visible files non-recursively
    (binaryFiles semantics).  LAZY (``iglob``, no sorting: downstream
    dedups and partitioning ignore order) so a capped driver listing
    can bail out early on a huge tree.  Pure function of the
    filesystem, safe to run driver- OR executor-side; both listing
    modes share it so their semantics cannot drift."""
    import glob as _glob

    for h in _glob.iglob(pattern, recursive=True):
        if os.path.isdir(h):
            yield ("D", h)
            for e in os.scandir(h):
                if e.is_file() and _visible(e.path):
                    yield ("F", e.path)
        elif _visible(h):
            yield ("F", h)


def _split_shardable(pattern: str):
    """Split a plain glob pattern at its FIRST wildcard path component:
    ``(literal_root, wild_component, rest)`` — or ``None`` when the
    pattern is a literal path (nothing to shard on)."""
    import glob as _glob

    comps = pattern.split(os.sep)
    for i, c in enumerate(comps):
        if _glob.has_magic(c):
            root = os.sep.join(comps[:i])
            if not root and pattern.startswith(os.sep):
                root = os.sep  # wildcard in the first component of an
                # absolute path: the literal root is / itself
            return (root, c, os.sep.join(comps[i + 1:]))
    return None


def _shard_patterns(pattern: str) -> list[str]:
    """Decompose one glob pattern into sub-patterns whose glob results
    union to the original's, one per entry of the first wildcard
    level — the unit of DISTRIBUTED listing.  The driver runs a single
    ``scandir`` of the literal root (one directory, metadata only);
    each sub-pattern is then evaluated executor-side.  Falls back to
    ``[pattern]`` (one shard, still executor-evaluated) when the
    pattern is literal, its root does not exist, or decomposition
    could double-count (overlapping ``**`` zero-expansions)."""
    import fnmatch

    split = _split_shardable(pattern)
    if split is None:
        return [pattern]
    root, wild, rest = split
    rootp = root or "."
    if not os.path.isdir(rootp):
        return [pattern]  # matches nothing; normal eval keeps the contract
    if wild == "**":
        if "**" in rest.split(os.sep):
            # a second ** would make the zero-dir expansions of the
            # shards overlap each other; keep it one shard
            return [pattern]
        # zero-directory expansion of ** ...
        out = [os.path.join(root, rest) if rest else root + os.sep]
        # ... plus one shard per subdirectory (glob's ** never descends
        # into dot-dirs; underscore dirs ARE descended — glob parity)
        for e in sorted(os.scandir(rootp), key=lambda e: e.name):
            if e.is_dir(follow_symlinks=True) and not e.name.startswith("."):
                sub = os.path.join(root, e.name, "**")
                out.append(os.path.join(sub, rest) if rest else sub)
        return out
    out = []
    hidden_ok = wild.startswith(".")
    for e in sorted(os.scandir(rootp), key=lambda e: e.name):
        if e.name.startswith(".") and not hidden_ok:
            continue  # glob wildcards never match dotfiles
        if not fnmatch.fnmatchcase(e.name, wild):
            continue
        if rest:
            if e.is_dir(follow_symlinks=True):
                out.append(os.path.join(root, e.name, rest))
        else:
            out.append(os.path.join(root, e.name))
    return out


#: auto mode lists driver-side until this many files, then abandons the
#: partial listing and switches to distributed.  Shard/dir counts are a
#: bad proxy for tree size (measured: a 100-shard/100k-file tree lists
#: in 1.9 s driver-side vs 6 s distributed — job-scheduling overhead
#: dominates small trees), so the switch is driven by the one number
#: that matters, observed exactly via a lazy capped listing.  At the
#: cap a driver glob costs single-digit seconds and ~tens of MB; past
#: it, a 10M-file fleet would hold the driver single-threaded for
#: minutes and pin ~1 GB of paths.
_AUTO_DISTRIBUTED_FILE_CAP = 262_144


def _wsp_files_rdd(spark: SparkSession, path: str, listing: str | None = None):
    """(path, blob) pairs for every file under a tree/glob, partitioned
    for PER-FILE parse parallelism.

    ``binaryFiles`` is the wrong scan shape for whisper trees: it packs
    whole files into splits by byte size, so a 100k-file tree of tiny
    ring files (16 B header + 12 B/slot) collapses into ONE split — and
    Spark's PortableDataStream re-deserializes the full split's path
    list per record, making that single task O(files^2) (measured: a
    100k-file split burned >800 s of one core before finishing).  For
    POSIX trees (the only place reference whisper trees live — the
    executors reach the same shared filesystem, the contract
    :func:`export_wsp` documents) there are two scan shapes:

    * **driver listing** — list paths driver-side (metadata only),
      parallelize the path list, open files executor-side.  Linear and
      fast to ~100k files (2.95 s measured), but the single-threaded
      glob becomes a driver stall at a 10M-file fleet.
    * **distributed listing** — the driver does ONE ``scandir`` of the
      glob's literal root to split the pattern into per-subdirectory
      shard patterns, then executors expand each shard and read its
      files.  No path list ever materializes on the driver; listing
      scales with executors.  Costs one extra (metadata-only) listing
      pass for the empty-vs-missing contract check, so it only wins on
      big trees.

    ``listing`` selects: ``"driver"``, ``"distributed"``, or ``None``
    (auto: list driver-side lazily, and on crossing
    ``_AUTO_DISTRIBUTED_FILE_CAP`` files abandon the partial listing
    and go distributed — the switch keys on the observed file count,
    the one number that actually decides which mode wins).  Both modes
    evaluate patterns through :func:`_glob_tagged`, so semantics are
    identical; file paths are deduped in both (a bare ``tree/**``
    matches a directory AND its files, which would otherwise read those
    files twice).  Non-POSIX schemes (hdfs://, s3a://...) keep the
    ``binaryFiles`` fallback — Hadoop's listing is already distributed
    namenode work — spread across executors after the scan."""
    if listing not in (None, "driver", "distributed"):
        raise ValueError(f"listing must be driver|distributed|None: {listing!r}")
    sc = spark.sparkContext

    def read_files(it):
        for p in it:
            with open(p, "rb") as f:
                yield p, f.read()

    if _is_posix_path(path, spark):
        local = _strip_scheme(path)
        pats = _expand_alternation(local)
        distributed = listing == "distributed"
        paths, matched_dir, seen = [], False, set()
        if not distributed:
            cap = (float("inf") if listing == "driver"
                   else _AUTO_DISTRIBUTED_FILE_CAP)
            for pat in pats:
                for tag, p in _glob_tagged(pat):
                    if tag == "D":
                        # binaryFiles semantics: a directory means its
                        # visible files (non-recursive)
                        matched_dir = True
                    elif p not in seen:
                        seen.add(p)
                        paths.append(p)
                        if len(paths) > cap:
                            # huge fleet: stop burning the single-
                            # threaded driver, re-list sharded across
                            # executors
                            distributed = True
                            paths, seen = [], set()
                            break
                if distributed:
                    break
        if distributed:
            shards = [s for pat in pats for s in _shard_patterns(pat)]
            n_shard_parts = min(max(len(shards), 1),
                                max(sc.defaultParallelism * 4, 1))
            tagged = sc.parallelize(shards, n_shard_parts).flatMap(_glob_tagged)
            # contract probe: runs the listing once more than strictly
            # needed, but metadata-only and distributed — the price of
            # keeping the eager empty-vs-missing error without pulling
            # the path list to the driver
            if not tagged.take(1):
                raise FileNotFoundError(
                    f"input path does not exist or matches no files: "
                    f"{path!r}"
                )
            n_slices = max(sc.defaultParallelism * 2, 1)
            paths_rdd = (
                tagged.filter(lambda t: t[0] == "F")
                .map(lambda t: t[1])
                .distinct(n_slices)  # dedup doubles as the re-spread
            )
            return paths_rdd.mapPartitions(read_files)
        if not paths:
            if matched_dir:
                # binaryFiles contract: an existing-but-empty dir is
                # an EMPTY scan, not an error
                return sc.parallelize([], 1)
            # ...while a pattern matching nothing at all is one
            # (reader-agnostic text: this lists any binary tree,
            # not just .wsp files)
            raise FileNotFoundError(
                f"input path does not exist or matches no files: "
                f"{path!r}"
            )
        n_slices = min(max(sc.defaultParallelism * 2, 1), len(paths))
        return sc.parallelize(paths, n_slices).mapPartitions(read_files)
    files = sc.binaryFiles(path)
    target = sc.defaultParallelism
    if files.getNumPartitions() < target:
        files = files.repartition(target)
    return files


def read_wsp(
    spark: SparkSession,
    path: str,
    root: str | None = None,
    listing: str | None = None,
) -> DataFrame:
    """Read a tree/glob of .wsp files into (metric, resolution, ts,
    value) rows — every non-empty ring slot of every archive.
    ``listing``: see :func:`_wsp_files_rdd` (driver | distributed |
    auto)."""

    def parse(item):
        p, blob = item
        metric = _metric_name(p, root)
        _aggr, _mr, _xff, archives = _parse_header(blob)
        out = []
        for a_off, spp, pts in archives:
            for i in range(pts):
                ts, v = struct.unpack_from(POINT_FMT, blob, a_off + i * POINT_SIZE)
                if ts != 0:
                    out.append((metric, spp, ts, v))
        return out

    files = _wsp_files_rdd(spark, path, listing)
    return spark.createDataFrame(files.flatMap(parse), WSP_POINTS_SCHEMA)


def wsp_headers(
    spark: SparkSession,
    path: str,
    root: str | None = None,
    listing: str | None = None,
) -> DataFrame:
    """One row per file: the parsed header (info() surface)."""

    def parse(item):
        p, blob = item
        aggr, max_ret, xff, archives = _parse_header(blob)
        return [(
            _metric_name(p, root),
            AGG_NUM_TO_METHOD.get(aggr, f"unknown({aggr})"),
            max_ret,
            float(xff),
            [(spp, pts) for _o, spp, pts in archives],
        )]

    files = _wsp_files_rdd(spark, path, listing)
    return spark.createDataFrame(files.flatMap(parse), WSP_HEADER_SCHEMA)


def import_wsp(
    spark: SparkSession, path: str, dst_path: str, root: str | None = None
):
    """Create a store at ``dst_path`` from a whisper tree — the
    switchover migration.

    Every archive's slots import VERBATIM into the matching resolution
    partition (no re-aggregation: the coarse archives carry history the
    finest archive no longer has, and whisper's write-time propagation
    is not replayable from retained data).  All files must share one
    retention schema — whisper trees are per-policy subtrees
    (storage-schemas.conf), so import per subtree.  Returns the new
    WhisperStore."""
    from ..store import WhisperStore

    hdrs = wsp_headers(spark, path, root)
    configs = (
        hdrs.select("aggregation_method", "x_files_factor", "archives")
        .distinct()
        .collect()
    )
    if len(configs) != 1:
        raise ValueError(
            f"import_wsp: {len(configs)} distinct retention configs under "
            f"{path!r}; import one storage-schema subtree at a time"
        )
    cfg = configs[0]
    store = WhisperStore.create(
        spark,
        dst_path,
        [(int(a["seconds_per_point"]), int(a["points"])) for a in cfg["archives"]],
        x_files_factor=float(cfg["x_files_factor"]),
        aggregation_method=cfg["aggregation_method"],
    )
    pts = read_wsp(spark, path, root).withColumn("wseq", F.lit(0).cast("long"))
    store._append(pts)
    return store


def import_wsp_tree(
    spark: SparkSession, path: str, dst_root: str, root: str | None = None
) -> dict[str, "object"]:
    """Migrate a whole HETEROGENEOUS whisper tree in one command.

    Real reference trees mix retention policies via carbon's
    storage-schemas.conf (reference contrib/whisper-auto-resize.py:
    123-139 reads exactly that mapping), so a tree-level import cannot
    assume one config.  Files are auto-grouped by their parsed header
    (archives, aggregationMethod, xFilesFactor) and each group imports
    into its own store under ``dst_root/policy-NNNN`` — the multi-store
    layout :func:`whisper_spark.store.fetch_federated` reads as one
    namespace.

    Returns ``{policy_dir_name: WhisperStore}``, one entry per distinct
    header config (deterministic order: sorted by archive list, method,
    xff).  The parsed point data and headers are PERSISTED so the tree
    is read and struct-unpacked once, not once per policy group; each
    store's append left-semi-joins the group's metric set.
    """
    from ..store import WhisperStore

    hdrs = wsp_headers(spark, path, root).persist()
    cfg_rows = (
        hdrs.select("aggregation_method", "x_files_factor", "archives")
        .distinct()
        .collect()
    )
    cfgs = sorted(
        cfg_rows,
        key=lambda r: (
            [(int(a["seconds_per_point"]), int(a["points"])) for a in r["archives"]],
            r["aggregation_method"],
            r["x_files_factor"],
        ),
    )
    pts = (
        read_wsp(spark, path, root)
        .withColumn("wseq", F.lit(0).cast("long"))
        .persist()
    )
    out: dict[str, object] = {}
    try:
        for i, cfg in enumerate(cfgs):
            archives = [
                (int(a["seconds_per_point"]), int(a["points"]))
                for a in cfg["archives"]
            ]
            name = f"policy-{i:04d}"
            store = WhisperStore.create(
                spark,
                f"{dst_root}/{name}",
                archives,
                x_files_factor=float(cfg["x_files_factor"]),
                aggregation_method=cfg["aggregation_method"],
            )
            arch_lit = F.array(
                *[
                    F.struct(
                        F.lit(s).cast("long").alias("seconds_per_point"),
                        F.lit(p).cast("long").alias("points"),
                    )
                    for (s, p) in archives
                ]
            )
            members = hdrs.filter(
                (F.col("aggregation_method") == cfg["aggregation_method"])
                & (F.col("x_files_factor") == cfg["x_files_factor"])
                & (F.col("archives") == arch_lit)
            ).select("metric")
            store._append(pts.join(members, "metric", "left_semi"))
            out[name] = store
    finally:
        pts.unpersist()
        hdrs.unpersist()
    return out


def export_wsp(store, out_dir: str, tree: bool = True) -> int:
    """Write the store as reference-readable .wsp files, one per metric
    (graphite tree layout ``a/b/c.wsp`` when ``tree``, else flat
    ``a.b.c.wsp``).  Returns the number of files written.

    Distribution: live rows (LWW + ring visibility, exactly what the
    store's own fetch would see) repartition by metric, and each task
    packs its metrics' files independently.  ``out_dir`` must be
    reachable from executors (shared storage on a cluster; any local
    path on local[*])."""
    info = store.info()
    aggr_num = METHOD_TO_AGG_NUM[info["aggregationMethod"]]
    xff = float(info["xFilesFactor"])
    max_ret = int(info["maxRetention"])
    archives = [
        (int(a["secondsPerPoint"]), int(a["points"])) for a in info["archives"]
    ]

    lww = store._lww(store._read_points())
    per_archive = []
    for spec in store.archives:
        vis = store._ring_visible(
            lww.filter(F.col("resolution") == spec.seconds_per_point), spec
        )
        per_archive.append(
            vis.withColumn("resolution", F.lit(spec.seconds_per_point))
        )
    rows = per_archive[0]
    for d in per_archive[1:]:
        rows = rows.unionByName(d)

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(it):
        by_metric: dict[str, dict[int, list]] = {}
        for r in it:
            by_metric.setdefault(r["metric"], {}).setdefault(
                int(r["resolution"]), []
            ).append((int(r["ts"]), float(r["value"])))
        n = 0
        header_size = METADATA_SIZE + ARCHIVE_SIZE * len(archives)
        for metric, levels in by_metric.items():
            buf = bytearray(
                header_size + POINT_SIZE * sum(p for _s, p in archives)
            )
            struct.pack_into(
                METADATA_FMT, buf, 0, aggr_num, max_ret, xff, len(archives)
            )
            a_off = header_size
            h_off = METADATA_SIZE
            for spp, pts in archives:
                struct.pack_into(ARCHIVE_FMT, buf, h_off, a_off, spp, pts)
                h_off += ARCHIVE_SIZE
                level = sorted(levels.get(spp, []))
                if level:
                    base = level[0][0]
                    for ts, v in level:
                        slot = ((ts - base) // spp) % pts
                        struct.pack_into(
                            POINT_FMT, buf, a_off + slot * POINT_SIZE, ts, v
                        )
                a_off += pts * POINT_SIZE
            rel = metric.replace(".", os.sep) if tree else metric
            fpath = os.path.join(out_dir, rel + ".wsp")
            os.makedirs(os.path.dirname(fpath) or out_dir, exist_ok=True)
            with open(fpath, "wb") as f:
                f.write(bytes(buf))
            n += 1
        yield n

    counts = (
        rows.repartition("metric")
        .rdd.mapPartitions(write_partition)
        .collect()
    )
    return sum(counts)
