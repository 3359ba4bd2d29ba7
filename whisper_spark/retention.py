"""Retention DSL parsing and archive-list validation.

Driver-side (pure Python) configuration layer: these never touch a
DataFrame.  Semantics match the reference exactly:

* retention spec parsing  — reference: whisper.py:135-178
* archive-list validation — reference: whisper.py:421-476 (5 rules)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .errors import InvalidConfiguration

#: seconds per unit; unit names may be abbreviated to any prefix
#: (reference: whisper.py:135-149)
UNIT_SECONDS = {
    "seconds": 1,
    "minutes": 60,
    "hours": 3600,
    "days": 86400,
    "weeks": 86400 * 7,
    "years": 86400 * 365,
}

_RETENTION_RE = re.compile(r"^\s*(\d+)([a-zA-Z]*)\s*$")


def get_unit_multiplier(s: str) -> int:
    """Resolve a (possibly abbreviated) unit name to seconds.

    Prefix match, e.g. ``s``/``sec``/``seconds`` → 1 (reference:
    whisper.py:142-149).
    """
    if not s:
        return 1
    for name, secs in UNIT_SECONDS.items():
        if name.startswith(s.lower()):
            return secs
    raise InvalidConfiguration(f"Invalid unit '{s}'")


def parse_duration(s: str) -> int:
    """Parse ``"14d"`` / ``"300"`` → seconds."""
    m = _RETENTION_RE.match(s)
    if not m:
        raise InvalidConfiguration(f"Invalid duration specification '{s}'")
    return int(m.group(1)) * get_unit_multiplier(m.group(2))


def parse_retention_def(retention_def: str) -> tuple[int, int]:
    """Parse one ``"<precision>:<points>"`` spec → ``(seconds_per_point, points)``.

    Either side may carry a unit: ``"10s:14d"`` == 10-second precision kept
    for 14 days == ``(10, 120960)`` (reference: whisper.py:152-178).
    """
    try:
        (precision_s, points_s) = retention_def.strip().split(":", 1)
    except ValueError:
        raise InvalidConfiguration(
            f"Invalid retention definition '{retention_def}'"
        ) from None

    precision = parse_duration(precision_s)

    m = _RETENTION_RE.match(points_s)
    if not m:
        raise InvalidConfiguration(f"Invalid retention definition '{retention_def}'")
    if m.group(2):
        # second field has a unit → it is a duration; points = duration/precision
        points = parse_duration(points_s) // precision
    else:
        points = int(m.group(1))

    return (precision, points)


def parse_retention_defs(spec: str | list) -> list[tuple[int, int]]:
    """Parse a comma-separated retention spec, or pass through tuples.

    Returns the archives SORTED by precision (finest first) — the
    reference's ``validateArchiveList`` sorts the caller's list in place
    (whisper.py:439) so ``create`` always persists sorted archives, and
    store code relies on index order == precision order.
    """
    if isinstance(spec, str):
        archives = [parse_retention_def(s) for s in spec.split(",")]
    else:
        archives = [
            parse_retention_def(a) if isinstance(a, str) else (int(a[0]), int(a[1]))
            for a in spec
        ]
    archives.sort(key=lambda a: a[0])
    validate_archive_list(archives)
    return archives


def validate_archive_list(archive_list: list[tuple[int, int]]) -> None:
    """Enforce the 5 archive-schema rules (reference: whisper.py:421-476).

    1. at least one archive;
    2. no two archives with the same precision;
    3. each higher precision must evenly divide every lower precision;
    4. lower-precision archives must cover strictly longer retention;
    5. each archive needs >= enough points to consolidate one point of the
       next (coarser) archive.
    """
    if not archive_list:
        raise InvalidConfiguration("You must specify at least one archive configuration!")

    archive_list = sorted(archive_list, key=lambda a: a[0])

    for i, archive in enumerate(archive_list):
        if i == len(archive_list) - 1:
            break
        nxt = archive_list[i + 1]
        if not archive[0] < nxt[0]:
            raise InvalidConfiguration(
                f"A Whisper database may not be configured having two archives "
                f"with the same precision (archive{i}: {archive}, archive{i + 1}: {nxt})"
            )
        if nxt[0] % archive[0] != 0:
            raise InvalidConfiguration(
                f"Higher precision archives' precision must evenly divide all "
                f"lower precision archives' precision "
                f"(archive{i}: {archive[0]}, archive{i + 1}: {nxt[0]})"
            )
        retention = archive[0] * archive[1]
        next_retention = nxt[0] * nxt[1]
        if not next_retention > retention:
            raise InvalidConfiguration(
                f"Lower precision archives must cover larger time intervals than "
                f"higher precision archives "
                f"(archive{i}: {retention} seconds, archive{i + 1}: {next_retention} seconds)"
            )
        archive_points = archive[1]
        points_per_consolidation = nxt[0] // archive[0]
        if not archive_points >= points_per_consolidation:
            raise InvalidConfiguration(
                f"Each archive must have at least enough points to consolidate to "
                f"the next archive (archive{i + 1} consolidates {points_per_consolidation} "
                f"of archive{i}'s points but it has only {archive_points} total points)"
            )


@dataclass(frozen=True)
class ArchiveSpec:
    """One resolution level of a metric's retention policy.

    Spark mapping: an archive is a *partition slice* ``resolution =
    seconds_per_point`` of the long-format points table, not a ring buffer
    (SURVEY.md §1.4).
    """

    seconds_per_point: int
    points: int

    @property
    def retention(self) -> int:
        return self.seconds_per_point * self.points

    def to_dict(self) -> dict:
        return {
            "secondsPerPoint": self.seconds_per_point,
            "points": self.points,
            "retention": self.retention,
        }


def estimate_size_bytes(archive_list: list[tuple[int, int]]) -> int:
    """Reference on-disk cost model, for parity with ``whisper-create
    --estimate`` (reference: bin/whisper-create.py:71-72): ``16 +
    12*archives + 12*sum(points)`` rounded up to 4 KiB blocks.

    Our parquet footprint is far smaller (columnar + encoding), but the
    estimator is part of the user-facing surface.
    """
    size = 16 + (len(archive_list) * 12) + sum(12 * a[1] for a in archive_list)
    block = 4096
    return ((size + block - 1) // block) * block
