"""Pin the composition of the driver's 50-query correctness window
(judge task 6, round 12).

The driver's correctness gate checks the FIRST 50 registered queries.
Since round 13 the window is an explicit literal list in queries.py
(`_DRIVER_WINDOW` = sentinels + the current rotation's promotions);
this suite asserts the registry honors it exactly, so a registry edit
— adding a query, reordering a registration block, touching the
demote history — can never silently change what the driver checks.
"""

import json
import glob
import os

from whisper_spark.queries import (
    _DRIVER_WINDOW,
    _DRIVER_WINDOW_DEMOTE,
    _DRIVER_WINDOW_PROMOTE_R14,
    _DRIVER_WINDOW_SENTINELS,
    QUERIES,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_first_50_registered_are_exactly_the_window():
    assert list(QUERIES)[:50] == _DRIVER_WINDOW


def test_window_is_sentinels_plus_promotions_no_overlap():
    assert _DRIVER_WINDOW == (
        _DRIVER_WINDOW_SENTINELS + _DRIVER_WINDOW_PROMOTE_R14
    )
    assert len(set(_DRIVER_WINDOW)) == 50
    assert not set(_DRIVER_WINDOW) & set(_DRIVER_WINDOW_DEMOTE)


def test_every_demoted_name_is_registered_outside_the_window():
    names = list(QUERIES)
    for n in _DRIVER_WINDOW_DEMOTE:
        assert n in QUERIES, f"demoted query {n} vanished from registry"
        assert names.index(n) >= 50, f"{n} demoted but inside window"


def test_promotions_are_first_time_driver_rows():
    """Every promoted name must have NO prior driver-green row (that is
    the point of the rotation), computed against the committed
    CORRECTNESS_r*.json artifacts; sentinels are the opposite — each
    has driver history.  Skips gracefully when artifacts are absent
    (fresh clone)."""
    artifacts = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not artifacts:
        return
    seen = set()
    for f in artifacts:
        with open(f) as fh:
            seen.update(json.load(fh).keys())
    # only consider rounds up to r13 — the rotation's baseline
    prior = {
        f for f in artifacts
        if int(f.rsplit("_r", 1)[1].split(".")[0]) <= 13
    }
    seen = set()
    for f in prior:
        with open(f) as fh:
            seen.update(json.load(fh).keys())
    stale = [n for n in _DRIVER_WINDOW_PROMOTE_R14 if n in seen]
    assert not stale, f"promotions with prior driver rows: {stale}"
    missing_history = [
        n for n in _DRIVER_WINDOW_SENTINELS if n not in seen
    ]
    assert not missing_history, (
        f"sentinels without driver history: {missing_history}"
    )
