"""Debug IO accounting (reference: whisper.py:225-273
``enableDebug``/``disableDebug``).

The reference wraps ``open()`` to count and print READ/WRITE syscalls per
operation.  Here the physical IO happens inside the JVM, so the analog
counts *engine operations* (scans issued and batches appended by
WhisperStore) and points at the Spark UI / ``df.explain`` for byte-level
detail.  Enable with::

    from whisper_spark import debug
    debug.enable_debug()
    ... store operations print "DEBUG: READ/WRITE ..." lines ...
    debug.disable_debug()
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class _DebugState:
    enabled: bool = False
    reads: int = 0
    writes: int = 0
    t0: float = field(default_factory=time.time)


_state = _DebugState()


def enable_debug() -> None:
    _state.enabled = True
    _state.reads = 0
    _state.writes = 0
    _state.t0 = time.time()


def disable_debug() -> None:
    _state.enabled = False


def counters() -> dict:
    return {"reads": _state.reads, "writes": _state.writes}


def record_read(what: str) -> None:
    if _state.enabled:
        _state.reads += 1
        print(f"DEBUG: READ  #{_state.reads} {what} "
              f"(+{time.time() - _state.t0:.3f}s)")


def record_write(what: str) -> None:
    if _state.enabled:
        _state.writes += 1
        print(f"DEBUG: WRITE #{_state.writes} {what} "
              f"(+{time.time() - _state.t0:.3f}s)")
