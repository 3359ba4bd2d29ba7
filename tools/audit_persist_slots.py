#!/usr/bin/env python
"""Mechanical audit of the _persist_slot registry (VERDICT r13 item 1).

Builds EVERY registered batch query at sf0.001 with an instrumented
``_persist_slot`` and checks, by analyzed-plan ``semanticHash``:

1. no two slot NAMES ever request the same canonical plan (one slot per
   canonical plan — two slots would alias one CacheManager entry and
   either's release would drop the cache out from under the other);
2. no slot's plan equals any REGISTERED QUERY's root plan (a live cache
   of a registered query's exact output plan is substituted into that
   query's root whenever it is built in the same session — cross-query
   result reuse);
3. no slot's plan is a bare base-table scan (rule 1 in _persist_slot's
   docstring: a cached bare scan strips parquet pushdown from every
   other query reading the table).

Streaming queries are skipped (building the DataFrame executes a full
availableNow replay); they use no persist slots.

Usage: python tools/audit_persist_slots.py [sf_dir]
Exits non-zero on any violation.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_spark import queries as Q  # noqa: E402
from whisper_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="audit_persist_slots")

    requests: list[tuple[str, int, str, str]] = []  # slot, hash, query, plan head
    current_query = ["<none>"]
    orig = Q._persist_slot

    def spy(slot, df, level=None):
        h = df._jdf.queryExecution().analyzed().semanticHash()
        head = df._jdf.queryExecution().analyzed().nodeName()
        requests.append((slot, h, current_query[0], head))
        return orig(slot, df, level)

    Q._persist_slot = spy
    # the shared helpers call the module-level name too
    root_hash: dict[str, int] = {}
    errors: list[str] = []
    built = 0
    try:
        for name, q in Q.QUERIES.items():
            if name.startswith("stream_"):
                continue
            current_query[0] = name
            try:
                df = q.fn(spark, sf_dir)
                root_hash[name] = (
                    df._jdf.queryExecution().analyzed().semanticHash()
                )
                built += 1
            except Exception as e:  # noqa: BLE001
                errors.append(f"BUILD-ERROR {name}: {str(e).splitlines()[0][:120]}")
    finally:
        Q._persist_slot = orig
        Q.release_persist_slots()

    # 1. one slot per canonical plan
    by_hash: dict[int, set[str]] = defaultdict(set)
    slot_queries: dict[int, set[str]] = defaultdict(set)
    for slot, h, qname, _ in requests:
        by_hash[h].add(slot)
        slot_queries[h].add(qname)
    aliased = {
        h: slots for h, slots in by_hash.items() if len(slots) > 1
    }
    # 2. slot plan == registered query root
    root_by_hash: dict[int, list[str]] = defaultdict(list)
    for name, h in root_hash.items():
        root_by_hash[h].append(name)
    root_collisions = []
    for slot, h, qname, _ in requests:
        for rq in root_by_hash.get(h, []):
            root_collisions.append((slot, qname, rq))
    # 3. bare scans: analyzed root node is a plain relation
    bare = [
        (slot, qname)
        for slot, _, qname, head in requests
        if head in ("LogicalRelation", "Relation", "UnresolvedRelation")
    ]

    print(f"queries built: {built}; persist requests: {len(requests)}; "
          f"distinct slots: {len({r[0] for r in requests})}; "
          f"distinct plans: {len(by_hash)}")
    for slot, h, qname, head in sorted(set(requests)):
        print(f"  slot {slot:42s} root={head:12s} from {qname}")
    ok = True
    if aliased:
        ok = False
        for h, slots in aliased.items():
            print(f"VIOLATION(one-slot-per-plan): hash {h} requested under "
                  f"slots {sorted(slots)} by queries {sorted(slot_queries[h])}")
    if root_collisions:
        ok = False
        for slot, qname, rq in sorted(set(root_collisions)):
            print(f"VIOLATION(query-root-persist): slot {slot} (from {qname}) "
                  f"persists the exact output plan of registered query {rq}")
    if bare:
        ok = False
        for slot, qname in sorted(set(bare)):
            print(f"VIOLATION(bare-scan): slot {slot} (from {qname}) persists "
                  f"a bare base-table scan")
    for e in errors:
        ok = False
        print(e)
    print("AUDIT " + ("CLEAN" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
