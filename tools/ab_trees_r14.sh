#!/bin/bash
# Alternating idle A/B: old tree (r12-final 1c288a1, the tree BENCH_r12
# measured) vs new tree (round-14 HEAD).  VERDICT r13 "Next round" item 2:
# >=3 pairs, per-query medians, published next to BENCH_r13.
# One untimed cold run first (page cache), then N alternating pairs.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
OLD=/root/old_tree
NEW=/root/repo
OUT=/root/repo/plans/r14/ab_trees
mkdir -p "$OUT"
PAIRS=${1:-4}

echo "[$(date +%T)] cache warmer (old tree, untimed)"
(cd "$OLD" && python bench.py > "$OUT/warm.json" 2> "$OUT/warm.log")

for i in $(seq 1 "$PAIRS"); do
  echo "[$(date +%T)] pair $i: old"
  (cd "$OLD" && python bench.py > "$OUT/old_$i.json" 2> "$OUT/old_$i.log")
  echo "[$(date +%T)] pair $i: new"
  (cd "$NEW" && python bench.py > "$OUT/new_$i.json" 2> "$OUT/new_$i.log")
done
echo "[$(date +%T)] done"
