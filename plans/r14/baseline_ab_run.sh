#!/bin/bash
# Round-14 baseline: alternating full-bench A/B, HEAD (3de7d8c) vs r12 tag (b7de818).
# Both orderings: 4 cycles A-first, then 2 cycles B-first => 6 draws each side.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_DRAWS=1
OUT=/tmp/r14/ab_results.jsonl
: > "$OUT"

run_one() {
  local side="$1" tree="$2" cycle="$3"
  export SPARK_GRAFT_BENCH_OUT=/tmp/r14/full_${side}_${cycle}.json
  local t0=$(date +%s)
  local line
  line=$(cd "$tree" && timeout 900 python bench.py 2>/tmp/r14/err_${side}_${cycle}.log | tail -1)
  local t1=$(date +%s)
  python3 - "$side" "$cycle" "$((t1-t0))" "$OUT" <<PYEOF
import json, sys
side, cycle, wall, out = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
line = '''$line'''
try:
    d = json.loads(line)
    rec = {"side": side, "cycle": cycle, "wall": wall, "value": d["value"],
           "duckdb_total": d.get("duckdb_total"), "queries": d["queries"]}
except Exception as e:
    rec = {"side": side, "cycle": cycle, "wall": wall, "error": str(e), "raw": line[-500:]}
with open(out, "a") as f:
    f.write(json.dumps(rec) + "\n")
print(side, cycle, rec.get("value"), "wall", wall)
PYEOF
}

for c in 1 2 3 4; do
  run_one A /tmp/r14/tree_head $c
  run_one B /tmp/r14/tree_r12 $c
done
for c in 5 6; do
  run_one B /tmp/r14/tree_r12 $c
  run_one A /tmp/r14/tree_head $c
done
echo DONE
