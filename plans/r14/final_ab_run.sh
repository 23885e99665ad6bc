#!/bin/bash
# Round-14 closing A/B: alternating full-bench draws, final tree (b1b175d)
# vs the r13 stamp (3de7d8c) — the same pair the driver's PERF_r14 will
# compare. Both orderings: 3 cycles A-first, then 3 cycles B-first =>
# 6 draws each side. Same form as plans/r14/baseline_ab_run.sh.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_DRAWS=1
OUT=/tmp/r14fin/final_ab_results.jsonl
: > "$OUT"

run_one() {
  local side="$1" tree="$2" cycle="$3"
  export SPARK_GRAFT_BENCH_OUT=/tmp/r14fin/full_${side}_${cycle}.json
  local t0=$(date +%s)
  local line
  line=$(cd "$tree" && timeout 900 python bench.py 2>/tmp/r14fin/err_${side}_${cycle}.log | tail -1)
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

for c in 1 2 3; do
  run_one A /tmp/r14fin/tree_final $c
  run_one B /tmp/r14fin/tree_r13 $c
done
for c in 4 5 6; do
  run_one B /tmp/r14fin/tree_r13 $c
  run_one A /tmp/r14fin/tree_final $c
done
echo DONE
