#!/bin/sh
# Task-1 (r13 verdict) instrument-gap reproduction: bench a fixed query
# subset under three machine states, same tree, same JVM settings:
#
#   A  clean      — bench alone (baseline)
#   B1 post-verify— bench immediately after a FULL graft.Verify at
#                   sf0.01 (the driver's sequencing: verify dump first,
#                   page cache + /tmp writeback state carried in)
#   B2 oracle-load— bench while tools/check.py (DuckDB oracle compare)
#                   runs concurrently on the verify output (the driver's
#                   "oracle load alongside" possibility)
#
# Usage: tools/driver_shape_bench.sh [subset-prefixes] [outdir]
# Writes bench JSONs to $outdir/bench_{A,B1,B2}.json and prints a
# per-query ratio table. Run on an otherwise idle machine.
set -eu
SUBSET="${1:-d72,d73,d74,d66,s34,s35,d65,d75,q01,q03}"
OUT="${2:-/tmp/driver_shape}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
VSF="/root/testdata/sf0.01"
PY=/root/.pyenv/shims/python3
mkdir -p "$OUT"

bench() { # $1 = tag
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_SELF="$OUT/bench_$1.json" \
    sbt -batch "runMain graft.Bench $SUBSET" > "$OUT/bench_$1.log" 2>&1
}

echo "== A: clean baseline bench" >&2
bench A

echo "== B1: full Verify at sf0.01, then bench immediately" >&2
sbt -batch "runMain graft.Verify $VSF $OUT/verify_dump" \
  > "$OUT/verify.log" 2>&1
bench B1

echo "== B2: bench with concurrent DuckDB oracle load" >&2
$PY tools/check.py "$VSF" "$OUT/verify_dump" > "$OUT/check.log" 2>&1 &
CHECK_PID=$!
bench B2
kill "$CHECK_PID" 2>/dev/null || true
wait "$CHECK_PID" 2>/dev/null || true

$PY - "$OUT" <<'EOF'
import json, sys, statistics
out = sys.argv[1]
runs = {t: json.load(open(f"{out}/bench_{t}.json"))["queries"]
        for t in ("A", "B1", "B2")}
qs = sorted(q for q in runs["A"] if all(runs[t].get(q, -1) > 0 for t in runs))
print(f"{'query':38s} {'A':>7s} {'B1':>7s} {'B2':>7s} {'B1/A':>6s} {'B2/A':>6s}")
for q in qs:
    a, b1, b2 = (runs[t][q] for t in ("A", "B1", "B2"))
    print(f"{q:38s} {a:7.2f} {b1:7.2f} {b2:7.2f} {b1/a:6.2f} {b2/a:6.2f}")
for t in ("B1", "B2"):
    rs = [runs[t][q]/runs["A"][q] for q in qs]
    print(f"{t}/A median {statistics.median(rs):.3f}  "
          f"aggregate {sum(runs[t][q] for q in qs)/sum(runs['A'][q] for q in qs):.3f}")
EOF
