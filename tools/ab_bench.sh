#!/bin/sh
# A/B bench protocol: decide "regression or machine noise?" with data
# from ONE machine state instead of cross-round folklore.
#
#   tools/ab_bench.sh <base-ref> [sf-dir]
#
# Benches the working tree (HEAD + uncommitted changes) and <base-ref>
# back-to-back: the base ref is checked out into a throwaway git
# worktree, each side runs the ordinary `graft.Bench` (sf0.001 warmup,
# best-of-2), and the two JSON lines merge into one line on stdout:
#
#   {"metric":"ab_bench","base_ref":...,"sf":...,
#    "head":{q:sec,...},"base":{q:sec,...},
#    "ratio_head_over_base":{q:r,...}}    # only queries present in BOTH
#
# Ratios from the same machine state are trustworthy at ~±10%; the
# recorded cross-round drift is ±30% (BENCH_r05 d15 4.25s vs 5.4s for
# the byte-identical tree — see the round-6 adjudication in VERDICT).
# Judge a query regressed only if its ratio here exceeds ~1.2 on a
# re-run, not because two different rounds' absolute numbers differ.
#
# The base worktree compiles from scratch on first use (~2 min); the
# worktree and its sbt target live under /tmp and are removed on exit.
set -eu

REF="${1:?usage: tools/ab_bench.sh <base-ref> [sf-dir]}"
SF="${2:-/root/testdata/sf0.1}"
REPO="$(git rev-parse --show-toplevel)"
SHA="$(git -C "$REPO" rev-parse --short "$REF")"
WT="/tmp/graft_ab_base_$SHA"

cleanup() {
  git -C "$REPO" worktree remove --force "$WT" 2>/dev/null || true
  rm -rf "$WT"
}
trap cleanup EXIT
[ -d "$WT" ] || git -C "$REPO" worktree add --detach "$WT" "$REF" >&2

bench() { # $1 = tree dir
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>&1) \
    | grep '^{"metric"'
}

echo "ab_bench: benching HEAD ($(git -C "$REPO" rev-parse --short HEAD)) ..." >&2
HEAD_JSON="$(bench "$REPO")"
echo "ab_bench: benching base $REF ($SHA) ..." >&2
BASE_JSON="$(bench "$WT")"

HEAD_JSON="$HEAD_JSON" BASE_JSON="$BASE_JSON" REF="$REF" SF="$SF" python3 - <<'EOF'
import json, os
head = json.loads(os.environ["HEAD_JSON"])["queries"]
base = json.loads(os.environ["BASE_JSON"])["queries"]
ratio = {q: round(head[q] / base[q], 3)
         for q in head if q in base and base[q] > 0 and head[q] > 0}
print(json.dumps({"metric": "ab_bench", "base_ref": os.environ["REF"],
                  "sf": os.environ["SF"], "head": head, "base": base,
                  "ratio_head_over_base": ratio}))
EOF
