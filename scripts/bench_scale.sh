#!/bin/bash
# The sf1 scaling rehearsal as ONE repeatable command (round-15 directive:
# the round-14 rehearsal was a /tmp one-off whose SCALING.md numbers could
# not be regenerated after reboot). Generates the seed-pinned sf1 fixture
# (manifest-skipped when already present), measures BOTH decades with the
# stock graft.Bench protocol, and rewrites SCALING.md's slope table in
# place. Artifacts: /tmp/bench_lower.json, /tmp/bench_upper.json.
#
# Usage: scripts/bench_scale.sh [sf1-dir]        (default /tmp/graft-sf1)
# Prereq: sbt compile (runs on the compiled classes, no sbt lock held).
set -euo pipefail
cd "$(dirname "$0")/.."
SF1=${1:-/tmp/graft-sf1}

echo "== generating sf1 fixture at $SF1 (manifest-skipped if current)" >&2
scripts/run_main.sh graft.GenScale "$SF1"

echo "== lower decade: sf0.1 vs sf0.01" >&2
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_SLOPE_DIR=/root/testdata/sf0.01 \
  scripts/run_main.sh graft.Bench | grep '^{' > /tmp/bench_lower.json

echo "== upper decade: sf1 vs sf0.1" >&2
SPARK_GRAFT_SF_DIR=$SF1 \
SPARK_GRAFT_SLOPE_DIR=/root/testdata/sf0.1 \
  scripts/run_main.sh graft.Bench | grep '^{' > /tmp/bench_upper.json

echo "== rewriting SCALING.md slope table" >&2
python3 scripts/scaling_table.py /tmp/bench_lower.json /tmp/bench_upper.json SCALING.md
echo "done — review: git diff SCALING.md" >&2
