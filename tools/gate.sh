#!/usr/bin/env bash
# Standing local correctness gate (round 15): the sf0.01 FULL registry
# plus BOTH series (q + td) at sf1 — scale-up correctness is part of the
# default gate, not a special probe. Mirrors the driver's compare exactly
# (tools/check.py on Verify output).
#
# Usage: tools/gate.sh            # both stages
#   SF1_DIR=<dir> tools/gate.sh   # override the sf1 dataset location
# The sf1 stage FAILS the gate (exit 1) when the sf1 dataset has not been
# generated (tools/gen_sf1.py) — sf1 coverage is mandatory, not optional;
# a skipped stage must be a loud red, never a silent green.
#
# Four td queries are excluded at sf1 on ORACLE budget (the DuckDB side,
# not ours): td08 (n-gram Jaccard all-pairs in SQL), td11 (brute-force
# ANN oracle), td15 (embedding near-dup all-pairs), td95 (oracle-side
# quadratic re-rank) — each documented in COVERAGE.md round-13 notes.
set -e
cd "$(dirname "$0")/.."
SF001=${SF001_DIR:-/root/testdata/sf0.01}
SF1=${SF1_DIR:-/root/repo/target/sf1}

echo "== gate stage 1: full registry @ $SF001 =="
sbt -batch "runMain graft.Verify $SF001 /tmp/gate_sf001" \
  > /tmp/gate_sf001.log 2>&1
python3 tools/check.py "$SF001" /tmp/gate_sf001

if [ -f "$SF1/lineitem.parquet" ]; then
  echo "== gate stage 2: q-series + td-series @ $SF1 =="
  QS=$(python3 - <<'EOF'
import json
skip = {"td08_ngram_jaccard", "td11_ann_lsh",
        "td15_embedding_neardups_lsh", "td95_bitext_margin"}
names = json.load(open('/tmp/gate_sf001/oracle_sql.json'))
print(' '.join(n for n in sorted(names)
               if (n.startswith('q') or n.startswith('td'))
               and n not in skip))
EOF
)
  sbt -batch "runMain graft.Verify $SF1 /tmp/gate_sf1 $QS" \
    > /tmp/gate_sf1.log 2>&1
  # shellcheck disable=SC2086
  python3 tools/check.py "$SF1" /tmp/gate_sf1 $QS
else
  echo "sf1 dataset missing at $SF1 — generate with tools/gen_sf1.py;" \
    "sf1 stage CANNOT run: FAILING the gate (sf1 coverage is mandatory)"
  exit 1
fi
