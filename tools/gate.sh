#!/usr/bin/env bash
# Standing local correctness gate (round 14): the sf0.01 FULL registry
# plus the q-series at sf1 — scale-up correctness is part of the default
# gate, not a special probe. Mirrors the driver's compare exactly
# (tools/check.py on Verify output).
#
# Usage: tools/gate.sh            # both stages
#   SF1_DIR=<dir> tools/gate.sh   # override the sf1 dataset location
# The sf1 stage is skipped (loudly) when the sf1 dataset has not been
# generated (tools/gen_sf1.py).
set -e
cd "$(dirname "$0")/.."
SF001=${SF001_DIR:-/root/testdata/sf0.01}
SF1=${SF1_DIR:-/root/repo/target/sf1}

echo "== gate stage 1: full registry @ $SF001 =="
sbt -batch "runMain graft.Verify $SF001 /tmp/gate_sf001" \
  > /tmp/gate_sf001.log 2>&1
python3 tools/check.py "$SF001" /tmp/gate_sf001

if [ -f "$SF1/lineitem.parquet" ]; then
  echo "== gate stage 2: q-series @ $SF1 =="
  QS=$(python3 -c "import json; print(' '.join(sorted(n for n in json.load(open('/tmp/gate_sf001/oracle_sql.json')) if n.startswith('q'))))")
  sbt -batch "runMain graft.Verify $SF1 /tmp/gate_sf1 $QS" \
    > /tmp/gate_sf1.log 2>&1
  # shellcheck disable=SC2086
  python3 tools/check.py "$SF1" /tmp/gate_sf1 $QS
else
  echo "sf1 dataset missing at $SF1 — generate with tools/gen_sf1.py;" \
    "sf1 q-series stage SKIPPED"
  exit 1
fi
