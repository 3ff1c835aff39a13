#!/usr/bin/env bash
# Full local pre-flight: everything the driver's gates check, in one command.
#   tools/preflight.sh            # compile + tests + verify/oracle + bench
#   tools/preflight.sh --fast    # skip bench
set -euo pipefail
cd "$(dirname "$0")/.."

log=$(mktemp /tmp/graft_preflight.XXXXXX.log)

echo "== compile + test =="
# tee to a file and grep the file: piping sbt into grep would let pipefail be
# defeated by `|| true`-style status laundering — a failing `sbt test` must
# abort preflight, not just hide its summary line.
sbt -batch test >"$log" 2>&1 || { tail -40 "$log"; echo "preflight: sbt test FAILED"; exit 1; }
grep -E 'Tests:|FAILED|error' "$log" || true

echo "== verify @ sf0.01 + DuckDB oracle =="
rm -rf /tmp/graft_preflight_vout
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_preflight_vout" \
  >"$log" 2>&1 || { tail -40 "$log"; echo "preflight: Verify FAILED"; exit 1; }
grep -E '\[verify\].*failed' "$log" || true
python3 tools/check_correctness.py /tmp/graft_preflight_vout /root/testdata/sf0.01

echo "== reference golden parity =="
sbt -batch "testOnly graft.FragmentEngineSpec" 2>&1 | grep -E 'Tests:|FAILED'

if [[ "${1:-}" != "--fast" ]]; then
  echo "== bench @ sf0.1 =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} sbt -batch "runMain graft.Bench" \
    2>/dev/null | grep -E '^\{'
fi
echo "== preflight done =="
