#!/usr/bin/env bash
# Full local pre-flight: everything the driver's gates check, in one command.
#   tools/preflight.sh            # compile + tests + verify/oracle + bench
#   tools/preflight.sh --fast    # skip bench
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile + test =="
sbt -batch test | grep -E 'Tests:|FAILED|error' || true

echo "== verify @ sf0.01 + DuckDB oracle =="
rm -rf /tmp/graft_preflight_vout
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_preflight_vout" \
  2>&1 | grep -E '\[verify\].*failed' || true
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
