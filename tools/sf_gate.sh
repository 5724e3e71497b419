#!/usr/bin/env bash
# One-command reproducible scale gate (VERDICT r6 item 3): generate the
# synthetic scaled corpus if absent, dump every registered query with
# graft.Verify on the DEFAULT 8 GB heap, then replay every oracle in
# DuckDB sequentially on a fresh memory-capped connection per query.
#
#   tools/sf_gate.sh                # sf1 (10x) gate, the round norm
#   tools/sf_gate.sh .scale/sf3 30  # sf3 probe
#
# Env knobs: SPARK_GRAFT_CPUS (default 32), SPARK_DRIVER_MEM (default
# 8g — the point of the gate is that the DEFAULT survives),
# GRAFT_DUCKDB_MEM (oracle-side cap, default 8GB in check.py).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:-.scale/sf1}
COPIES=${2:-10}
OUT=${3:-/tmp/verify_$(basename "$SF_DIR")}

if [ ! -f "$SF_DIR/documents.parquet" ]; then
  echo "== generating $SF_DIR (${COPIES}x sf0.1)"
  python3 tools/scale_gen.py /root/testdata/sf0.1 "$SF_DIR" "$COPIES"
fi

export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
echo "== dumping ${#} queries via graft.Verify ($SF_DIR -> $OUT, cpus=$SPARK_GRAFT_CPUS, heap=${SPARK_DRIVER_MEM:-8g default})"
sbt -batch "runMain graft.Verify $SF_DIR $OUT"

echo "== sequential memory-capped DuckDB oracle replay"
python3 tools/check.py "$SF_DIR" "$OUT"
