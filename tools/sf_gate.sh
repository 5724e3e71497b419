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

# Bench-contamination guard (VERDICT r13 item 5): three of the last
# four round-boundary benches measured a loaded machine. graft.Bench
# writes /tmp/graft_bench.running (its pid) while measuring; a gate
# starting mid-bench would be exactly that contamination, so refuse —
# GRAFT_GATE_FORCE=1 overrides. Stale markers (dead pid) are ignored.
BENCH_MARK=/tmp/graft_bench.running
if [ -f "$BENCH_MARK" ] && [ "${GRAFT_GATE_FORCE:-}" != "1" ]; then
  BPID=$(cat "$BENCH_MARK" 2>/dev/null || echo "")
  if [ -n "$BPID" ] && kill -0 "$BPID" 2>/dev/null; then
    echo "REFUSED: graft.Bench (pid $BPID) is measuring — a concurrent" >&2
    echo "gate would contaminate BENCH_r*.json. Wait for it or set" >&2
    echo "GRAFT_GATE_FORCE=1." >&2
    exit 3
  fi
  rm -f "$BENCH_MARK"   # stale: pid is gone
fi
# Symmetric marker so graft.Bench can RECORD a gate overlap (the driver
# starts benches on its own schedule; Bench can't refuse, but it can
# put gate_overlap:true into the artifact). Two LIVE gates clobbering
# one marker would also delete each other's liveness signal mid-run —
# refuse gate-vs-gate too (same stale-pid handling, same override).
GATE_MARK=/tmp/graft_gate.running
if [ -f "$GATE_MARK" ] && [ "${GRAFT_GATE_FORCE:-}" != "1" ]; then
  GPID=$(cat "$GATE_MARK" 2>/dev/null || echo "")
  if [ -n "$GPID" ] && [ "$GPID" != "$$" ] && kill -0 "$GPID" 2>/dev/null; then
    echo "REFUSED: another gate/replay (pid $GPID) is running — two" >&2
    echo "concurrent replays contaminate each other's walls. Wait or" >&2
    echo "set GRAFT_GATE_FORCE=1." >&2
    exit 3
  fi
fi
echo $$ > "$GATE_MARK"
# Remove only OUR marker (a forced concurrent gate may own it by then).
trap '{ [ "$(cat "$GATE_MARK" 2>/dev/null)" = "$$" ] && rm -f "$GATE_MARK"; } || true' EXIT

SF_DIR=${1:-.scale/sf1}
COPIES=${2:-10}
OUT=${3:-/tmp/verify_$(basename "$SF_DIR")}

if [ ! -f "$SF_DIR/documents.parquet" ]; then
  echo "== generating $SF_DIR (${COPIES}x sf0.1)"
  python3 tools/scale_gen.py /root/testdata/sf0.1 "$SF_DIR" "$COPIES"
fi

export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
echo "== dumping the full registry via graft.Verify ($SF_DIR -> $OUT, cpus=$SPARK_GRAFT_CPUS, heap=${SPARK_DRIVER_MEM:-8g default})"
sbt -batch "runMain graft.Verify $SF_DIR $OUT"

# Staged-oracle drift guard (VERDICT r13 item 4): before leaning on a
# staged form as the sf10 fallback, prove each one is row-identical to
# its composed twin at sf0.01 (cheap, ~2 min). A staged-SQL edit that
# diverges fails HERE, not a full round later at the next 100x gate.
if [ -d /root/testdata/sf0.01 ]; then
  echo "== staged == composed identity check (sf0.01)"
  python3 tools/check.py --staged-both /root/testdata/sf0.01 "$OUT"
fi

echo "== sequential memory-capped DuckDB oracle replay"
python3 tools/check.py "$SF_DIR" "$OUT"
