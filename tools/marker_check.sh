#!/usr/bin/env bash
# Pins the round-15 marker-liveness fix (VERDICT r14 "What's wrong" #2,
# observed live: a dead gate's stale marker pid was recycled and a
# provably-quiet bench recorded gate_overlap:true; symmetrically
# sf_gate.sh would refuse with exit 3 against a non-gate process that
# merely recycled the pid). Exercises tools/sf_gate.sh --check-markers
# and tools/check.py's _writer_live on the REAL /tmp marker paths, so
# it refuses to run while a real gate is live.
set -euo pipefail
cd "$(dirname "$0")/.."

GATE_MARK=/tmp/graft_gate.running
BENCH_MARK=/tmp/graft_bench.running

starttime() { local s; s=$(cat "/proc/$1/stat"); echo "${s##*) }" | awk '{print $20}'; }

fail() { echo "MARKER CHECK FAIL: $*" >&2; exit 1; }

# writer_live <marker>: 0 iff the marker holds a pid:starttime token
# whose writer is currently alive (legacy bare-pid = stale by design).
writer_live() {
  [ -f "$1" ] || return 1
  local tok p s
  tok=$(cat "$1" 2>/dev/null) || return 1
  case "$tok" in
    *:*) p=${tok%%:*}; s=${tok##*:}
         [ -d "/proc/$p" ] && [ "$(starttime "$p" 2>/dev/null)" = "$s" ] ;;
    *) return 1 ;;
  esac
}

# Never disturb a real live writer — EITHER side (ADVICE r15: deleting a
# live bench's marker destroys its liveness signal mid-measure, so a
# subsequent real gate would no longer refuse and the contamination this
# marker system exists to prevent/record becomes invisible). Only stale
# markers are cleaned.
if writer_live "$GATE_MARK"; then
  fail "a live gate owns $GATE_MARK ($(cat "$GATE_MARK")) — run later"
fi
if writer_live "$BENCH_MARK"; then
  fail "a live bench owns $BENCH_MARK ($(cat "$BENCH_MARK")) — run later"
fi
rm -f "$GATE_MARK" "$BENCH_MARK"

echo "== 1. legacy bare-pid marker (pre-round-15 format) is stale: gate starts and deletes it"
echo "1" > "$GATE_MARK"          # pid 1 is alive, but bare-pid = legacy = stale
tools/sf_gate.sh --check-markers >/dev/null \
  || fail "guard refused against a legacy bare-pid marker (exit $?)"
[ ! -f "$GATE_MARK" ] || [ "$(cat "$GATE_MARK" 2>/dev/null)" != "1" ] \
  || fail "legacy marker not cleaned"
rm -f "$GATE_MARK"

echo "== 2. recycled pid (live pid, WRONG starttime) is stale: gate starts and deletes it"
echo "1:424242" > "$GATE_MARK"   # pid 1 is live; starttime can never be 424242 twice
tools/sf_gate.sh --check-markers >/dev/null \
  || fail "guard refused against a recycled-pid marker (exit $?)"
rm -f "$GATE_MARK"
echo "1:424242" > "$BENCH_MARK"  # same hazard on the bench side
tools/sf_gate.sh --check-markers >/dev/null \
  || fail "guard refused against a recycled-pid BENCH marker (exit $?)"
[ ! -f "$BENCH_MARK" ] || fail "stale bench marker not deleted"
rm -f "$GATE_MARK"

echo "== 3. genuinely live writer still refuses (exit 3)"
sleep 300 &
SPID=$!
echo "$SPID:$(starttime $SPID)" > "$GATE_MARK"
set +e
tools/sf_gate.sh --check-markers >/dev/null 2>&1
RC=$?
set -e
kill "$SPID" 2>/dev/null || true
[ "$RC" = "3" ] || fail "guard did NOT refuse against a live gate (exit $RC)"
rm -f "$GATE_MARK"

echo "== 4. check.py _writer_live agrees on all three cases"
python3 - <<'EOF'
import os, subprocess, sys
sys.path.insert(0, "tools")
import check

assert not check._writer_live("1"), "legacy bare pid must be stale"
assert not check._writer_live("1:424242"), "recycled pid must be stale"
assert not check._writer_live("garbage"), "garbage must be stale"
assert not check._writer_live(""), "empty must be stale"
assert check._writer_live(check._self_token()), "own token must be live"
p = subprocess.Popen(["sleep", "300"])
tok = f"{p.pid}:{check._starttime(p.pid)}"
assert check._writer_live(tok), "live child token must be live"
p.kill(); p.wait()
assert not check._writer_live(tok), "dead child token must be stale"
print("check.py _writer_live: all cases agree")
EOF

# Final cleanup removes only OUR test debris — a real writer that
# started mid-check keeps its marker (same live-writer rule as above).
writer_live "$GATE_MARK"  || rm -f "$GATE_MARK"
writer_live "$BENCH_MARK" || rm -f "$BENCH_MARK"
echo "MARKER CHECK PASS"
