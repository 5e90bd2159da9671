#!/bin/bash
# Full regen-simulation gate: every codified sim shape standalone, then the
# composed gauntlet (widths -> decimal -> nanosdir -> hive stacked). Run
# whenever Tables.scala or any oracle SQL changes (CLAUDE.md discipline —
# regens are the only failure class that has ever produced a red round).
# Usage: bash tools/run_sims.sh [srcSfDir]   (default /root/testdata/sf0.01)
set -e
cd "$(dirname "$0")/.."
SRC=${1:-/root/testdata/sf0.01}

# one Verify + ONE oracle compare per shape (the compare re-runs every oracle
# SQL in DuckDB — minutes at sf0.01 — so its output is captured, not re-run)
check() { # check <label> <simDir> <outDir>
  sbt -batch "runMain graft.Verify $2 $3" > "/tmp/rs_$1.log" 2>&1 ||
    { echo "SIM $1: VERIFY FAILED (see /tmp/rs_$1.log)"; return 1; }
  python3 tools/diff_oracle.py "$2" "$3" > "/tmp/rs_$1.diff" 2>&1 || true
  local n bad
  n=$(grep -c ": MATCH" "/tmp/rs_$1.diff" || true)
  bad=$(grep -v ": MATCH" "/tmp/rs_$1.diff" | head -5)
  echo "SIM $1: $n MATCH; nonmatch: ${bad:-none}"
}

for sim in widths nanosdir f32meas millis decimal dirall hive encoding; do
  rm -rf /tmp/rs_$sim /tmp/rsout_$sim
  python3 tools/regen_sim.py $sim "$SRC" /tmp/rs_$sim > /dev/null 2>&1
  check $sim /tmp/rs_$sim /tmp/rsout_$sim
done
rm -rf /tmp/rs_c1 /tmp/rs_c2 /tmp/rs_c3 /tmp/rs_c4 /tmp/rsout_comp
python3 tools/regen_sim.py widths "$SRC" /tmp/rs_c1 > /dev/null 2>&1
python3 tools/regen_sim.py decimal /tmp/rs_c1 /tmp/rs_c2 > /dev/null 2>&1
python3 tools/regen_sim.py nanosdir /tmp/rs_c2 /tmp/rs_c3 > /dev/null 2>&1
python3 tools/regen_sim.py hive /tmp/rs_c3 /tmp/rs_c4 > /dev/null 2>&1
# the composed gauntlet: all four layout/type shapes stacked in one copy
check composed /tmp/rs_c4 /tmp/rsout_comp
