#!/bin/bash
# Full regen-simulation gate: every codified sim shape standalone, then the
# composed gauntlet (widths -> decimal -> nanosdir -> hive stacked). Run
# whenever Tables.scala or any oracle SQL changes (CLAUDE.md discipline —
# regens are the only failure class that has ever produced a red round).
# Usage: bash tools/run_sims.sh [srcSfDir]   (default /root/testdata/sf0.01)
set -e
cd "$(dirname "$0")/.."
SRC=${1:-/root/testdata/sf0.01}
for sim in widths nanosdir f32meas millis decimal dirall hive encoding; do
  rm -rf /tmp/rs_$sim /tmp/rsout_$sim
  python3 tools/regen_sim.py $sim "$SRC" /tmp/rs_$sim > /dev/null 2>&1
  sbt -batch "runMain graft.Verify /tmp/rs_$sim /tmp/rsout_$sim" > /tmp/rs_$sim.log 2>&1
  n=$(python3 tools/diff_oracle.py /tmp/rs_$sim /tmp/rsout_$sim 2>&1 | grep -c ": MATCH" || true)
  bad=$(python3 tools/diff_oracle.py /tmp/rs_$sim /tmp/rsout_$sim 2>&1 | grep -v ": MATCH" | head -5)
  echo "SIM $sim: $n MATCH; nonmatch: ${bad:-none}"
done
rm -rf /tmp/rs_c1 /tmp/rs_c2 /tmp/rs_c3 /tmp/rs_c4 /tmp/rsout_comp
python3 tools/regen_sim.py widths "$SRC" /tmp/rs_c1 > /dev/null 2>&1
python3 tools/regen_sim.py decimal /tmp/rs_c1 /tmp/rs_c2 > /dev/null 2>&1
python3 tools/regen_sim.py nanosdir /tmp/rs_c2 /tmp/rs_c3 > /dev/null 2>&1
python3 tools/regen_sim.py hive /tmp/rs_c3 /tmp/rs_c4 > /dev/null 2>&1
sbt -batch "runMain graft.Verify /tmp/rs_c4 /tmp/rsout_comp" > /tmp/rs_comp.log 2>&1
n=$(python3 tools/diff_oracle.py /tmp/rs_c4 /tmp/rsout_comp 2>&1 | grep -c ": MATCH" || true)
bad=$(python3 tools/diff_oracle.py /tmp/rs_c4 /tmp/rsout_comp 2>&1 | grep -v ": MATCH" | head -5)
echo "SIM composed(widths+decimal+nanosdir+hive): $n MATCH; nonmatch: ${bad:-none}"
