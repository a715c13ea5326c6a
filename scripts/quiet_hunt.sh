#!/bin/bash
# Quiet-window hunter: run the probes-only bench repeatedly; each sample's
# gen-control scaling efficiency tells whether the host window is clean
# (>=0.8) or bandwidth-stolen. Every sample is archived; the first quiet
# sample is copied to BENCH/ as the round's direct >=0.8 reading.
#
# Usage: scripts/quiet_hunt.sh [max_samples] [sleep_between_s]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-12}
NAP=${2:-60}
mkdir -p /tmp/graft_hunt
for i in $(seq 1 "$MAX"); do
  ts=$(date +%H%M%S)
  log=/tmp/graft_hunt/probe_${ts}.log
  SPARK_GRAFT_SKIP_SWEEP=1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
    sbt -batch 'runMain graft.Bench' > "$log" 2>&1
  json=$(grep -o '{"metric".*}' "$log" | tail -1)
  if [ -z "$json" ]; then echo "[hunt $i $ts] bench FAILED (see $log)"; sleep "$NAP"; continue; fi
  echo "$json" > "/tmp/graft_hunt/probe_${ts}.json"
  read -r gen eff deff aeff ieff <<<"$(python3 - "$json" <<'EOF'
import json, sys
r = json.loads(sys.argv[1])
keys = [k for k in r if k.startswith("scaling_efficiency")]
print(r["gen_control_scaling_efficiency"], r[keys[0]],
      r["dedup_scaling_efficiency"], r["ann_scaling_efficiency"],
      r["ivf_scaling_efficiency"])
EOF
)"
  echo "[hunt $i $ts] gen=$gen validate=$eff dedup=$deff ann=$aeff ivf=$ieff"
  quiet=$(python3 -c "print(1 if float('$gen') >= 0.8 else 0)")
  if [ "$quiet" = "1" ]; then
    cp "/tmp/graft_hunt/probe_${ts}.json" BENCH/bench_r5_quiet_probe.json
    echo "[hunt] QUIET WINDOW at $ts -> BENCH/bench_r5_quiet_probe.json"
    exit 0
  fi
  sleep "$NAP"
done
echo "[hunt] no quiet window in $MAX samples"
exit 1
