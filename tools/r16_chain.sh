#!/bin/bash
# Round-15 close-out validation chain (run via nohup; logs in /tmp/r16_*.log)
cd /root/repo
rm -rf /tmp/v16_001 /tmp/v16_01 /tmp/v16_1 /tmp/r16_chain_done
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v16_01" > /tmp/r16_verify01.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.01 /tmp/v16_01 > /tmp/r16_diff01.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v16_001" > /tmp/r16_verify001.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.001 /tmp/v16_001 > /tmp/r16_diff001.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v16_1" > /tmp/r16_verify1.log 2>&1
# Weather-gated bench (BASELINE.md "Weather normalization"): if the run's
# own anchor_drift says the box was unstable (>25% in either direction),
# re-run ONCE and keep the calmer run's artifact.
CHAIN_START=$(date +%s)
run_bench() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LAST.json \
    sbt -batch "runMain graft.Bench" > "$1" 2>&1
}
drift_bad() {  # exit 0 when drift is OUTSIDE [1/1.25, 1.25]
  # fail CLOSED: a missing/corrupt artifact (bench crashed) must read as
  # "bad run", never as calm-with-a-stale-artifact (ADVICE r15)
  python3 - "$CHAIN_START" <<'EOF'
import json, math, os, sys
try:
    path = '/root/repo/BENCH_LAST.json'
    if os.path.getmtime(path) < float(sys.argv[1]):
        sys.exit(0)  # artifact predates this chain: the bench never wrote
    d = json.load(open(path)).get('anchor_drift', 1.0)
    sys.exit(0 if abs(math.log(d)) > math.log(1.25) else 1)
except Exception:
    sys.exit(0)  # unreadable artifact = bad run
EOF
}
run_bench /tmp/r16_bench.log
if drift_bad; then
  echo "anchor_drift out of band; re-running bench once" >> /tmp/r16_bench.log
  cp /root/repo/BENCH_LAST.json /tmp/r16_bench_attempt1.json
  run_bench /tmp/r16_bench2.log
  if drift_bad; then
    echo "WEATHER_UNSTABLE: both bench runs exceeded 25% anchor drift" > /tmp/r16_weather_flag
  fi
fi
sbt -batch test > /tmp/r16_test.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.1 /tmp/v16_1 > /tmp/r16_diff1.log 2>&1
echo ALL_DONE > /tmp/r16_chain_done
