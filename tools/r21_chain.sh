#!/bin/bash
# Round-20 close-out validation chain (run via nohup; logs in /tmp/r21_*.log)
cd /root/repo
rm -rf /tmp/v21_001 /tmp/v21_01 /tmp/v21_1 /tmp/r21_chain_done /tmp/r21_bench_attempt1.json
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v21_01" > /tmp/r21_verify01.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.01 /tmp/v21_01 > /tmp/r21_diff01.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v21_001" > /tmp/r21_verify001.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.001 /tmp/v21_001 > /tmp/r21_diff001.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v21_1" > /tmp/r21_verify1.log 2>&1
# Weather-gated bench (BASELINE.md "Weather normalization"): if the run's
# own anchor_drift says the box was unstable (>25% in either direction),
# re-run ONCE and keep the calmer run's artifact.
BENCH_START_FILE=/tmp/r21_bench_start
run_bench() {
  touch "$BENCH_START_FILE"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LAST.json \
    sbt -batch "runMain graft.Bench" > "$1" 2>&1
}
drift_bad() {  # exit 0 when drift is OUTSIDE [1/1.25, 1.25] — FAIL CLOSED:
  # a missing/corrupt/stale artifact (bench crashed) is treated as bad
  # weather, not as calm (ADVICE r14: json.load raising made the chain
  # proceed with a stale artifact the spill gate then validated as fresh)
  python3 - "$BENCH_START_FILE" <<'EOF'
import json, math, os, sys
try:
    art = '/root/repo/BENCH_LAST.json'
    if os.path.getmtime(art) < os.path.getmtime(sys.argv[1]):
        sys.exit(0)  # artifact predates this bench invocation — stale
    d = json.load(open(art)).get('anchor_drift', 1.0)
    sys.exit(0 if abs(math.log(d)) > math.log(1.25) else 1)
except Exception:
    sys.exit(0)  # unreadable artifact = treat as bad, never as calm
EOF
}
run_bench /tmp/r21_bench.log
if drift_bad; then
  echo "anchor_drift out of band; re-running bench once" >> /tmp/r21_bench.log
  # snapshot attempt 1 ONLY if its artifact postdates this chain's first
  # bench start (ADVICE r17: a crashed first run leaves a STALE artifact
  # from an earlier round — often with a small drift — which the calmer
  # pick below would then restore over the fresh re-run)
  if [ /root/repo/BENCH_LAST.json -nt "$BENCH_START_FILE" ]; then
    cp /root/repo/BENCH_LAST.json /tmp/r21_bench_attempt1.json 2>/dev/null
  else
    rm -f /tmp/r21_bench_attempt1.json  # stale/missing = drift inf below
  fi
  run_bench /tmp/r21_bench2.log
  if drift_bad; then
    echo "WEATHER_UNSTABLE: both bench runs exceeded 25% anchor drift (or artifact unreadable)" > /tmp/r21_weather_flag
  fi
  # keep the CALMER run's artifact (review r17: the re-run used to win
  # unconditionally, so a 60%-drift retry could replace a 30%-drift
  # first attempt)
  python3 - <<'EOF'
import json, math, shutil
def drift(p):
    try:
        return abs(math.log(json.load(open(p)).get('anchor_drift', 1.0)))
    except Exception:
        return float('inf')
cur = '/root/repo/BENCH_LAST.json'
prev = '/tmp/r21_bench_attempt1.json'
if drift(prev) < drift(cur):
    shutil.copy(prev, cur)
    print('restored calmer first attempt')
EOF
fi
sbt -batch test > /tmp/r21_test.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.1 /tmp/v21_1 > /tmp/r21_diff1.log 2>&1
echo ALL_DONE > /tmp/r21_chain_done
