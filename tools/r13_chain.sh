#!/bin/bash
# Round-13 close-out validation chain (run via nohup; logs in /tmp/r13_*.log)
cd /root/repo
rm -rf /tmp/v13_001 /tmp/v13_01 /tmp/v13_1 /tmp/r13_chain_done
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v13_01" > /tmp/r13_verify01.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.01 /tmp/v13_01 > /tmp/r13_diff01.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v13_001" > /tmp/r13_verify001.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.001 /tmp/v13_001 > /tmp/r13_diff001.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v13_1" > /tmp/r13_verify1.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LAST.json sbt -batch "runMain graft.Bench" > /tmp/r13_bench.log 2>&1
sbt -batch test > /tmp/r13_test.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.1 /tmp/v13_1 > /tmp/r13_diff1.log 2>&1
echo ALL_DONE > /tmp/r13_chain_done
