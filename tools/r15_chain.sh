#!/bin/bash
# Round-15 close-out validation chain (run via nohup; logs in /tmp/r15_*.log)
cd /root/repo
rm -rf /tmp/v15_001 /tmp/v15_01 /tmp/v15_1 /tmp/r15_chain_done
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v15_01" > /tmp/r15_verify01.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.01 /tmp/v15_01 > /tmp/r15_diff01.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v15_001" > /tmp/r15_verify001.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.001 /tmp/v15_001 > /tmp/r15_diff001.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v15_1" > /tmp/r15_verify1.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LAST.json sbt -batch "runMain graft.Bench" > /tmp/r15_bench.log 2>&1
sbt -batch test > /tmp/r15_test.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.1 /tmp/v15_1 > /tmp/r15_diff1.log 2>&1
echo ALL_DONE > /tmp/r15_chain_done
