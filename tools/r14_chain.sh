#!/bin/bash
# Round-14 close-out validation chain (run via nohup; logs in /tmp/r14_*.log)
cd /root/repo
rm -rf /tmp/v14_001 /tmp/v14_01 /tmp/v14_1 /tmp/r14_chain_done
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v14_01" > /tmp/r14_verify01.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.01 /tmp/v14_01 > /tmp/r14_diff01.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v14_001" > /tmp/r14_verify001.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.001 /tmp/v14_001 > /tmp/r14_diff001.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v14_1" > /tmp/r14_verify1.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LAST.json sbt -batch "runMain graft.Bench" > /tmp/r14_bench.log 2>&1
sbt -batch test > /tmp/r14_test.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.1 /tmp/v14_1 > /tmp/r14_diff1.log 2>&1
echo ALL_DONE > /tmp/r14_chain_done
