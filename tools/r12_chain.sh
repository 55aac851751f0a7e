#!/bin/bash
# Round-12 close-out validation chain (run via nohup; logs in /tmp/r12_*.log)
cd /root/repo
rm -rf /tmp/v12_001 /tmp/v12_01 /tmp/v12_1 /tmp/r12_chain_done
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v12_01" > /tmp/r12_verify01.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.01 /tmp/v12_01 > /tmp/r12_diff01.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v12_001" > /tmp/r12_verify001.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.001 /tmp/v12_001 > /tmp/r12_diff001.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v12_1" > /tmp/r12_verify1.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LAST.json sbt -batch "runMain graft.Bench" > /tmp/r12_bench.log 2>&1
sbt -batch test > /tmp/r12_test.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.1 /tmp/v12_1 > /tmp/r12_diff1.log 2>&1
echo ALL_DONE > /tmp/r12_chain_done
