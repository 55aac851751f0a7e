#!/bin/bash
# Round-11 close-out validation chain (run via nohup; logs in /tmp/r11_*.log)
cd /root/repo
rm -rf /tmp/v11_001 /tmp/v11_01 /tmp/v11_1 /tmp/r11_chain_done
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v11_01" > /tmp/r11_verify01.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.01 /tmp/v11_01 > /tmp/r11_diff01.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v11_001" > /tmp/r11_verify001.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.001 /tmp/v11_001 > /tmp/r11_diff001.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v11_1" > /tmp/r11_verify1.log 2>&1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LAST.json sbt -batch "runMain graft.Bench" > /tmp/r11_bench.log 2>&1
sbt -batch test > /tmp/r11_test.log 2>&1
python3 tools/diffcheck.py /root/testdata/sf0.1 /tmp/v11_1 > /tmp/r11_diff1.log 2>&1
echo ALL_DONE > /tmp/r11_chain_done
