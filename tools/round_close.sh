#!/bin/bash
# Round-close chain (the r11-proven sequence): full test suite -> full
# sf0.01 Verify + DuckDB gate replica -> full sf0.1 Bench -> sf0.1
# oracle dump + oracle_bench -> fresh-JVM A/B (top-10 + round-over-round
# movers) -> merge into bench/full_r<k>.json -> final ratio print.
set -e
R=${1:?round number}
cd /root/repo

echo "=== [1/6] sbt test ==="
sbt -batch test 2>&1 | tail -5

echo "=== [2/6] full Verify sf0.01 + gate ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r${R}" > /tmp/verify_r${R}.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r${R} > /tmp/gate_r${R}.txt 2>&1 || true
tail -1 /tmp/gate_r${R}.txt
grep -c "^PASS" /tmp/gate_r${R}.txt || true
grep "^FAIL" /tmp/gate_r${R}.txt || echo "(no FAIL lines)"

echo "=== [3/6] full Bench sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"metric".*}' > /tmp/bench_r${R}.json
python3 -c "import json; j=json.load(open('/tmp/bench_r${R}.json')); print('bench total', j['value'], 'failed', j['failed'])"

echo "=== [4/6] sf0.1 oracle dump + oracle_bench ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vdump_r${R} q_noop" > /tmp/vdump_r${R}.log 2>&1
python3 tools/oracle_bench.py /root/testdata/sf0.1 /tmp/vdump_r${R}/oracle_sql.json /tmp/oracle_r${R}.json 2>&1 | tail -3

echo "=== [5/6] fresh-JVM A/B (top-10 + movers vs r$((R-1))) ==="
python3 tools/fresh_bench.py /tmp/bench_r${R}.json /tmp/fresh_r${R}.json 10 \
  /root/testdata/sf0.1 bench/full_r$((R-1)).json 2>&1 | tail -25

echo "=== [6/6] merge + final ratio ==="
python3 tools/merge_bench.py /tmp/bench_r${R}.json /tmp/oracle_r${R}.json \
  bench/full_r${R}.json /tmp/fresh_r${R}.json
python3 -c "
import json
j = json.load(open('bench/full_r${R}.json'))
qs, os_ = j['queries'], j['oracle_sec']
pairs = [(q, qs[q], os_[q]) for q in qs if q in os_ and os_[q] and qs[q]]
ts, to = sum(p[1] for p in pairs), sum(p[2] for p in pairs)
print(f'FINAL r${R}: spark {ts:.1f}s vs duckdb {to:.1f}s over {len(pairs)} pairs = {ts/to:.2f}x')
"
echo "=== chain complete ==="
