#!/bin/bash
# Round-close chain (the r11-proven sequence): full test suite -> full
# sf0.01 Verify + DuckDB gate replica -> full sf0.1 Bench -> sf0.1
# oracle dump + oracle_bench -> fresh-JVM A/B (top-10 + round-over-round
# movers) -> merge into bench/full_r<k>.json -> final ratio print.
#
# HARDENED after round 13 shipped with steps 4-6 silently missing (the
# SURVEY cited a merge artifact that never existed): every step now
# (a) fails LOUDLY with its name, (b) stamps /tmp/close_r<k>_step<n>.done
# on success and is SKIPPED on re-run when both the stamp and the step's
# artifact exist, so a wall-clock overrun resumes mid-chain instead of
# dropping the ratio. Force a full re-run with: rm /tmp/close_r<k>_step*.done
set -euo pipefail
R=${1:?round number}
cd /root/repo

stamp() { touch "/tmp/close_r${R}_step$1.done"; }
skip() { # skip step $1 if stamped AND artifact $2 exists
  [[ -f "/tmp/close_r${R}_step$1.done" && -s "$2" ]]
}
fail() { echo "!!! round_close step $1 FAILED ($2) — fix and re-run; completed steps resume from stamps" >&2; exit 1; }

echo "=== [1/6] sbt test ==="
if skip 1 /tmp/close_r${R}_test.log; then echo "(stamped — skipping)"; else
  sbt -batch test > /tmp/close_r${R}_test.log 2>&1 || { tail -20 /tmp/close_r${R}_test.log; fail 1 "sbt test"; }
  tail -5 /tmp/close_r${R}_test.log
  grep -q "All tests passed." /tmp/close_r${R}_test.log || fail 1 "test failures in /tmp/close_r${R}_test.log"
  stamp 1
fi

echo "=== [2/6] full Verify sf0.01 + gate ==="
if skip 2 /tmp/gate_r${R}.txt; then echo "(stamped — skipping)"; tail -1 /tmp/gate_r${R}.txt; else
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r${R}" > /tmp/verify_r${R}.log 2>&1 \
    || { tail -20 /tmp/verify_r${R}.log; fail 2 "Verify sf0.01"; }
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r${R} > /tmp/gate_r${R}.txt 2>&1 \
    || fail 2 "check_oracle did not complete (see /tmp/gate_r${R}.txt)"
  tail -1 /tmp/gate_r${R}.txt
  grep -c "^PASS" /tmp/gate_r${R}.txt || true
  grep "^FAIL" /tmp/gate_r${R}.txt || echo "(no FAIL lines)"
  stamp 2
fi

echo "=== [3/6] full Bench sf0.1 ==="
if skip 3 /tmp/bench_r${R}.json; then echo "(stamped — skipping)"; else
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_r${R}.log 2>&1 \
    || { tail -20 /tmp/bench_r${R}.log; fail 3 "Bench"; }
  grep -o '{"metric".*}' /tmp/bench_r${R}.log > /tmp/bench_r${R}.json || fail 3 "no JSON line in Bench output"
  stamp 3
fi
python3 -c "import json; j=json.load(open('/tmp/bench_r${R}.json')); print('bench total', j['value'], 'failed', j['failed'], 'rerun_guard', j.get('rerun_guard'))" \
  || fail 3 "Bench JSON unparseable"

echo "=== [4/6] sf0.1 oracle dump + oracle_bench ==="
if skip 4 /tmp/oracle_r${R}.json; then echo "(stamped — skipping)"; else
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vdump_r${R} q_noop" > /tmp/vdump_r${R}.log 2>&1 \
    || { tail -20 /tmp/vdump_r${R}.log; fail 4 "oracle SQL dump"; }
  [[ -s /tmp/vdump_r${R}/oracle_sql.json ]] || fail 4 "missing /tmp/vdump_r${R}/oracle_sql.json"
  python3 tools/oracle_bench.py /root/testdata/sf0.1 /tmp/vdump_r${R}/oracle_sql.json /tmp/oracle_r${R}.json \
    > /tmp/oracle_r${R}.log 2>&1 || { tail -20 /tmp/oracle_r${R}.log; fail 4 "oracle_bench"; }
  tail -3 /tmp/oracle_r${R}.log
  stamp 4
fi

echo "=== [5/6] fresh-JVM A/B (top-10 + movers vs r$((R-1))) ==="
if skip 5 /tmp/fresh_r${R}.json; then echo "(stamped — skipping)"; else
  # movers baseline: the previous round's merged artifact, or (when a
  # round shipped without one — r13 did) the newest committed sweep
  PREV="bench/full_r$((R-1)).json"
  [[ -s "$PREV" ]] || PREV=$(ls -t bench/full_r*.json 2>/dev/null | head -1)
  echo "(movers baseline: $PREV)"
  python3 tools/fresh_bench.py /tmp/bench_r${R}.json /tmp/fresh_r${R}.json 10 \
    /root/testdata/sf0.1 "$PREV" > /tmp/fresh_r${R}.log 2>&1 \
    || { tail -20 /tmp/fresh_r${R}.log; fail 5 "fresh_bench"; }
  tail -25 /tmp/fresh_r${R}.log
  stamp 5
fi

echo "=== [6/6] merge + final ratio ==="
python3 tools/merge_bench.py /tmp/bench_r${R}.json /tmp/oracle_r${R}.json \
  bench/full_r${R}.json /tmp/fresh_r${R}.json || fail 6 "merge_bench"
[[ -s bench/full_r${R}.json ]] || fail 6 "bench/full_r${R}.json not written"
python3 -c "
import json
j = json.load(open('bench/full_r${R}.json'))
qs, os_ = j['queries'], j['oracle_sec']
pairs = [(q, qs[q], os_[q]) for q in qs if q in os_ and os_[q] and qs[q] and qs[q] > 0]
ts, to = sum(p[1] for p in pairs), sum(p[2] for p in pairs)
print(f'FINAL r${R}: spark {ts:.1f}s vs duckdb {to:.1f}s over {len(pairs)} pairs = {ts/to:.2f}x')
" || fail 6 "final ratio"
echo "=== chain complete — commit bench/full_r${R}.json ==="
