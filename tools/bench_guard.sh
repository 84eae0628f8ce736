#!/usr/bin/env bash
# Guard the driver-parseable bench contract (closed in round 14 after 13
# rounds of `parsed: null`): the LAST stdout line of
# `sbt -batch "runMain graft.Bench"` must be bare JSON with `n_errors`
# present — no `[info]` prefix, no `[success]` epilogue, nothing printed
# after the summary. One sbt/log-config change could silently reopen it;
# this script fails loudly instead. Run from /root/repo (the verify
# skill's recipe includes it).
set -u
cd "$(dirname "$0")/.."
out=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
      SPARK_GRAFT_BENCH_FILTER=q01 SPARK_GRAFT_BENCH_SAMPLES=1 \
      sbt -batch "runMain graft.Bench" 2>/dev/null)
rc=$?
if [ $rc -ne 0 ]; then
  echo "[bench_guard] FAIL: sbt exited $rc"
  exit 1
fi
last=$(printf '%s\n' "$out" | tail -n 1)
printf '%s\n' "$last" | python3 -c '
import json, sys
line = sys.stdin.read().strip()
try:
    d = json.loads(line)
except Exception as e:
    sys.exit("[bench_guard] FAIL: last stdout line is not JSON (%s): %r"
             % (e, line[:200]))
for k in ("metric", "value", "n_queries", "n_errors"):
    if k not in d:
        sys.exit("[bench_guard] FAIL: key %r missing from summary: %r"
                 % (k, line[:200]))
if d["n_errors"] != 0:
    sys.exit("[bench_guard] FAIL: n_errors=%s" % d["n_errors"])
print("[bench_guard] OK: last stdout line is parseable bench JSON "
      "(n_queries=%s, n_errors=0)" % d["n_queries"])
'
