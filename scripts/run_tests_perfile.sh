#!/bin/bash
# Full-suite CPU test run, one pytest process per test file.
#
# Why per-file: the full suite in ONE process has twice segfaulted the
# XLA *CPU* compiler around test #50 (accumulated compiled-program
# state; every test passes in isolation -- see CLAUDE.md).  Per-file
# processes bound the accumulation and make the whole suite demonstrably
# green in one recorded run (round-4 VERDICT item 7).
#
#   bash scripts/run_tests_perfile.sh [outfile]
#
# Writes a per-file PASS/FAIL table + summary to stdout and to the
# outfile (default results/testlog_perfile.txt), exiting non-zero if any
# file fails.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-results/testlog_perfile.txt}"
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
fail=0
total_pass=0
total_fail=0
for f in tests/test_*.py; do
  t0=$(date +%s)
  line=$(timeout 3000 python -m pytest "$f" -q --no-header 2>&1 | tail -1)
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  if [ $rc -ne 0 ]; then
    fail=1
    total_fail=$((total_fail + 1))
    echo "FAIL $f (${dt}s, rc=$rc): $line" | tee -a "$OUT"
  else
    total_pass=$((total_pass + 1))
    echo "PASS $f (${dt}s): $line" | tee -a "$OUT"
  fi
done
echo "---" | tee -a "$OUT"
echo "files: $total_pass passed, $total_fail failed ($(date -u +%FT%TZ))" \
  | tee -a "$OUT"
exit $fail
