#!/bin/bash
# Full test suite in three pytest processes.
#
# Why not one: a single ~25-min pytest process on this box occasionally dies
# with a Fatal Python segfault inside XLA-CPU backend_compile after a few
# hundred JIT compiles (observed twice, at different, individually-passing
# tests — once compiling a bare jax.random.normal). Memory is not the cause
# (>110 GB free at crash time). Splitting the suite into fresh processes
# bounds the per-process compile count and has never reproduced the crash.
#
# Usage: bash scripts/run_tests.sh [extra pytest args, e.g. -m "not slow"]
set -u
cd "$(dirname "$0")/.."
rc=0
for pat in 'tests/test_[a-f]*.py' 'tests/test_[g-r]*.py' 'tests/test_[s-z]*.py'; do
  echo "=== pytest $pat ==="
  # shellcheck disable=SC2086
  python -m pytest $pat -q "$@" || rc=$?
done
exit $rc
