#!/usr/bin/env bash
# CI pipeline: lint + native build/test + python test suite.
# (The reference's CI is lint-only — .github/workflows/lint.yml; this adds
# build and test jobs per SURVEY §4's "stronger test story" requirement.)
set -e
cd "$(dirname "$0")"

echo "== lint (compile check) =="
python -m compileall -q wetts_tpu tools bench.py __graft_entry__.py

echo "== native build + tests =="
cmake -B native/build native -G Ninja -DWETTS_BUILD_JNI=ON >/dev/null
cmake --build native/build >/dev/null
./native/build/text_frontend_test
./native/build/wav_test

echo "== python tests =="
# default: the fast suite (slow = multi-minute compile-heavy e2e tests:
# overfit smoke, DP equivalence, recipe e2e, multihost, full-size parity).
# `./ci.sh --full` runs everything — the per-round / nightly gate.
if [ "${1:-}" = "--full" ]; then
  python -m pytest tests/ -q --durations=15
else
  # -n 2 --dist loadfile: the fast suite is XLA:CPU-compile-bound and
  # compiles are mostly single-threaded, so two workers nearly halve the
  # wall time on this 2-core host; loadfile keeps each module's scoped
  # fixtures (compiled engines/models) on one worker
  python -m pytest tests/ -q -m "not slow" -n 2 --dist loadfile \
    --durations=15
fi

echo "CI OK"
