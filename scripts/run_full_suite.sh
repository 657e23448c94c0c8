#!/bin/bash
# Full test suite in three serialized chunks for the 1-core host (one pytest
# process at a time; a monolithic run needs >1 h and a single timeout).
# Usage: bash scripts/run_full_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS

fail=0
run() {
  echo "=== chunk: $* ==="
  timeout 3600 python -m pytest -q --durations=15 "$@" || fail=1
}

# 1. Fast suite (~4 min).
run tests/ -m "not slow"
# 2. Slow e2e/train/parity except the CLI smokes (~35 min).
run tests/ -m "slow" --ignore=tests/test_cli_smoke.py
# 3. CLI smokes (~15 min; session-scoped checkpoint fixtures).
run tests/test_cli_smoke.py -m "slow"

if [ "$fail" -eq 0 ]; then echo "FULL SUITE: ALL GREEN"; else
  echo "FULL SUITE: FAILURES (see above)"; fi
exit "$fail"
