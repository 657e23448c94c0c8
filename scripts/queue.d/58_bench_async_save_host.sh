#!/bin/bash
# Re-measure the two --async-save rows after the host-snapshot fix
# (train/loops.py): the first drain's device-snapshot async rows
# RESOURCE_EXHAUSTED at the flagship batch. With the host snapshot the
# npz async row should recover most of npz sync's +93 s/save wall cost
# (serialize+write hidden on the worker; only the D2H blocks the loop).
set -e
cd "$(dirname "$0")/../.."
timeout 7200 python scripts/bench_async_save.py --steps 30 --only async
