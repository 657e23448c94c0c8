"""XLA/libtpu flag sweep for the sampling headline (PERF.md round-2).

The only compiler-level lever not yet tried for the HBM-bound unet64
forward is giving XLA's fusions more scoped VMEM to work with (bigger
fusion tiles => fewer HBM round-trips). Flags must be set before backend
init, so each config runs bench.py in a subprocess.

Run on TPU:  python scripts/bench_xla_flags.py
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("default", ""),
    ("scoped_vmem_32M", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("scoped_vmem_64M", "--xla_tpu_scoped_vmem_limit_kib=65536"),
]


def main():
    for label, extra in CONFIGS:
        env = dict(os.environ)
        if extra:
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "") + " " + extra
            ).strip()
        # libtpu init args are process-global and NOT part of JAX's
        # persistent-cache key — a shared cache dir would hand the vmem
        # configs the default-flag executable and the sweep would measure
        # nothing. One cache dir per config keeps re-runs warm without
        # cross-contamination.
        base_cache = env.get("JAX_COMPILATION_CACHE_DIR")
        if base_cache:
            env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
                base_cache, f"xla_flags_{label}"
            )
        res = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, env=env, timeout=1500,
        )
        line = None
        for out_line in res.stdout.splitlines():
            try:
                line = json.loads(out_line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        if line is None:
            print(f"{label:20s} FAILED\n{res.stdout[-500:]}\n"
                  f"{res.stderr[-500:]}")
            continue
        print(f"{label:20s} {line['value']:12.0f} {line['unit']} "
              f"(vs_baseline {line['vs_baseline']:.1f})", flush=True)


if __name__ == "__main__":
    main()
