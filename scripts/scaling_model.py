"""Multi-chip scaling model from the compiled program, not hand-waving.

Single-chip rooflines are measured (PERF.md round 3/4); multi-chip
hardware is not available in this environment. What CAN be extracted
exactly is the **collective traffic the partitioner inserts** into the
flagship train step under each parallelism mode: this script jits the
same train step the CLI runs over an N-device mesh (virtual CPU devices
— SPMD partitioning is a platform-independent pass, so the collectives
and their shapes match what a real v5e slice would execute), parses the
post-partitioning HLO for all-reduce / all-gather / reduce-scatter /
collective-permute ops, and converts byte volumes into predicted ICI
time on a v5e slice via a bidirectional-ring model.

Model (documented assumptions, not measurements):
  - v5e ICI: 45 GB/s per link per direction, 2 links per mesh axis
    => W_axis = 90 GB/s bidirectional per chip per axis (the
    "How to Scale Your Model" numbers for v5e).
  - ring all-reduce of a full-size tensor V over a group of size G:
    moves 2*V*(G-1)/G  => time ~ 2*V*(G-1)/G / W_axis
  - all-gather producing V_full: moves V_full*(G-1)/G / W_axis
  - reduce-scatter producing V_out = V_full/G: V_out*(G-1) / W_axis
  - collective-permute: V one hop, one direction => V / (W_axis/2)

Weak-scaling efficiency is then bounded two ways against the measured
single-chip step time: no overlap (t / (t + comm)) and perfect overlap
(t / max(t, comm)); XLA's actual schedule lands between them.

Run (CPU, 8 virtual devices — set by this script):
    python scripts/scaling_model.py [--devices 8] [--per-chip-batch 16]
                                    [--measured-ms 388]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Must happen before jax initialises its backend.
_N_DEFAULT = 8
if "xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_N_DEFAULT}"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402

# The TPU plugin on this image re-appends itself to jax_platforms even when
# JAX_PLATFORMS=cpu is set in the environment (same workaround as
# __graft_entry__.dryrun_multichip) — pin CPU before the backend initialises
# so the virtual-device mesh exists and the real chip is never touched.
jax.config.update("jax_platforms", "cpu")

# v5e ICI (bidirectional per chip per mesh axis), bytes/s.
W_AXIS = 2 * 45e9
_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}

# `= f32[8,3]{1,0} all-reduce(` or `= (f32[..], bf16[..]) all-gather(`
_COLL_RE = re.compile(
    r"=\s+(\([^)]*\)|\S+)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(",
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_GROUPS_BRACE_RE = re.compile(r"replica_groups=\{\{([0-9,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[([0-9]+),([0-9]+)\]<=")


def _shape_bytes(shapes_text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shapes_text):
        if dtype not in _DTYPE_BYTES:
            continue  # token/opaque types carry no payload
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _group_size(line: str, world: int) -> int:
    m = _GROUPS_BRACE_RE.search(line)
    if m:
        return len(m.group(1).split(","))
    m = _GROUPS_IOTA_RE.search(line)
    if m:  # [num_groups, group_size]<=[world]
        return int(m.group(2))
    return world


def collect_collectives(hlo_text: str, world: int):
    """Per-op totals: count, payload bytes, predicted ICI seconds."""
    out = {}
    for line in hlo_text.splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        v = _shape_bytes(shapes)
        if v == 0:
            continue
        g = _group_size(line, world)
        if g <= 1:
            continue  # degenerate group: no wire traffic
        if op == "all-reduce":
            t = 2 * v * (g - 1) / g / W_AXIS
        elif op == "all-gather":
            t = v * (g - 1) / g / W_AXIS
        elif op == "reduce-scatter":
            t = v * (g - 1) / W_AXIS  # v is the scattered output
        elif op == "all-to-all":
            t = v * (g - 1) / g / W_AXIS
        else:  # collective-permute: one hop, one direction
            t = v / (W_AXIS / 2)
        rec = out.setdefault(op, {"count": 0, "bytes": 0, "seconds": 0.0})
        rec["count"] += 1
        rec["bytes"] += v
        rec["seconds"] += t
    return out


def build_loop(mode: str, global_batch: int, n_items: int):
    from vq_voice_swap_tpu.train import VQVAETrainLoop

    argv = [
        "--predictor", "unet", "--base-channels", "64",
        "--encoder", "unet128", "--class-cond", "--bf16",
        "--batch-size", str(global_batch),
        "--output-dir", "/tmp/scaling_model_ckpt",
    ]
    if mode == "fsdp":
        argv.append("--fsdp")
    elif mode == "tp":
        argv += ["--tensor-parallel", "2"]
    argv.append(f"tones:{n_items}")
    return VQVAETrainLoop(VQVAETrainLoop.arg_parser().parse_args(argv))


def analyze(mode: str, n_devices: int, per_chip_batch: int):
    global_batch = per_chip_batch * n_devices
    # tones:K has 3*K items; the loader needs >= one global batch.
    n_items = max(40, (global_batch + 2) // 3 + 1)
    loop = build_loop(mode, global_batch, n_items)
    assert loop.mesh.devices.size == n_devices, loop.mesh

    from vq_voice_swap_tpu.parallel import global_batch_from_local

    batch = loop.prepare_batch(next(iter(loop.data_loader)))
    device_batch = global_batch_from_local(loop.mesh, batch)
    compiled = loop.train_step.lower(
        loop.state, device_batch, jax.random.key(0), loop.frozen_ctx
    ).compile()
    colls = collect_collectives(compiled.as_text(), n_devices)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(loop.state.params)
    )
    return colls, n_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=_N_DEFAULT)
    ap.add_argument("--per-chip-batch", type=int, default=16)
    ap.add_argument(
        "--measured-ms", type=float, default=388.0,
        help="measured single-chip step time at --per-chip-batch "
             "(PERF.md round 4: batch-16 median 41.2 samples/s)",
    )
    ap.add_argument("--modes", default="dp,fsdp,tp")
    args = ap.parse_args()

    results = {}
    for mode in args.modes.split(","):
        colls, n_params = analyze(mode, args.devices, args.per_chip_batch)
        comm_ms = sum(r["seconds"] for r in colls.values()) * 1e3
        step = args.measured_ms
        results[mode] = {
            "collectives": colls,
            "comm_ms": comm_ms,
            "eff_no_overlap": step / (step + comm_ms),
            "eff_perfect_overlap": step / max(step, comm_ms),
        }
        print(f"\n=== {mode} over {args.devices} devices "
              f"(global batch {args.per_chip_batch * args.devices}, "
              f"params {n_params / 1e6:.1f}M) ===")
        for op, rec in sorted(colls.items()):
            print(f"  {op:20s} x{rec['count']:<4d} "
                  f"{rec['bytes'] / 1e6:10.1f} MB   "
                  f"{rec['seconds'] * 1e3:8.2f} ms (ring model)")
        print(f"  total predicted ICI time: {comm_ms:8.2f} ms "
              f"vs {step:.0f} ms step")
        print(f"  weak-scaling efficiency: "
              f"{results[mode]['eff_no_overlap'] * 100:5.1f}% (no overlap) "
              f"… {results[mode]['eff_perfect_overlap'] * 100:5.1f}% "
              f"(perfect overlap)")
    print("\n" + json.dumps(
        {
            "devices": args.devices,
            "per_chip_batch": args.per_chip_batch,
            "measured_step_ms": args.measured_ms,
            "modes": {
                m: {
                    "comm_ms": round(r["comm_ms"], 3),
                    "eff_no_overlap": round(r["eff_no_overlap"], 4),
                    "eff_perfect_overlap": round(
                        r["eff_perfect_overlap"], 4
                    ),
                }
                for m, r in results.items()
            },
        }
    ))


if __name__ == "__main__":
    main()
