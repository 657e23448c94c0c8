"""Fused Pallas TPU kernel for VQ nearest-neighbor assignment.

Replaces the XLA distance+argmin path of vq.py for the hot training loop:
one kernel computes, per input-vector tile, the codebook dot products on the
MXU, reduces the argmin in VMEM (never materialising the [B, D] distance
matrix in HBM), and accumulates the per-code "used" mask across the grid —
which feeds the usage tracker directly, replacing both the distance matrix
round-trip and the scatter in vq.update_usage.

Two exact-math simplifications vs. the naive distance:
  - ||x||^2 is constant per row, so it cannot change the argmin and is
    dropped.
  - dist = ||d||^2 - 2 x.d is formed in the kernel epilogue; ||d||^2 is
    computed once per call outside the kernel.

The public entry (vq_assign) falls back to the pure-XLA path off-TPU or for
shapes that do not tile cleanly.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "vq_assign",
    "vq_assign_pallas",
    "vq_assign_sharded",
    "pallas_supported",
    "set_vq_mesh",
]

_LANE = 128

# Data-parallel mesh registered by the train loop (set_vq_mesh): lets the
# Pallas kernel stay enabled under multi-device meshes by running per-shard
# inside shard_map instead of falling back to XLA.
_MESH = None


def _xla_assign(dictionary: jnp.ndarray, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference XLA path: argmin of squared distances + used-mask."""
    d = dictionary.astype(jnp.float32)
    x = x.astype(jnp.float32)
    dict_norms = jnp.sum(jnp.square(d), axis=-1)
    dots = jnp.einsum(
        "bc,dc->bd", x, d,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    idxs = jnp.argmin(dict_norms[None, :] - 2.0 * dots, axis=-1)
    used = jnp.zeros((d.shape[0],), jnp.int32).at[idxs].set(1)
    return idxs.astype(jnp.int32), used


def set_vq_mesh(mesh) -> None:
    """Register the data-parallel mesh (or None) for sharded VQ assignment.

    Called by the train loops after building their mesh; under a registered
    multi-device mesh the Pallas kernel runs per-shard inside shard_map with
    a pmax-combined used mask instead of being disabled.
    """
    global _MESH
    _MESH = mesh


def pallas_supported(num_codes: int, num_channels: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if num_codes % _LANE or num_channels % _LANE:
        return False
    # VMEM footprint gate: the kernel keeps the transposed codebook [C, D],
    # a [TB=512, D] f32 distance tile, the [TB, C] input tile, and the
    # one-hot [TB, D] live at once. Past ~12 MB Mosaic compilation fails
    # outright (16 MB/core scoped budget), so fall back to XLA there
    # rather than crash (e.g. D=16384, C=128 needs ~42 MB).
    tb = 512
    approx_bytes = 4 * (
        num_channels * num_codes          # dict_t
        + 2 * tb * num_codes              # distances + one-hot
        + tb * num_channels               # input tile
    )
    return approx_bytes <= 12 * 1024 * 1024


def _assign_kernel(x_ref, dict_t_ref, dictn_ref, idx_ref, used_ref):
    """One grid step: a [TB, C] tile of inputs against the full codebook.

    x_ref:      [TB, C]   input tile (VMEM)
    dict_t_ref: [C, D]    transposed codebook (VMEM, revisited every step)
    dictn_ref:  [1, D]    codebook squared norms
    idx_ref:    [TB]      out: nearest code per row
    used_ref:   [1, D]    out: accumulated used mask (same block every step)
    """
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    # HIGHEST precision (f32 via bf16 multi-passing): assignment must agree
    # with the f32 reference path — bf16 rounding flips near-tie argmins.
    dots = jnp.dot(
        x_ref[:], dict_t_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TB, D] on the MXU
    dists = dictn_ref[0, :][None, :] - 2.0 * dots
    idx = jnp.argmin(dists, axis=-1).astype(jnp.int32)
    idx_ref[:] = idx[:, None]

    d = dists.shape[-1]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], d), 1)
        == idx[:, None]
    )
    tile_used = jnp.max(onehot.astype(jnp.int32), axis=0)[None, :]

    @pl.when(i == 0)
    def _():
        used_ref[:] = jnp.zeros_like(used_ref)

    used_ref[:] = jnp.maximum(used_ref[:], tile_used)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def vq_assign_pallas(
    dictionary: jnp.ndarray, x: jnp.ndarray, tile: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas path: x [B, C] against dictionary [D, C] -> (idxs [B], used [D])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c = x.shape
    d = dictionary.shape[0]
    x = x.astype(jnp.float32)
    dict_f = dictionary.astype(jnp.float32)
    dict_t = dict_f.T  # [C, D]
    dict_norms = jnp.sum(jnp.square(dict_f), axis=-1)[None, :]  # [1, D]

    padded_b = -(-b // tile) * tile
    if padded_b != b:
        x = jnp.pad(x, ((0, padded_b - b), (0, 0)))
    grid = padded_b // tile

    idxs, used = pl.pallas_call(
        _assign_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_b, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, d), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_b * c * d,
            bytes_accessed=padded_b * c * 4 + c * d * 4 + padded_b * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, dict_t, dict_norms)
    idxs = idxs[:, 0]

    if padded_b != b:
        # Padded (zero) rows still pick some code, so rebuild the used mask
        # from the real rows only.
        real_used = jnp.zeros((d,), jnp.int32).at[idxs[:b]].set(1)
        return idxs[:b], real_used
    return idxs, used[0]


def vq_assign_sharded(
    mesh, dictionary: jnp.ndarray, x: jnp.ndarray, interpret: bool = False,
    tile: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas assignment under a 1-D mesh: rows shard over the mesh axis,
    each device runs the kernel on its local block, and the used masks
    combine with a pmax (one small [D] all-reduce on the ICI ring)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    (axis,) = mesh.axis_names

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(axis), P()),
        # pallas_call does not annotate varying-mesh-axes metadata; the
        # specs above are the full contract.
        check_vma=False,
    )
    def run(dictionary, x_local):
        idxs, used = vq_assign_pallas(
            dictionary, x_local, tile=tile, interpret=interpret
        )
        return idxs, jax.lax.pmax(used, axis)

    return run(dictionary, x)


def vq_assign(dictionary: jnp.ndarray, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-code assignment + used mask; Pallas on TPU, XLA elsewhere.

    Multi-device: stays on the Pallas path when the train loop registered
    its mesh (set_vq_mesh) and the rows split evenly; the per-device block
    must still clear the >=512-row bar for the kernel to win.
    """
    d, c = dictionary.shape
    b = x.shape[0]
    # Measured rent gate (scripts/bench_vq.py on v5e, 2026-08-18): the
    # kernel wins at small/mid codebooks (D=512: 1.27x at B=1600, 1.04x at
    # B=6400; D=1024: 1.10x) but LOSES slightly at D=4096 (0.87-0.98x) —
    # the [TB, D] distance tile re-reads the full codebook from VMEM every
    # grid step, which stops paying once the codebook dwarfs the inputs.
    # Route large codebooks to XLA's fused path.
    if d <= 1024 and pallas_supported(d, c):
        n_dev = jax.device_count()
        if n_dev == 1 and b >= 512:
            return vq_assign_pallas(dictionary, x)
        if (
            _MESH is not None
            and _MESH.devices.size == n_dev
            and b % n_dev == 0
            and b // n_dev >= 512
        ):
            return vq_assign_sharded(_MESH, dictionary, x)
    return _xla_assign(dictionary, x)
