"""Fused same-resolution ResBlock as two Pallas TPU kernels.

Capability parity: models/layers.py::ResBlock (reference
/root/reference/vq_voice_swap/models/unet.py:248-316) for the
scale_factor=1.0 case — the block shape that dominates the unet64 forward at
T=64000/32000 (PERF.md: the model is HBM-bandwidth bound at ~2x roofline).

Why a megakernel: XLA executes the block as ~6 full-resolution reads and ~4
writes of [N, T, C] activations (norm stats, normalize+gelu, conv_in,
norm stats, film+gelu, conv_out, residual). This pair streams x from HBM
twice (plus two MXU-dot stats reads) and writes the output once:

  outside (XLA, MXU dots):  GroupNorm-1 statistics; FiLM a/b from emb;
                            16-row halo strips per tile boundary
  stats kernel (per tile):  gelu(norm1(x)) -> conv_in -> GroupNorm-2
                            statistic accumulation into [N, 1, C] outputs
  apply kernel (per tile):  recompute conv_in with halo (FLOPs are free —
                            the model is bandwidth-bound), folded norm2+FiLM
                            affine, GELU, dilated conv_out, skip(+1x1), add

Both kernels use standard BlockSpec pipelines (auto double-buffered by
Pallas); conv halos come from a tiny precomputed [N, NJ, 16, C] strips
tensor instead of overlapping DMA windows, which Mosaic cannot express for
lane-padded (C=64) HBM layouts. Convs run as k shifted
[tile, Cin] @ [Cin, Cout] MXU dots. SAME zero-padding is reproduced by
masking gelu(norm1(x)) to zero outside [0, T) — matching the reference,
which pads the *normalized* activations. The per-group stat reduction runs
as a dot with the group-membership matrix (no lane<->sublane reshapes).

Multiple x inputs execute the block on their channel CONCAT without the
concat being materialised in HBM (up-path skip connections).

Inference-path only (sampling); training uses the flax ResBlock.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .fused_norm import _erf, mxu_channel_stats

__all__ = ["fused_resblock", "fused_resblock_supported", "pick_seq_tile"]

HALO = 8  # supports conv_out dilation <= 7; full-res blocks use 2


def pick_seq_tile(t: int, max_tile: int = 2048,
                  channels: int = 64) -> Optional[int]:
    """Largest multiple-of-16 divisor of ``t`` that is <= max_tile, with at
    least two tiles. ``channels`` scales the cap down so the kernel's f32
    temporaries ([tile, C] activations, several live at once) stay inside
    the 16 MB scoped-VMEM budget at wide channel counts. The default cap is
    conservative: Mosaic's worst-case stack accounting charged ~19 MB for a
    tile=4000/C=64 apply kernel with skip+FiLM (measured on v5e), so 2048
    keeps every supported block shape within the 16 MB scoped budget."""
    max_tile = max(16, max_tile * 64 // max(channels, 64))
    best = None
    for tile in range(16, min(t // 2, max_tile) + 1, 16):
        if t % tile == 0:
            best = tile
    return best


def fused_resblock_supported(x: jnp.ndarray, dilation: int) -> Optional[int]:
    if jax.default_backend() != "tpu":
        return None
    if x.ndim != 3 or dilation > HALO - 1:
        return None
    n, t, c = x.shape
    if t < 2048 or c % 64:  # lane-aligned channels only
        return None
    return pick_seq_tile(t, channels=c)


def _group_affine(sums, sqs, scale, bias, groups, count, eps):
    """Per-channel f32 sums/sumsq [C] -> folded normalize affine a, b [C]
    (plain-XLA version, used outside kernels)."""
    c = sums.shape[-1]
    g_sum = jnp.sum(jnp.reshape(sums, (groups, c // groups)), axis=-1)
    g_sq = jnp.sum(jnp.reshape(sqs, (groups, c // groups)), axis=-1)
    mean = g_sum / count
    var = g_sq / count - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, c // groups)
    mean_c = jnp.repeat(mean, c // groups)
    a = inv_c * scale
    return a, bias - mean_c * a


def _channel_stats(x):
    """Per-channel f32 sum / sum-of-squares via MXU dots (see
    fused_norm.matmul_group_norm for why these beat XLA's reduce here)."""
    return mxu_channel_stats(x)


def _halo_strips(x, tile):
    """[N, NJ, 2*HALO, C]: rows [j*tile-HALO, j*tile) and
    [(j+1)*tile, (j+1)*tile+HALO) per tile j, gathered with clamped indices
    (out-of-range rows carry garbage; kernels mask them by position)."""
    n, t, c = x.shape
    nj = t // tile
    j = jnp.arange(nj)[:, None]
    o = jnp.arange(HALO)[None, :]
    left = j * tile - HALO + o           # [NJ, HALO]
    right = (j + 1) * tile + o
    idx = jnp.clip(
        jnp.concatenate([left, right], axis=1).reshape(-1), 0, t - 1
    )
    return jnp.take(x, idx, axis=1).reshape(n, nj, 2 * HALO, c)


def _gelu(y):
    # Exact-GELU via the A&S erf approximation (|err| < 1.5e-7): the Pallas
    # TPU backend has no erf/erfc primitive (see fused_norm._erf).
    return 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))


def _build_ext(x_refs, st_refs, halo, a1_ref, b1_ref, tile, t0, t_total,
               dtype):
    """[tile + 2*halo, cin] gelu(norm1(x)) around tile start t0, masked to
    zero outside [0, T). Halo rows come from the strips input."""
    parts = []
    for xr, sr in zip(x_refs, st_refs):
        xt = xr[0]                                   # [tile, c]
        left = sr[0, 0, HALO - halo:HALO, :]         # [halo, c]
        right = sr[0, 0, HALO:HALO + halo, :]
        parts.append(jnp.concatenate([left, xt, right], axis=0))
    ext = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    y = ext.astype(jnp.float32) * a1_ref[0, 0][None, :] \
        + b1_ref[0, 0][None, :]
    g = _gelu(y)
    L = tile + 2 * halo
    pos = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) + (t0 - halo)
    valid = jnp.logical_and(pos >= 0, pos < t_total)
    return jnp.where(valid, g, 0.0).astype(dtype)


def _conv3(g, k_ref, bias, lo, length, dilation, off):
    """k=3 conv as shifted MXU dots. ``g`` covers positions
    [t0-off, t0+tile+off); returns rows for [t0+lo, t0+lo+length)."""
    acc = bias[None, :]
    for tap in range(3):
        s = off + lo + (tap - 1) * dilation
        acc = acc + jnp.dot(g[s:s + length], k_ref[tap],
                            preferred_element_type=jnp.float32)
    return acc


def _stats_kernel(nx, tile, t_total, cin, cout, dtype, *refs):
    from jax.experimental import pallas as pl

    x_refs = refs[:nx]
    st_refs = refs[nx:2 * nx]
    a1_ref, b1_ref, k1_ref, k1b_ref = refs[2 * nx:2 * nx + 4]
    sum_ref, sq_ref = refs[2 * nx + 4:]

    j = pl.program_id(1)
    t0 = j * tile
    g = _build_ext(x_refs, st_refs, 1, a1_ref, b1_ref, tile, t0, t_total,
                   dtype)
    h1 = _conv3(g, k1_ref, k1b_ref[0, 0].astype(jnp.float32), 0, tile, 1, 1)
    h1 = h1.astype(dtype).astype(jnp.float32)  # mirror the conv output cast

    @pl.when(j == 0)
    def _():
        sum_ref[0, 0] = jnp.zeros((cout,), jnp.float32)
        sq_ref[0, 0] = jnp.zeros((cout,), jnp.float32)

    sum_ref[0, 0] = sum_ref[0, 0] + jnp.sum(h1, axis=0)
    sq_ref[0, 0] = sq_ref[0, 0] + jnp.sum(jnp.square(h1), axis=0)


def _apply_kernel(nx, tile, t_total, cin, cout, g2, dilation, eps, has_skip,
                  has_film, dtype, *refs):
    from jax.experimental import pallas as pl

    x_refs = refs[:nx]
    st_refs = refs[nx:2 * nx]
    (a1_ref, b1_ref, k1_ref, k1b_ref, s2_ref, b2n_ref, af_ref, bf_ref,
     k2_ref, k2b_ref, ks_ref, ksb_ref, sum_ref, sq_ref, out_ref) = \
        refs[2 * nx:]

    j = pl.program_id(1)
    t0 = j * tile
    d = dilation
    halo = d + 1
    g = _build_ext(x_refs, st_refs, halo, a1_ref, b1_ref, tile, t0, t_total,
                   dtype)
    h1 = _conv3(g, k1_ref, k1b_ref[0, 0].astype(jnp.float32),
                -d, tile + 2 * d, 1, halo)
    h1 = h1.astype(dtype).astype(jnp.float32)

    # Per-group reduction of the [cout] channel stats WITHOUT lane<->sublane
    # reshapes (Mosaic can't shape-cast those): one dot with the group-
    # membership matrix yields the group sums already broadcast per channel.
    gs = cout // g2
    gm = (jax.lax.broadcasted_iota(jnp.int32, (cout, cout), 0) // gs
          == jax.lax.broadcasted_iota(jnp.int32, (cout, cout), 1) // gs
          ).astype(jnp.float32)
    g_sum = jnp.dot(sum_ref[0, 0][None, :], gm,
                    preferred_element_type=jnp.float32)[0]
    g_sq = jnp.dot(sq_ref[0, 0][None, :], gm,
                   preferred_element_type=jnp.float32)[0]
    count = t_total * gs
    mean = g_sum / count
    var = g_sq / count - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    a2 = inv * s2_ref[0, 0]
    b2 = b2n_ref[0, 0] - mean * a2
    if has_film:
        fa = af_ref[0, 0] + 1.0
        a2, b2 = a2 * fa, b2 * fa + bf_ref[0, 0]

    z = _gelu(h1 * a2[None, :] + b2[None, :])
    zpos = jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * d, 1), 0) \
        + (t0 - d)
    z = jnp.where(jnp.logical_and(zpos >= 0, zpos < t_total), z, 0.0)
    z = z.astype(dtype)

    out = k2b_ref[0, 0].astype(jnp.float32)[None, :]
    for tap in range(3):
        out = out + jnp.dot(z[tap * d:tap * d + tile], k2_ref[tap],
                            preferred_element_type=jnp.float32)

    xc = [xr[0] for xr in x_refs]
    x_tile = xc[0] if nx == 1 else jnp.concatenate(xc, axis=-1)
    if has_skip:
        skip = ksb_ref[0, 0].astype(jnp.float32)[None, :] + jnp.dot(
            x_tile, ks_ref[:], preferred_element_type=jnp.float32)
    else:
        skip = x_tile.astype(jnp.float32)
    out_ref[0] = (skip + out).astype(out_ref.dtype)


# NOT jitted: an inner jax.jit nested inside a caller's lax.scan trips a
# lowering bug (KeyError: closed_call); callers always run under jit anyway.
def _fused_call(xs, scale1, bias1, k1, k1b, scale2, bias2, af, bf, k2, k2b,
                ks, ksb, groups_in, groups_out, dilation, eps, tile,
                interpret):
    from jax.experimental import pallas as pl

    halves = tuple(xx.shape[-1] for xx in xs)
    nx = len(halves)
    n, t = xs[0].shape[:2]
    nj = t // tile
    cin = sum(halves)
    cout = k1.shape[-1]
    wdt = xs[0].dtype

    # GroupNorm-1 statistics outside the kernels, per input half; the folded
    # per-channel affine rides in as a tiny [N, 1, C] pair.
    stats = [_channel_stats(xx) for xx in xs]
    sums1 = jnp.concatenate([s for s, _ in stats], axis=-1)
    sqs1 = jnp.concatenate([q for _, q in stats], axis=-1)
    a1, b1 = jax.vmap(
        _group_affine, in_axes=(0, 0, None, None, None, None, None)
    )(sums1, sqs1, scale1, bias1, groups_in, t * (cin // groups_in), eps)
    a1 = a1[:, None, :]
    b1 = b1[:, None, :]

    strips = [_halo_strips(xx, tile) for xx in xs]
    has_film = af is not None
    has_skip = ks is not None
    zeros_c = jnp.zeros((n, 1, cout), jnp.float32)

    def whole(shape):
        return pl.BlockSpec(shape, lambda n_, j: tuple(0 for _ in shape))

    def per_n(shape):
        return pl.BlockSpec(shape,
                            lambda n_, j: (n_,) + (0,) * (len(shape) - 1))

    x_specs = [pl.BlockSpec((1, tile, h_), lambda n_, j: (n_, j, 0))
               for h_ in halves]
    strip_specs = [
        pl.BlockSpec((1, 1, 2 * HALO, h_), lambda n_, j: (n_, j, 0, 0))
        for h_ in halves
    ]
    common = [
        per_n((1, 1, cin)),                             # a1
        per_n((1, 1, cin)),                             # b1
        whole((3, cin, cout)),                          # k1
        whole((1, 1, cout)),                            # k1 bias
    ]

    s2sum, s2sq = pl.pallas_call(
        functools.partial(_stats_kernel, nx, tile, t, cin, cout, wdt),
        grid=(n, nj),
        in_specs=x_specs + strip_specs + common,
        out_specs=[per_n((1, 1, cout)), per_n((1, 1, cout))],
        out_shape=[jax.ShapeDtypeStruct((n, 1, cout), jnp.float32)] * 2,
        interpret=interpret,
    )(
        *xs, *strips, a1, b1, k1.astype(wdt),
        k1b[None, None, :].astype(jnp.float32),
    )

    out = pl.pallas_call(
        functools.partial(_apply_kernel, nx, tile, t, cin, cout, groups_out,
                          dilation, eps, has_skip, has_film, wdt),
        grid=(n, nj),
        in_specs=x_specs + strip_specs + common + [
            whole((1, 1, cout)),                        # gn2 scale
            whole((1, 1, cout)),                        # gn2 bias
            per_n((1, 1, cout)),                        # film a
            per_n((1, 1, cout)),                        # film b
            whole((3, cout, cout)),                     # k2
            whole((1, 1, cout)),                        # k2 bias
            whole((1 if ks is None else cin, cout)),    # skip proj
            whole((1, 1, cout)),                        # skip proj bias
            per_n((1, 1, cout)),                        # stats2 sum
            per_n((1, 1, cout)),                        # stats2 sumsq
        ],
        out_specs=pl.BlockSpec((1, tile, cout), lambda n_, j: (n_, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t, cout), wdt),
        interpret=interpret,
    )(
        *xs, *strips, a1, b1, k1.astype(wdt),
        k1b[None, None, :].astype(jnp.float32),
        scale2[None, None, :].astype(jnp.float32),
        bias2[None, None, :].astype(jnp.float32),
        (af[:, None, :] if has_film else zeros_c).astype(jnp.float32),
        (bf[:, None, :] if has_film else zeros_c).astype(jnp.float32),
        k2.astype(wdt), k2b[None, None, :].astype(jnp.float32),
        (ks[0] if has_skip else jnp.zeros((1, cout))).astype(wdt),
        (ksb if has_skip else jnp.zeros((cout,)))[None, None, :].astype(
            jnp.float32),
        s2sum, s2sq,
    )
    return out


def fused_resblock(
    x: jnp.ndarray,
    params,
    emb: Optional[jnp.ndarray],
    *,
    groups_in: int,
    groups_out: int,
    dilation: int = 2,
    eps: float = 1e-5,
    tile: Optional[int] = None,
    interpret: bool = False,
    x2: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Same-resolution ResBlock forward from its flax param subtree.

    ``params`` is the ResBlock param tree (norm_in/conv_in/norm_mid/
    [cond_proj]/conv_out/[skip_proj]); ``emb`` is the [N, E] conditioning
    embedding (None for encoder blocks without FiLM). When ``x2`` is given,
    the block runs on concat([x, x2], -1) WITHOUT materialising the concat
    (each half streams through its own BlockSpec pipeline) — the up-path
    skip-connection case. GroupNorm groups must not straddle the boundary:
    x.shape[-1] must be a multiple of the group size.
    """
    xs = (x,) if x2 is None else (x, x2)
    cin_total = sum(xx.shape[-1] for xx in xs)
    if tile is None:
        cmax = max(cin_total, params["conv_in"]["conv"]["kernel"].shape[-1])
        tile = pick_seq_tile(x.shape[1], channels=cmax)
        assert tile is not None, f"no valid tile for T={x.shape[1]}"
    assert cin_total % groups_in == 0
    if x2 is not None:
        gsize = cin_total // groups_in
        assert x.shape[-1] % gsize == 0, (
            f"concat boundary {x.shape[-1]} straddles a GroupNorm group "
            f"of size {gsize}"
        )

    if emb is not None:
        cond = jax.nn.gelu(emb.astype(jnp.float32), approximate=False)
        cp = params["cond_proj"]
        ab = cond @ cp["kernel"].astype(jnp.float32) \
            + cp["bias"].astype(jnp.float32)
        af, bf = jnp.split(ab, 2, axis=-1)
    else:
        af = bf = None

    sp = params.get("skip_proj")
    return _fused_call(
        xs,
        params["norm_in"]["norm"]["scale"].astype(jnp.float32),
        params["norm_in"]["norm"]["bias"].astype(jnp.float32),
        params["conv_in"]["conv"]["kernel"],
        params["conv_in"]["conv"]["bias"],
        params["norm_mid"]["norm"]["scale"],
        params["norm_mid"]["norm"]["bias"],
        af, bf,
        params["conv_out"]["conv"]["kernel"],
        params["conv_out"]["conv"]["bias"],
        sp["conv"]["kernel"] if sp is not None else None,
        sp["conv"]["bias"] if sp is not None else None,
        groups_in, groups_out, dilation, eps, tile, interpret,
    )
