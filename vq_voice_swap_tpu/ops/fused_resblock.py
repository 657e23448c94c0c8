"""Fused same-resolution ResBlock as a single Pallas TPU kernel.

Capability parity: models/layers.py::ResBlock (reference
/root/reference/vq_voice_swap/models/unet.py:248-316) for the
scale_factor=1.0 case — the block shape that dominates the unet64 forward at
T=64000/32000 (PERF.md: the model is HBM-bandwidth bound at ~2x roofline).

Why a megakernel: XLA executes the block as ~6 full-resolution reads and ~4
writes of [N, T, C] activations (norm stats, normalize+gelu, conv_in,
norm stats, film+gelu, conv_out, residual). This kernel streams x from HBM
three times and writes the output once:

  outside (XLA, MXU dots):  GroupNorm-1 statistics; FiLM a/b from emb
  pass A (per T-tile):      gelu(norm1(x)) -> conv_in -> GroupNorm-2
                            statistic accumulation in VMEM scratch
  pass B (per T-tile+halo): recompute conv_in (FLOPs are free — the model
                            is bandwidth-bound), folded norm2+FiLM affine,
                            GELU, dilated conv_out, skip(+1x1 proj), add

x and out live in ANY/HBM memory space; tiles (plus conv halo) move by
explicit `make_async_copy` so overlapping halo windows cost one read, not
three. Convs run as k shifted [tile, Cin] @ [Cin, Cout] MXU dots. SAME
zero-padding is reproduced by masking gelu(norm1(x)) to zero outside [0, T)
— matching the reference, which pads the *normalized* activations.

Inference-path only (sampling); training uses the flax ResBlock.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .fused_norm import matmul_group_norm

__all__ = ["fused_resblock", "fused_resblock_supported", "pick_seq_tile"]

HALO = 8  # supports conv_out dilation <= 7; full-res blocks use 2


def pick_seq_tile(t: int, max_tile: int = 4096) -> Optional[int]:
    """Largest multiple-of-16 divisor of ``t`` that is <= max_tile, with at
    least two tiles (the edge-DMA branches assume first != last)."""
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
    if t < 2048 or c % 128 not in (0, 64):  # lane-aligned channels only
        return None
    return pick_seq_tile(t)


def _group_affine(sums, sqs, scale, bias, groups, count, eps):
    """Per-channel f32 sums/sumsq [C] -> folded normalize affine a, b [C]."""
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


def _kernel(
    # refs: x halves (ANY), per-n norm1 affine, weights, film, out (ANY),
    # then scratch. ``halves`` gives the channel width of each x input —
    # multiple inputs execute the block on their channel CONCAT without the
    # concat ever being materialised in HBM (up-path skip connections).
    *refs, tile, t_total, cin, cout, g2, dilation, eps, has_skip, has_film,
    out_dtype, pipelined, halves,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx = len(halves)
    x_refs = refs[:nx]
    (a1_ref, b1_ref, k1_ref, k1b_ref, s2_ref, b2n_ref, af_ref, bf_ref,
     k2_ref, k2b_ref, ks_ref, ksb_ref, out_ref) = refs[nx:nx + 13]
    xbuf, obuf, s2sum, s2sq, sem_in, sem_out = refs[nx + 13:]
    offs = [0]
    for h_ in halves:
        offs.append(offs[-1] + h_)

    p = pl.program_id(0)
    n = pl.program_id(1)
    j = pl.program_id(2)
    nn = pl.num_programs(1)
    nj = pl.num_programs(2)
    t0 = j * tile
    L = tile + 2 * HALO

    def fetch_dma(slot_, n_, j_, case, hi):
        """The x_refs[hi][n_, j_*tile-HALO : +L] copy into this half's lane
        range, edge-clamped. ``case`` selects the statically-shaped variant:
        0=first tile, 1=last, 2=interior. (wait() must use the same
        descriptor shape the start used.)"""
        t0_ = j_ * tile
        xr = x_refs[hi]
        cs = pl.ds(offs[hi], halves[hi])
        sem = sem_in.at[slot_, hi]
        if case == 0:
            return pltpu.make_async_copy(
                xr.at[n_, pl.ds(0, tile + HALO), :],
                xbuf.at[slot_, pl.ds(HALO, tile + HALO), cs],
                sem,
            )
        if case == 1:
            return pltpu.make_async_copy(
                xr.at[n_, pl.ds(t0_ - HALO, tile + HALO), :],
                xbuf.at[slot_, pl.ds(0, tile + HALO), cs],
                sem,
            )
        return pltpu.make_async_copy(
            xr.at[n_, pl.ds(t0_ - HALO, L), :],
            xbuf.at[slot_, pl.ds(0, L), cs],
            sem,
        )

    def for_cases(j_, fn):
        @pl.when(j_ == 0)
        def _():
            fn(0)

        @pl.when(j_ == nj - 1)
        def _():
            fn(1)

        @pl.when(jnp.logical_and(j_ != 0, j_ != nj - 1))
        def _():
            fn(2)

    def fetch_all(slot_, n_, j_, op):
        for hi in range(nx):
            for_cases(
                j_, lambda c, hi=hi: getattr(
                    fetch_dma(slot_, n_, j_, c, hi), op
                )()
            )

    gidx = (p * nn + n) * nj + j  # global sequential iteration index
    if pipelined:
        slot = jax.lax.rem(gidx, 2)

        @pl.when(gidx == 0)
        def _():
            fetch_all(slot, n, j, "start")

        # Prefetch the next iteration's tile into the other slot while this
        # tile computes. Passes iterate the same (n, j) sequence, so the
        # cross-pass wrap lands on (0, 0); the very last iteration starts
        # no prefetch (it would never be waited).
        j1 = jax.lax.rem(j + 1, nj)
        n1 = jax.lax.rem(n + (j + 1) // nj, nn)

        @pl.when(gidx != 2 * nn * nj - 1)
        def _():
            fetch_all(1 - slot, n1, j1, "start")

        fetch_all(slot, n, j, "wait")
    else:
        slot = 0
        fetch_all(0, n, j, "start")
        fetch_all(0, n, j, "wait")

    # ---- gelu(norm1(x)), masked to zero outside [0, T) ------------------
    # (the reference zero-pads the *normalized* activations before conv_in)
    pos = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) + (t0 - HALO)
    valid = jnp.logical_and(pos >= 0, pos < t_total)
    xb = xbuf[slot].astype(jnp.float32)
    g = jax.nn.gelu(xb * a1_ref[0][None, :] + b1_ref[0][None, :],
                    approximate=False)
    g = jnp.where(valid, g, 0.0).astype(xbuf.dtype)

    def conv_in(lo, length):
        """h1 rows for positions [t0+lo, t0+lo+length); buffer row of
        position t is t - t0 + HALO. lo/length are Python ints."""
        acc = k1b_ref[0].astype(jnp.float32)[None, :]
        for tap in range(3):
            s = HALO + lo - 1 + tap
            acc = acc + jnp.dot(g[s:s + length], k1_ref[tap],
                                preferred_element_type=jnp.float32)
        return acc.astype(xbuf.dtype)  # mirror the conv's output cast

    @pl.when(p == 0)
    def _():  # ---- pass A: GroupNorm-2 statistics over h1 ---------------
        @pl.when(j == 0)
        def _():
            s2sum[n, :] = jnp.zeros((cout,), jnp.float32)
            s2sq[n, :] = jnp.zeros((cout,), jnp.float32)

        h1 = conv_in(0, tile).astype(jnp.float32)
        s2sum[n, :] = s2sum[n, :] + jnp.sum(h1, axis=0)
        s2sq[n, :] = s2sq[n, :] + jnp.sum(jnp.square(h1), axis=0)

    @pl.when(p == 1)
    def _():  # ---- pass B: norm2+film+gelu -> conv_out -> +skip ---------
        a2, b2 = _group_affine(
            s2sum[n, :], s2sq[n, :], s2_ref[0], b2n_ref[0], g2,
            t_total * (cout // g2), eps,
        )
        if has_film:
            fa = af_ref[0] + 1.0
            a2, b2 = a2 * fa, b2 * fa + bf_ref[0]

        d = dilation
        h1 = conv_in(-d, tile + 2 * d).astype(jnp.float32)
        z = jax.nn.gelu(h1 * a2[None, :] + b2[None, :], approximate=False)
        zpos = jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * d, 1), 0) \
            + (t0 - d)
        z = jnp.where(jnp.logical_and(zpos >= 0, zpos < t_total), z, 0.0)
        z = z.astype(xbuf.dtype)

        out = k2b_ref[0].astype(jnp.float32)[None, :]
        for tap in range(3):
            out = out + jnp.dot(z[tap * d:tap * d + tile], k2_ref[tap],
                                preferred_element_type=jnp.float32)

        x_tile = xbuf[slot, HALO:HALO + tile, :]
        if has_skip:
            skip = ksb_ref[0].astype(jnp.float32)[None, :] + jnp.dot(
                x_tile, ks_ref[:], preferred_element_type=jnp.float32)
        else:
            skip = x_tile.astype(jnp.float32)

        def out_dma(slot_):
            # All output copies have identical byte counts, so waiting with
            # the current coordinates drains whichever copy is pending on
            # that slot/semaphore.
            return pltpu.make_async_copy(
                obuf.at[slot_], out_ref.at[n, pl.ds(t0, tile), :],
                sem_out.at[slot_],
            )

        if pipelined:
            ipass = n * nj + j

            @pl.when(ipass >= 2)
            def _():  # drain the copy issued 2 iterations ago on this slot
                out_dma(slot).wait()

            obuf[slot] = (skip + out).astype(out_dtype)
            out_dma(slot).start()

            @pl.when(ipass == nn * nj - 1)
            def _():  # final drain of both slots
                out_dma(slot).wait()
                out_dma(1 - slot).wait()
        else:
            obuf[slot] = (skip + out).astype(out_dtype)
            cp = out_dma(slot)
            cp.start()
            cp.wait()


def _channel_stats(x):
    """Per-channel f32 sum / sum-of-squares of [N, T, C] via MXU dots (see
    fused_norm.matmul_group_norm for why these beat XLA's reduce here)."""
    n, t, c = x.shape
    ones = jnp.ones((8, t), x.dtype)
    sums = jax.lax.dot_general(
        ones, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    gram = jax.lax.dot_general(
        x, x, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return sums, jnp.diagonal(gram, axis1=1, axis2=2)


@functools.partial(
    jax.jit,
    static_argnames=("groups_in", "groups_out", "dilation", "eps", "tile",
                     "interpret", "pipelined"),
)
def _fused_call(xs, scale1, bias1, k1, k1b, scale2, bias2, af, bf, k2, k2b,
                ks, ksb, groups_in, groups_out, dilation, eps, tile,
                interpret, pipelined):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    halves = tuple(xx.shape[-1] for xx in xs)
    n, t = xs[0].shape[:2]
    cin = sum(halves)
    cout = k1.shape[-1]

    # GroupNorm-1 statistics outside the kernel, per input half; the folded
    # per-channel affine rides into the kernel as a tiny [N, C] pair.
    stats = [_channel_stats(xx) for xx in xs]
    sums1 = jnp.concatenate([s for s, _ in stats], axis=-1)
    sqs1 = jnp.concatenate([q for _, q in stats], axis=-1)
    a1, b1 = jax.vmap(
        _group_affine, in_axes=(0, 0, None, None, None, None, None)
    )(sums1, sqs1, scale1, bias1, groups_in, t * (cin // groups_in), eps)

    has_film = af is not None
    has_skip = ks is not None
    wdt = xs[0].dtype
    zeros_c = jnp.zeros((n, cout), jnp.float32)

    kernel = functools.partial(
        _kernel, tile=tile, t_total=t, cin=cin, cout=cout, g2=groups_out,
        dilation=dilation, eps=eps, has_skip=has_skip, has_film=has_film,
        out_dtype=wdt, pipelined=pipelined, halves=halves,
    )

    def whole(shape):
        return pl.BlockSpec(shape, lambda p, n_, j: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(2, n, t // tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(xs) + [  # x halves
            pl.BlockSpec((1, cin), lambda p, n_, j: (n_, 0)),   # a1
            pl.BlockSpec((1, cin), lambda p, n_, j: (n_, 0)),   # b1
            whole((3, cin, cout)),                          # k1
            whole((1, cout)),                               # k1 bias
            whole((1, cout)),                               # gn2 scale
            whole((1, cout)),                               # gn2 bias
            pl.BlockSpec((1, cout), lambda p, n_, j: (n_, 0)),  # film a
            pl.BlockSpec((1, cout), lambda p, n_, j: (n_, 0)),  # film b
            whole((3, cout, cout)),                         # k2
            whole((1, cout)),                               # k2 bias
            whole((1 if ks is None else cin, cout)),        # skip proj
            whole((1, cout)),                               # skip proj bias
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, t, cout), wdt),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 2 * HALO, cin), wdt),     # xbuf (2 slots)
            pltpu.VMEM((2, tile, cout), wdt),               # obuf (2 slots)
            pltpu.VMEM((n, cout), jnp.float32),             # stats2 sum
            pltpu.VMEM((n, cout), jnp.float32),             # stats2 sumsq
            pltpu.SemaphoreType.DMA((2, len(xs))),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        *xs, a1, b1,
        k1.astype(wdt), k1b[None, :].astype(jnp.float32),
        scale2[None, :].astype(jnp.float32),
        bias2[None, :].astype(jnp.float32),
        (af if has_film else zeros_c).astype(jnp.float32),
        (bf if has_film else zeros_c).astype(jnp.float32),
        k2.astype(wdt), k2b[None, :].astype(jnp.float32),
        (ks[0] if has_skip else jnp.zeros((1, cout))).astype(wdt),
        (ksb if has_skip else jnp.zeros((cout,)))[None, :].astype(
            jnp.float32),
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
    pipelined: bool = True,
    x2: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Same-resolution ResBlock forward from its flax param subtree.

    ``params`` is the ResBlock param tree (norm_in/conv_in/norm_mid/
    [cond_proj]/conv_out/[skip_proj]); ``emb`` is the [N, E] conditioning
    embedding (None for encoder blocks without FiLM). When ``x2`` is given,
    the block runs on concat([x, x2], -1) WITHOUT materialising the concat
    (the kernel DMAs each half into adjacent lane ranges) — the up-path
    skip-connection case. GroupNorm groups must not straddle the boundary:
    x.shape[-1] must be a multiple of the group size.
    """
    if tile is None:
        tile = pick_seq_tile(x.shape[1])
        assert tile is not None, f"no valid tile for T={x.shape[1]}"
    xs = (x,) if x2 is None else (x, x2)
    cin_total = sum(xx.shape[-1] for xx in xs)
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
        groups_in, groups_out, dilation, eps, tile, interpret, pipelined,
    )
