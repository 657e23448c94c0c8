"""Channel-packed (space-to-depth) execution of the UNet predictor.

Motivation (PERF.md): the unet64 forward is HBM-bound, and its costliest
levels run at T=64000/32000 with only 64 channels — half-empty 128-wide TPU
vector lanes for every GroupNorm/GELU/residual pass, and N=64 matmuls on the
128x128 MXU. This module runs those levels in a [T/2, 2C] layout instead:

  packed[n, p, c*2 + q] = x[n, 2*p + q, c]          (channel-major phases)

which is EXACTLY equivalent — not an approximation — because every op the
UNet uses at those levels commutes with the packing:

  - stride-1 SAME conv (odd k, any dilation): repack the kernel so output
    phase q at packed position p reads input phase i at packed offset
    dp = (q + dk - i)/2 for each original tap offset dk (integral parities
    only; other taps are zero). A dilated k=3,d=2 conv packs into a DENSE
    k=3 conv. Zero padding maps 1:1 to packed zero padding.
  - GroupNorm: with channel-major packing and the ORIGINAL group count, each
    (n, group) statistic covers exactly the original element set.
  - GELU / residual add / FiLM (a,b per channel -> repeat over phases):
    elementwise.
  - avg-pool x2: mean over the phase pair = unpack to the pooled resolution.
  - nearest-upsample x2: both phases equal the source = repeat channels.
  - channel concat (skips): packed concat == packing of the concat.

Weights are repacked from the UNMODIFIED checkpoint params at trace time
(tiny arrays); results match the standard forward to float tolerance
(tests/test_packed_unet.py).

Inside an iterated sampler (ddpm_sample's lax.scan), the kernel repacking
would otherwise be traced into EVERY step — a chain of small scatters per
conv that XLA does not reliably hoist out of the loop. `pack_unet_params`
runs the repacking once (its outputs are loop-invariant), and
`packed_unet_predict(prepacked=...)` consumes the result.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import adaptive_group_count, gelu, nearest_resize_1d

__all__ = ["packed_unet_predict", "pack_conv_kernel", "pack_unet_params"]


# ------------------------------------------------------------ layout moves


def _pack(x: jnp.ndarray) -> jnp.ndarray:
    """[N, T, C] -> [N, T/2, 2C], packed channel index = c*2 + phase."""
    n, t, c = x.shape
    assert t % 2 == 0
    x = jnp.reshape(x, (n, t // 2, 2, c))
    return jnp.reshape(jnp.transpose(x, (0, 1, 3, 2)), (n, t // 2, 2 * c))


def _unpack(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _pack: [N, T2, 2C] -> [N, 2*T2, C]."""
    n, t2, c2 = x.shape
    assert c2 % 2 == 0
    x = jnp.reshape(x, (n, t2, c2 // 2, 2))
    return jnp.reshape(jnp.transpose(x, (0, 1, 3, 2)), (n, t2 * 2, c2 // 2))


# ------------------------------------------------------- kernel re-packing


def pack_conv_kernel(kernel: np.ndarray, dilation: int = 1):
    """[K, Cin, Cout] stride-1 SAME conv kernel -> packed equivalent.

    Returns (packed_kernel [K', 2Cin, 2Cout], (pad_left, pad_right)) such
    that a VALID conv over the packed input padded by that amount equals the
    packing of the original SAME conv output.
    """
    k, cin, cout = kernel.shape
    half = k // 2
    entries = {}
    for kk in range(k):
        dk = (kk - half) * dilation
        for qo in (0, 1):
            for pi in (0, 1):
                num = qo + dk - pi
                if num % 2:
                    continue
                entries.setdefault(num // 2, []).append((kk, qo, pi))
    dps = sorted(entries)
    kp = dps[-1] - dps[0] + 1
    packed = jnp.zeros((kp, 2 * cin, 2 * cout), dtype=kernel.dtype)
    for dp, lst in entries.items():
        for kk, qo, pi in lst:
            packed = packed.at[dp - dps[0], pi::2, qo::2].set(kernel[kk])
    return packed, (-dps[0], dps[-1])


def _packed_conv(x, conv_params, dilation=1, key=None, prepacked=None,
                 record=None):
    """Packed-layout conv from ORIGINAL conv params. The kernel repack is a
    chain of small scatters: done here per trace unless ``prepacked`` holds
    a precomputed (kernel, bias2) for ``key`` (see pack_unet_params), in
    which case no repacking ops enter this trace at all."""
    if prepacked is not None and key in prepacked:
        kernel, bias2 = prepacked[key]
        half = (kernel.shape[0] - 1) // 2  # repack paddings are symmetric
        pad = (half, half)
    else:
        kernel, pad = pack_conv_kernel(conv_params["kernel"], dilation)
        bias = conv_params.get("bias")
        bias2 = None if bias is None else jnp.repeat(bias, 2)
        if record is not None:
            assert pad[0] == pad[1], pad
            record[key] = (kernel, bias2)
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1,),
        padding=[pad],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias2 is not None:
        out = out + bias2.astype(x.dtype)
    return out


def _plain_conv(x, conv_params, dilation=1):
    kernel = conv_params["kernel"]
    pad = (kernel.shape[0] - 1) * dilation // 2
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    bias = conv_params.get("bias")
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


# ------------------------------------------------------------- norm / film


def _group_norm(x, norm_params, groups, packed, eps=1e-5):
    """GroupNorm from params; ``groups`` is the ORIGINAL group count, which
    is exact in both layouts (packed groups are contiguous supersets)."""
    n, t, c = x.shape
    xf = x.astype(jnp.float32)
    g = jnp.reshape(xf, (n, t, groups, c // groups))
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=(1, 3), keepdims=True)
    out = (g - mean) * jax.lax.rsqrt(var + eps)
    out = jnp.reshape(out, (n, t, c))
    scale = norm_params["scale"].astype(jnp.float32)
    bias = norm_params["bias"].astype(jnp.float32)
    if packed:
        scale, bias = jnp.repeat(scale, 2), jnp.repeat(bias, 2)
    return (out * scale + bias).astype(x.dtype)


def _film(params, emb, packed):
    cond = gelu(emb)
    ab = cond @ params["kernel"] + params["bias"]
    a, b = jnp.split(ab[:, None, :], 2, axis=-1)
    if packed:
        a, b = jnp.repeat(a, 2, axis=-1), jnp.repeat(b, 2, axis=-1)
    return a, b


# -------------------------------------------------------------- res blocks


def _resize(h, scale_factor, in_packed, out_packed):
    """x2 pool / x2 nearest-up with layout transitions."""
    if scale_factor == 1.0:
        assert in_packed == out_packed
        return h
    if scale_factor == 0.5:
        if in_packed:
            # Mean over the phase pair = the pooled (unpacked) array.
            n, t2, c2 = h.shape
            pooled = jnp.mean(
                jnp.reshape(h, (n, t2, c2 // 2, 2)), axis=-1
            )
        else:
            n, t, c = h.shape
            pooled = jnp.mean(jnp.reshape(h, (n, t // 2, 2, c)), axis=2)
        return _pack(pooled) if out_packed else pooled
    assert scale_factor == 2.0
    src = _unpack(h) if in_packed else h
    if out_packed:
        return jnp.repeat(src, 2, axis=-1)  # both phases = source
    return jnp.repeat(src, 2, axis=1)


def _resblock(x, params, emb, groups_in, groups_out, in_packed, out_packed,
              scale_factor=1.0, dilation=2, key=None, prepacked=None,
              record=None):
    """models/layers.py::ResBlock from its params tree, in either layout.

    ``groups_in``/``groups_out`` are the ORIGINAL GroupNorm group counts
    (adaptive_group_count of the unpacked channel widths).
    """
    def conv(h, cp, sub, dilation=1):
        if out_packed:
            return _packed_conv(
                h, cp, dilation,
                key=None if key is None else f"{key}/{sub}",
                prepacked=prepacked, record=record,
            )
        return _plain_conv(h, cp, dilation)

    h = gelu(_group_norm(x, params["norm_in"]["norm"], groups_in, in_packed))
    h = _resize(h, scale_factor, in_packed, out_packed)
    h = conv(h, params["conv_in"]["conv"], "conv_in")
    h = _group_norm(h, params["norm_mid"]["norm"], groups_out, out_packed)
    if emb is not None:
        a, b = _film(params["cond_proj"], emb, out_packed)
        h = h * (a + 1.0) + b
    h = gelu(h)
    h = conv(h, params["conv_out"]["conv"], "conv_out", dilation=dilation)

    skip = _resize(x, scale_factor, in_packed, out_packed)
    if "skip_proj" in params:
        skip = conv(skip, params["skip_proj"]["conv"], "skip_proj",
                    dilation=1)
    return skip + h


# ----------------------------------------------------------- full predictor


def packed_unet_predict(
    predictor,
    params,
    x: jnp.ndarray,
    ts: jnp.ndarray,
    cond: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    pack_levels: int = 2,
    fuse_levels: int = 0,
    prepacked: Optional[dict] = None,
    _record: Optional[dict] = None,
) -> jnp.ndarray:
    """UNetPredictor forward with the first ``pack_levels`` pyramid levels
    (both down and up paths, plus in/out convs) run in packed layout, and/or
    the same-resolution ResBlocks of the first ``fuse_levels`` levels run as
    single Pallas megakernels (ops/fused_resblock.py; unpacked layout only).

    Exact-output equivalent of ``predictor.apply`` from the same params.
    """
    from ..parallel.sequence import _time_class_embedding
    from .fused_resblock import fused_resblock, fused_resblock_supported

    # Same conditioning contract as UNetPredictor.__call__: a conditional
    # model silently ignoring absent labels/cond would produce wrong audio
    # with no error.
    assert (labels is None) == (predictor.num_labels is None), (
        "labels required iff the predictor is class-conditional"
    )
    assert (cond is None) == (predictor.cond_channels is None), (
        "cond required iff the predictor takes conditioning channels"
    )
    ch = predictor.base_channels
    if predictor.dtype is not None:
        x = x.astype(predictor.dtype)
        if cond is not None:
            cond = cond.astype(predictor.dtype)
    emb = _time_class_embedding(predictor, params, ts, labels)

    def packed_at(depth):
        return depth < pack_levels

    def groups_at(channels):
        return adaptive_group_count(channels)

    def same_res(h, bparams, gi, go, depth, key, dilation=2):
        """Same-resolution ResBlock: Pallas megakernel when requested and
        supported for this shape, else the XLA path (packed or plain)."""
        if (depth < fuse_levels and not packed_at(depth)
                and fused_resblock_supported(h, dilation)):
            return fused_resblock(
                h, bparams, emb, groups_in=gi, groups_out=go,
                dilation=dilation,
            )
        return _resblock(
            h, bparams, emb, gi, go, packed_at(depth), packed_at(depth),
            dilation=dilation, key=key, prepacked=prepacked, record=_record,
        )

    def same_res_concat(h, skip_h, bparams, gi, go, depth, key):
        """Up-path block on concat([h, skip], -1); the megakernel takes the
        halves separately so the concat is never materialised in HBM."""
        cin = h.shape[-1] + skip_h.shape[-1]
        if (depth < fuse_levels and not packed_at(depth)
                and h.shape[-1] % max(1, cin // gi) == 0):
            probe = jax.ShapeDtypeStruct((h.shape[0], h.shape[1], cin),
                                         h.dtype)
            if fused_resblock_supported(probe, 2):
                return fused_resblock(
                    h, bparams, emb, groups_in=gi, groups_out=go, x2=skip_h,
                )
        return same_res(
            jnp.concatenate([h, skip_h], axis=-1), bparams, gi, go, depth,
            key,
        )

    if packed_at(0):
        h = _packed_conv(_pack(x), params["in_conv"]["conv"], key="in_conv",
                         prepacked=prepacked, record=_record)
    else:
        h = _plain_conv(x, params["in_conv"]["conv"])
    if cond is not None:
        c = _plain_conv(cond, params["cond_proj"]["conv"])
        c = nearest_resize_1d(c, x.shape[1])
        h = h + (_pack(c) if packed_at(0) else c)

    mults = list(predictor.channel_mult)
    skips = [h]
    widths = [ch]  # unpacked channel width per skip entry
    cur = ch
    bi = 0
    for depth, mult in enumerate(mults):
        for _ in range(predictor.depth_mult):
            h = same_res(
                h, params[f"down_blocks_{bi}"],
                groups_at(cur), groups_at(mult * ch), depth,
                f"down_blocks_{bi}",
            )
            cur = mult * ch
            bi += 1
            skips.append(h)
            widths.append(cur)
        if depth != len(mults) - 1:
            h = _resblock(
                h, params[f"down_blocks_{bi}"], emb,
                groups_at(cur), groups_at(cur),
                packed_at(depth), packed_at(depth + 1),
                scale_factor=0.5, key=f"down_blocks_{bi}",
                prepacked=prepacked, record=_record,
            )
            bi += 1
            skips.append(h)
            widths.append(cur)

    for mi, d in enumerate(predictor.middle_dilations):
        h = same_res(
            h, params[f"middle_blocks_{mi}"],
            groups_at(cur), groups_at(cur), len(mults) - 1,
            f"middle_blocks_{mi}", dilation=d,
        )

    ui = 0
    for depth, mult in list(enumerate(mults))[::-1]:
        for _ in range(predictor.depth_mult + 1):
            skip_h = skips.pop()
            skip_w = widths.pop()
            h = same_res_concat(
                h, skip_h, params[f"up_blocks_{ui}"],
                groups_at(cur + skip_w), groups_at(mult * ch), depth,
                f"up_blocks_{ui}",
            )
            cur = mult * ch
            ui += 1
        if depth:
            h = _resblock(
                h, params[f"up_blocks_{ui}"], emb,
                groups_at(cur), groups_at(cur),
                packed_at(depth), packed_at(depth - 1),
                scale_factor=2.0, key=f"up_blocks_{ui}",
                prepacked=prepacked, record=_record,
            )
            ui += 1

    h = gelu(
        _group_norm(
            h, params["out_norm"]["norm"], groups_at(cur), packed_at(0)
        )
    )
    if packed_at(0):
        h = _unpack(_packed_conv(h, params["out_conv"]["conv"],
                                 key="out_conv", prepacked=prepacked,
                                 record=_record))
    else:
        h = _plain_conv(h, params["out_conv"]["conv"])
    return h.astype(jnp.float32)


def pack_unet_params(predictor, params, pack_levels: int = 2) -> dict:
    """Repack all conv weights the packed levels use, ONCE.

    Returns {conv path: (packed_kernel, doubled_bias)} for
    ``packed_unet_predict(..., prepacked=...)``. Call this OUTSIDE any
    sampling loop (but inside jit is fine): inside ddpm_sample's lax.scan
    the repacking scatters would otherwise be traced into every step.

    Implementation: trace a dummy tiny-T forward in record mode — the dummy
    compute is dead code XLA eliminates; only the (loop-invariant) repacked
    weights survive.
    """
    record: dict = {}
    t = 2 ** (len(predictor.channel_mult) + 3)
    dummy = jnp.zeros((1, t, predictor.in_channels), jnp.float32)
    ts = jnp.full((1,), 0.5, jnp.float32)
    labels = (None if predictor.num_labels is None
              else jnp.zeros((1,), jnp.int32))
    cond = (None if predictor.cond_channels is None
            else jnp.zeros((1, t, predictor.cond_channels), jnp.float32))
    packed_unet_predict(
        predictor, params, dummy, ts, cond=cond, labels=labels,
        pack_levels=pack_levels, _record=record,
    )
    return record
