"""Sequence (time-axis) parallelism for 1-D audio models.

The reference is bounded to 4 s clips; SURVEY.md §5.7 flags time-axis
sharding as the TPU-native path to minutes-long audio. This module provides
the building blocks: convolutions and pooling/upsampling over a T-sharded
[N, T, C] array inside ``shard_map``, with halo exchange over the mesh via
``jax.lax.ppermute`` (neighbor transfers ride the ICI ring), and
cross-shard GroupNorm statistics via ``psum``.

Usage pattern (see tests/test_sequence_parallel.py):

    mesh = create_mesh()
    y = seq_sharded_conv1d(mesh, x, kernel, bias, dilation=2)

Each device holds T/n_devices timesteps; a k-wide dilated conv needs
(k-1)//2 * dilation halo samples from each neighbor, exchanged with two
ppermutes; edge shards zero-pad, reproducing SAME-conv semantics exactly.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = [
    "SEQ_AXIS",
    "create_seq_mesh",
    "halo_exchange",
    "seq_sharded_conv1d",
    "seq_sharded_group_norm",
    "seq_sharded_avg_pool",
    "seq_sharded_upsample",
    "seq_parallel_unet_encoder",
    "seq_parallel_unet_predictor",
    "seq_parallel_wavegrad_encoder",
    "seq_parallel_wavegrad_predictor",
    "seq_parallel_predictor",
    "seq_parallel_ddpm_sample",
    "seq_parallel_sample",
    "seq_parallel_ddpm_losses",
    "make_seq_parallel_train_step",
]

SEQ_AXIS = "seq"


def create_seq_mesh(num_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over the time axis (sequence parallelism)."""
    import numpy as np

    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (SEQ_AXIS,))


def halo_exchange(x: jnp.ndarray, left: int, right: int,
                  axis_name: str = SEQ_AXIS) -> jnp.ndarray:
    """Pad a local [N, Tl, C] shard with neighbor halos (zeros at the ends).

    Runs inside shard_map. ``left``/``right`` are the halo widths needed
    before/after the local block.
    """
    size = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    assert max(left, right) <= x.shape[1], (
        f"halo {max(left, right)} exceeds local block {x.shape[1]}: the "
        "sharded sequence is too short for this dilation/mesh combination "
        "(halo exchange only reaches immediate neighbors)"
    )

    parts = []
    if left:
        # Receive the last `left` samples of the left neighbor.
        send_right = [(i, (i + 1) % size) for i in range(size)]
        from_left = jax.lax.ppermute(
            x[:, -left:, :], axis_name, perm=send_right
        )
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        parts.append(from_left)
    parts.append(x)
    if right:
        send_left = [(i, (i - 1) % size) for i in range(size)]
        from_right = jax.lax.ppermute(
            x[:, :right, :], axis_name, perm=send_left
        )
        from_right = jnp.where(
            idx == size - 1, jnp.zeros_like(from_right), from_right
        )
        parts.append(from_right)
    return jnp.concatenate(parts, axis=1)


def _local_conv1d(x, kernel, bias, stride, dilation):
    """VALID 1-D conv over [N, T, C] with kernel [K, Cin, Cout]."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        out = out + bias
    return out


def seq_sharded_conv1d(
    mesh: Mesh,
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """SAME conv1d over a T-sharded global array.

    x: [N, T, C] sharded as P(None, SEQ_AXIS, None); kernel [K, Cin, Cout]
    replicated. The local T must be divisible by stride.
    """
    k = kernel.shape[0]
    halo = (k - 1) * dilation // 2

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, SEQ_AXIS, None), P(None, None, None),
                  P(None)),
        out_specs=P(None, SEQ_AXIS, None),
    )
    def run(x_local, kernel, bias):
        padded = halo_exchange(x_local, halo, halo)
        return _local_conv1d(padded, kernel, bias, stride, dilation)

    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), dtype=x.dtype)
    return run(x, kernel, bias)


def seq_sharded_group_norm(
    mesh: Mesh,
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over a T-sharded array: per-group statistics combine across
    shards with a psum, matching the unsharded op exactly."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, SEQ_AXIS, None), P(None), P(None)),
        out_specs=P(None, SEQ_AXIS, None),
    )
    def run(x_local, scale, bias):
        n, tl, c = x_local.shape
        xf = x_local.astype(jnp.float32)
        grouped = jnp.reshape(xf, (n, tl, num_groups, c // num_groups))
        local_sum = jnp.sum(grouped, axis=(1, 3))  # [N, G]
        local_sq = jnp.sum(jnp.square(grouped), axis=(1, 3))
        total_sum = jax.lax.psum(local_sum, SEQ_AXIS)
        total_sq = jax.lax.psum(local_sq, SEQ_AXIS)
        count = tl * jax.lax.axis_size(SEQ_AXIS) * (c // num_groups)
        mean = total_sum / count
        # Clamp at 0 like flax nn.GroupNorm: f32 cancellation in the
        # one-pass E[x^2] - mean^2 can go slightly negative for
        # large-mean/small-variance groups, and rsqrt(<0 + eps) is NaN.
        var = jnp.maximum(total_sq / count - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        normed = (grouped - mean[:, None, :, None]) * inv[:, None, :, None]
        normed = jnp.reshape(normed, (n, tl, c))
        out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return out.astype(x_local.dtype)

    return run(x, scale, bias)


def seq_sharded_avg_pool(mesh: Mesh, x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Non-overlapping average pool over the T axis of a T-sharded array.

    Requires the local T to be divisible by factor (window boundaries align
    with shard boundaries), which holds for power-of-two pyramids on
    power-of-two meshes.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P(None, SEQ_AXIS, None), out_specs=P(None, SEQ_AXIS, None),
    )
    def run(x_local):
        n, tl, c = x_local.shape
        return jnp.mean(
            jnp.reshape(x_local, (n, tl // factor, factor, c)), axis=2
        )

    return run(x)


def seq_sharded_upsample(mesh: Mesh, x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor upsample over the T axis of a T-sharded array."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P(None, SEQ_AXIS, None), out_specs=P(None, SEQ_AXIS, None),
    )
    def run(x_local):
        return jnp.repeat(x_local, factor, axis=1)

    return run(x)


# --------------------------------------------------------- model execution


from ..models.layers import adaptive_group_count as _adaptive_groups  # noqa: E402


def _seq_conv_from_params(mesh, x, conv_params, stride=1, dilation=1):
    return seq_sharded_conv1d(
        mesh, x, conv_params["kernel"], conv_params.get("bias"),
        stride=stride, dilation=dilation,
    )


def _seq_norm(mesh, x, norm_params, use_gelu):
    out = seq_sharded_group_norm(
        mesh, x, norm_params["scale"], norm_params["bias"],
        _adaptive_groups(x.shape[-1]),
    )
    if use_gelu:
        out = jax.nn.gelu(out, approximate=False)
    return out


def _seq_resblock(mesh, x, params, scale_factor=1.0, dilation=2, emb=None):
    """Run models/layers.py::ResBlock from its params tree over a T-sharded
    activation. ``emb`` ([N, E], replicated) enables the FiLM scale-shift
    path (h * (a + 1) + b); it broadcasts over T, so it runs on the global
    sharded array directly — no collective needed."""
    h = _seq_norm(mesh, x, params["norm_in"]["norm"], use_gelu=True)
    if scale_factor == 0.5:
        h = seq_sharded_avg_pool(mesh, h, 2)
    elif scale_factor == 2.0:
        h = seq_sharded_upsample(mesh, h, 2)
    h = _seq_conv_from_params(mesh, h, params["conv_in"]["conv"])
    h = _seq_norm(mesh, h, params["norm_mid"]["norm"], use_gelu=False)
    if emb is not None:
        cond = jax.nn.gelu(emb, approximate=False)
        ab = cond @ params["cond_proj"]["kernel"] + params["cond_proj"]["bias"]
        a, b = jnp.split(ab[:, None, :], 2, axis=-1)
        h = h * (a + 1.0) + b
    h = jax.nn.gelu(h, approximate=False)
    h = _seq_conv_from_params(
        mesh, h, params["conv_out"]["conv"], dilation=dilation
    )

    skip = x
    if scale_factor == 0.5:
        skip = seq_sharded_avg_pool(mesh, skip, 2)
    elif scale_factor == 2.0:
        skip = seq_sharded_upsample(mesh, skip, 2)
    if "skip_proj" in params:
        skip = _seq_conv_from_params(mesh, skip, params["skip_proj"]["conv"])
    return skip + h


def seq_parallel_unet_encoder(mesh, encoder, params, x):
    """Run a models/unet.py::UNetEncoder over a time-sharded waveform.

    encoder: the UNetEncoder module (for its static topology config).
    params: its params tree (same checkpoint weights as single-chip use).
    x: [N, T, 1] sharded P(None, SEQ_AXIS, None); T/n_shards must stay
       divisible through the pooling pyramid and larger than the widest
       dilation halo.

    This is the minutes-long-audio path (SURVEY §5.7): each chip holds a
    slice of the waveform; convs exchange halos over ICI and GroupNorm
    statistics psum across the mesh, producing bit-consistent results with
    the unsharded encoder.
    """
    h = _seq_conv_from_params(mesh, x, params["in_conv"]["conv"])

    bi = 0
    for depth, mult in enumerate(encoder.channel_mult):
        for _ in range(encoder.depth_mult):
            h = _seq_resblock(mesh, h, params[f"blocks_{bi}"])
            bi += 1
        if depth != len(encoder.channel_mult) - 1:
            h = _seq_resblock(
                mesh, h, params[f"blocks_{bi}"], scale_factor=0.5
            )
            bi += 1
    for d in encoder.out_dilations:
        h = _seq_resblock(mesh, h, params[f"blocks_{bi}"], dilation=d)
        bi += 1

    h = _seq_norm(mesh, h, params["out_norm"]["norm"], use_gelu=True)
    h = _seq_conv_from_params(mesh, h, params["out_conv"]["conv"])
    return h.astype(jnp.float32)


def _time_class_embedding(predictor, params, ts, labels):
    """[N] ts (+ labels) -> replicated [N, E] embedding, mirroring
    UNetPredictor.__call__ (models/unet.py): sinusoidal TimeEmbedding
    (numerics shared with models/layers.py) + Dense, GELU, Dense, plus the
    class embedding row."""
    from ..models.layers import sinusoidal_time_features

    embed_dim = predictor.base_channels * 4
    sincos = sinusoidal_time_features(ts, embed_dim)
    te = params["time_embed"]["proj"]
    emb = sincos @ te["kernel"] + te["bias"]
    emb = jax.nn.gelu(emb, approximate=False)
    tex = params["time_embed_extra"]
    emb = emb @ tex["kernel"] + tex["bias"]
    if labels is not None:
        emb = emb + jnp.take(
            params["class_embed"]["embedding"], labels, axis=0
        )
    return emb


def seq_parallel_unet_predictor(
    mesh, predictor, params, x, ts, cond=None, labels=None
):
    """Run a models/unet.py::UNetPredictor over a time-sharded waveform.

    predictor: the UNetPredictor module (static topology config).
    params: its params tree (unmodified checkpoint weights).
    x: [N, T, in_channels] sharded P(None, SEQ_AXIS, None); ts: [N].
    cond: optional [N, T1, C] sharded the same way, with T an integer
    multiple of T1 (the VQ-VAE downsample_rate) so the nearest-resize is a
    pure per-shard repeat. labels: optional [N] ints (replicated).

    Convs exchange halos over the ICI ring; GroupNorm statistics psum across
    the mesh; the FiLM time/class conditioning and skip concats are
    per-timestep and need no communication. This is the minutes-long-audio
    *conversion* path (SURVEY §5.7): with the encoder counterpart above, a
    full sample_vqvae decode runs T-sharded from unmodified checkpoints.
    """
    emb = _time_class_embedding(predictor, params, ts, labels)

    h = _seq_conv_from_params(mesh, x, params["in_conv"]["conv"])
    if cond is not None:
        c = _seq_conv_from_params(mesh, cond, params["cond_proj"]["conv"])
        factor = h.shape[1] // c.shape[1]
        assert h.shape[1] == c.shape[1] * factor, (
            "T must be an integer multiple of the cond length for the "
            "sequence-parallel predictor"
        )
        h = h + seq_sharded_upsample(mesh, c, factor)

    skips = [h]
    bi = 0
    for depth, mult in enumerate(predictor.channel_mult):
        for _ in range(predictor.depth_mult):
            h = _seq_resblock(mesh, h, params[f"down_blocks_{bi}"], emb=emb)
            bi += 1
            skips.append(h)
        if depth != len(predictor.channel_mult) - 1:
            h = _seq_resblock(
                mesh, h, params[f"down_blocks_{bi}"], scale_factor=0.5,
                emb=emb,
            )
            bi += 1
            skips.append(h)

    for mi, d in enumerate(predictor.middle_dilations):
        h = _seq_resblock(
            mesh, h, params[f"middle_blocks_{mi}"], dilation=d, emb=emb
        )

    ui = 0
    for depth, mult in list(enumerate(predictor.channel_mult))[::-1]:
        for _ in range(predictor.depth_mult + 1):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = _seq_resblock(mesh, h, params[f"up_blocks_{ui}"], emb=emb)
            ui += 1
        if depth:
            h = _seq_resblock(
                mesh, h, params[f"up_blocks_{ui}"], scale_factor=2.0, emb=emb
            )
            ui += 1

    h = _seq_norm(mesh, h, params["out_norm"]["norm"], use_gelu=True)
    h = _seq_conv_from_params(mesh, h, params["out_conv"]["conv"])
    return h.astype(jnp.float32)


# ------------------------------------------------- WaveGrad model execution
#
# WaveGrad (models/wavegrad.py; reference wavegrad.py:16-389) is simpler to
# time-shard than the UNet: its normalization is LayerNorm over CHANNELS
# (per-timestep — no cross-shard statistics at all), so only the convs
# communicate (halo exchange); pooling/upsampling stay shard-local.


def _seq_layer_norm(x, params, eps=1e-5):
    """Per-timestep LayerNorm over the channel axis of [N, T, C] — fully
    local under time sharding. Matches flax nn.LayerNorm numerics
    (fast-variance E[x^2] - mean^2, clamped at 0)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mu2 - jnp.square(mean), 0.0)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * params["scale"].astype(jnp.float32) + params[
        "bias"
    ].astype(jnp.float32)
    return out.astype(x.dtype)


def _seq_film(mesh, params, inputs, cond, ts, labels=None):
    """models/wavegrad.py::FiLM over T-sharded activations (reference
    wavegrad.py:280-336): time (+ zero-init label) embedding is replicated
    [N, hidden]; the cond-sequence path is LN (local) + two halo convs."""
    from ..models.layers import gelu, sinusoidal_time_features

    proj = params["time_emb"]["proj"]
    hidden = proj["kernel"].shape[1]
    emb = sinusoidal_time_features(ts, hidden) @ proj["kernel"] + proj["bias"]
    if labels is not None:
        emb = emb + jnp.take(
            params["label_emb"]["embedding"], labels, axis=0
        )
    c = _seq_layer_norm(cond, params["cond_norm"])
    c = _seq_conv_from_params(mesh, c, params["cond_conv"]["conv"])
    ab = _seq_conv_from_params(
        mesh, gelu(emb[:, None, :] + c), params["out_conv"]["conv"]
    )
    alpha, beta = jnp.split(ab, 2, axis=-1)
    return inputs * (1.0 + alpha) + beta


def _seq_dblock(mesh, params, h, rate, extra_blocks=0):
    """models/wavegrad.py::DBlock over a T-sharded activation."""
    from ..models.layers import gelu

    res = _seq_conv_from_params(mesh, h, params["res_conv"]["conv"])
    res = seq_sharded_avg_pool(mesh, res, rate)

    out = _seq_layer_norm(h, params["norm_in"])
    out = seq_sharded_avg_pool(mesh, out, rate)
    out = _seq_conv_from_params(mesh, gelu(out), params["conv_1"]["conv"])
    out = _seq_conv_from_params(
        mesh, gelu(out), params["conv_2"]["conv"], dilation=2
    )
    out = out + res

    for i in range(extra_blocks):
        e = _seq_layer_norm(out, params[f"extra_norm_{i}"])
        e = _seq_conv_from_params(
            mesh, gelu(e), params[f"extra_conv_{i}_a"]["conv"]
        )
        e = _seq_conv_from_params(
            mesh, gelu(e), params[f"extra_conv_{i}_b"]["conv"], dilation=4
        )
        e = _seq_conv_from_params(
            mesh, gelu(e), params[f"extra_conv_{i}_c"]["conv"], dilation=8
        )
        out = out + e
    return out


def _seq_ublock(mesh, params, h, z, ts, rate, labels=None):
    """models/wavegrad.py::UBlock (three FiLM stages) over T-sharded
    activations. ``z`` is the skip input from the down path (already at the
    output resolution)."""
    from ..models.layers import gelu

    res = seq_sharded_upsample(mesh, h, rate)
    res = _seq_conv_from_params(mesh, res, params["res_conv"]["conv"])

    out = _seq_layer_norm(h, params["norm_1"])
    out = seq_sharded_upsample(mesh, gelu(out), rate)
    out = _seq_conv_from_params(mesh, out, params["conv_1"]["conv"])
    out = _seq_film(mesh, params["film_1"], out, z, ts, labels=labels)
    out = _seq_conv_from_params(
        mesh, gelu(out), params["conv_2"]["conv"], dilation=2
    )
    out = out + res

    res = out
    out = _seq_film(mesh, params["film_2"], out, z, ts, labels=labels)
    out = _seq_layer_norm(out, params["norm_3"])
    out = _seq_conv_from_params(
        mesh, gelu(out), params["conv_3"]["conv"], dilation=4
    )
    out = _seq_film(mesh, params["film_3"], out, z, ts, labels=labels)
    out = _seq_conv_from_params(
        mesh, gelu(out), params["conv_4"]["conv"], dilation=8
    )
    out = _seq_conv_from_params(
        mesh, gelu(out), params["conv_5"]["conv"], dilation=16
    )
    return out + res


def seq_parallel_wavegrad_predictor(
    mesh, predictor, params, x, ts, cond=None, labels=None
):
    """Run a models/wavegrad.py::WaveGradPredictor over a time-sharded
    waveform (the WaveGrad counterpart of seq_parallel_unet_predictor;
    VERDICT round-3 weak #6).

    x: [N, T, 1] sharded P(None, SEQ_AXIS, None), T divisible by 64 and by
    the mesh (each DBlock halves/quarters the LOCAL block, so T/n_shards
    must survive /64 with at least the widest halo left — dilation 16 at
    the conv_5 levels). cond: optional [N, T/64, cond_channels] sharded the
    same way; labels: optional [N] ints (replicated). Same checkpoint
    params as single-chip use.
    """
    if cond is None:
        cond = jax.lax.with_sharding_constraint(
            jnp.zeros(
                (x.shape[0], x.shape[1] // 64, predictor.cond_channels),
                dtype=x.dtype,
            ),
            NamedSharding(mesh, jax.sharding.PartitionSpec(
                None, SEQ_AXIS, None
            )),
        )

    d_outs = []
    h = _seq_conv_from_params(mesh, x, params["d_in_conv"]["conv"])
    d_outs.append(h)
    for i, (_, rate) in enumerate([(4, 4), (4, 2), (8, 2), (16, 2)]):
        h = _seq_dblock(mesh, params[f"d_block_{i}"], h, rate)
        d_outs.append(h)

    u = _seq_conv_from_params(mesh, cond, params["u_in_conv"]["conv"])
    for i, (_, rate) in enumerate([(16, 2), (16, 2), (8, 2), (4, 2), (4, 4)]):
        u = _seq_ublock(
            mesh, params[f"u_block_{i}"], u, d_outs.pop(), ts, rate,
            labels=labels,
        )

    out = _seq_layer_norm(u, params["out_norm"])
    out = _seq_conv_from_params(mesh, out, params["out_conv"]["conv"])
    return out.astype(jnp.float32)


def seq_parallel_wavegrad_encoder(mesh, encoder, params, x):
    """Run a models/wavegrad.py::WaveGradEncoder (DBlock stack with
    extra_blocks=1) over a time-sharded waveform."""
    h = _seq_conv_from_params(mesh, x, params["in_conv"]["conv"])
    for i, rate in enumerate([4, 2, 2, 2, 2]):
        h = _seq_dblock(mesh, params[f"d_block_{i}"], h, rate,
                        extra_blocks=1)
    return h.astype(jnp.float32)


def seq_parallel_predictor(mesh, predictor, params, x, ts, cond=None,
                           labels=None):
    """Dispatch to the sequence-parallel implementation matching the
    predictor's architecture (UNet or WaveGrad)."""
    from ..models.unet import UNetPredictor
    from ..models.wavegrad import WaveGradPredictor

    if isinstance(predictor, UNetPredictor):
        return seq_parallel_unet_predictor(
            mesh, predictor, params, x, ts, cond=cond, labels=labels
        )
    if isinstance(predictor, WaveGradPredictor):
        return seq_parallel_wavegrad_predictor(
            mesh, predictor, params, x, ts, cond=cond, labels=labels
        )
    raise TypeError(
        "sequence parallelism supports UNet and WaveGrad predictors, got "
        f"{type(predictor).__name__}"
    )


def seq_parallel_sample(
    mesh,
    diffusion,
    predictor,
    params,
    x_T,
    steps,
    rng,
    cond=None,
    labels=None,
    sampler="ddpm",
    eta=0.0,
    **kwargs,
):
    """diffusion.{ddpm,ddim,dpmpp}_sample with the T-sharded predictor.

    x_T: [N, T, 1] sharded P(None, SEQ_AXIS, None). The reverse-process
    arithmetic of all three samplers — DDPM's posterior mean/sigma and
    noise add, DDIM's x0/eps recombination, DPM++(2M)'s multistep update
    in x/x0 (diffusion/process.py:280-371) — is elementwise in the time
    axis, so it partitions trivially; only the predictor communicates
    (halos + GN psums). Returns the sampled x_0 with the same sharding.
    Works with both UNet and WaveGrad predictors (seq_parallel_predictor
    dispatch).
    """
    pred_fn = lambda xs, ts: seq_parallel_predictor(  # noqa: E731
        mesh, predictor, params, xs, ts, cond=cond, labels=labels
    )
    if sampler == "ddim":
        return diffusion.ddim_sample(
            x_T, pred_fn, steps=steps, rng=rng, eta=eta, **kwargs
        )
    if sampler == "dpmpp":
        return diffusion.dpmpp_sample(
            x_T, pred_fn, steps=steps, rng=rng, **kwargs
        )
    assert sampler == "ddpm", f"unknown sampler {sampler!r}"
    return diffusion.ddpm_sample(
        x_T, pred_fn, steps=steps, rng=rng, **kwargs
    )


# Backwards-compatible alias: the function predates the ddim/dpmpp
# dispatch and was named after its original single sampler.
seq_parallel_ddpm_sample = seq_parallel_sample


def seq_parallel_vqvae_convert(
    mesh,
    model,
    variables,
    x,
    rng,
    labels=None,
    steps=100,
    **kwargs,
):
    """Full speaker conversion (encode -> VQ -> diffusion decode) over a
    time-sharded waveform — the minutes-long-audio path the reference cannot
    express (it is bounded to 4 s clips; SURVEY §5.7).

    model: a VQVAE whose encoder is a UNetEncoder (unet/unet128 families).
    variables: its unmodified checkpoint variables.
    x: [N, T, 1] sharded P(None, SEQ_AXIS, None); T divisible by
       downsample_rate * n_shards.
    labels: optional [N] target-speaker ids (replicated).

    Mirrors VQVAE.encode + VQVAE.decode (vq_vae.py): the VQ nearest-neighbor
    assignment is per-timestep (a [C] x [D, C] contraction), so it runs on
    the sharded encoder output without communication; only convs (halos) and
    GroupNorms (stat psums) talk across the mesh.
    """
    from ..models.unet import UNetEncoder
    from ..models.wavegrad import WaveGradEncoder
    from ..vq import vq_forward

    params = variables["params"]

    if isinstance(model.encoder, UNetEncoder):
        enc = seq_parallel_unet_encoder(
            mesh, model.encoder, params["encoder"], x
        )
    elif isinstance(model.encoder, WaveGradEncoder):
        enc = seq_parallel_wavegrad_encoder(
            mesh, model.encoder, params["encoder"], x
        )
    else:
        raise TypeError(
            "sequence-parallel conversion supports UNet- and WaveGrad-"
            f"family encoders, got {type(model.encoder).__name__}"
        )
    cond_seq = vq_forward(params["vq"]["dictionary"], enc)["embedded"]

    x_len = cond_seq.shape[1] * model.encoder.downsample_rate
    rng, noise_rng = jax.random.split(rng)
    x_T = jax.random.normal(
        noise_rng, (cond_seq.shape[0], x_len, 1), dtype=jnp.float32
    )
    x_T = jax.device_put(x_T, NamedSharding(mesh, P(None, SEQ_AXIS, None)))

    return seq_parallel_sample(
        mesh,
        model.diffusion,
        model.predictor,
        params["predictor"],
        x_T,
        steps=steps,
        rng=rng,
        cond=cond_seq,
        labels=labels,
        **kwargs,
    )


def seq_parallel_ddpm_losses(
    mesh, diffusion, predictor, params, rng, x, labels=None, cond=None
):
    """Per-element diffusion eps-MSE with the T-sharded UNet predictor.

    x: [N, T, C] sharded P(None, SEQ_AXIS, None). The q-sampling noise is
    elementwise (partitions trivially; jax_threefry_partitionable keeps the
    draw layout-invariant), so only the predictor communicates. This is the
    TRAINING counterpart of seq_parallel_sample — clips longer than
    one chip's HBM can be trained on by sharding time, not just converted.
    """
    pred_fn = lambda xs, ts: seq_parallel_predictor(  # noqa: E731
        mesh, predictor, params, xs, ts, cond=cond, labels=labels
    )
    return diffusion.ddpm_losses(x, pred_fn, rng=rng)


def make_seq_parallel_train_step(mesh, diffusion, predictor, tx):
    """A jitted (params, opt_state, rng, x, labels) -> (params, opt_state,
    loss, losses) step that differentiates through the sequence-parallel
    predictor (halo exchanges and GroupNorm psums transpose to halo
    exchanges and psums — jax AD through shard_map/ppermute).

    Numerical equivalence with the single-device train step is tested in
    tests/test_sequence_parallel.py.
    """
    import optax

    def step(params, opt_state, rng, x, labels=None):
        def loss_fn(p):
            losses = seq_parallel_ddpm_losses(
                mesh, diffusion, predictor, p, rng, x, labels=labels
            )
            return jnp.mean(losses), losses

        (loss, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, losses

    return jax.jit(step, donate_argnums=(0, 1))
