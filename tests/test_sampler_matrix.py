"""Executable sampler x parallelism x conditioning support matrix.

Owns every cell of {ddpm, ddim, dpmpp} x {single-device, data-parallel,
tensor-parallel, sequence-parallel} x {uncond, classifier-guided, VQ-cond,
CFG, enc-pred-guided}: each cell either RUNS (and, where a single-device
reference is comparable, matches it) or is EXPLICITLY pinned unsupported
with the API-surface assertion that documents the hole. Round-4 verdict:
the dpmpp/seq-parallel gap went unnoticed because nothing owned this
matrix.

Parallel modes ride the 8-device CPU mesh from conftest. All models are
tiny; every sampling run is steps=2.
"""

import inspect

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vq_voice_swap_tpu.diffusion import Diffusion, make_schedule
from vq_voice_swap_tpu.models import UNetEncoder, UNetPredictor
from vq_voice_swap_tpu.models.classifier import Classifier
from vq_voice_swap_tpu.models.encoder_predictor import EncoderPredictor
from vq_voice_swap_tpu.parallel import batch_sharding, create_mesh
from vq_voice_swap_tpu.parallel.sequence import (
    SEQ_AXIS,
    create_seq_mesh,
    seq_parallel_sample,
    seq_parallel_vqvae_convert,
)
from vq_voice_swap_tpu.parallel.tensor import create_mesh_2d, tp_shardings
from vq_voice_swap_tpu.vq_vae import VQVAE

SAMPLERS = ("ddpm", "ddim", "dpmpp")
PARALLEL = ("single", "dp", "tp", "seq")
COND = ("uncond", "class_guided", "vq_cond", "cfg", "enc_pred")

# The pinned support table. A cell absent here RUNS; a cell present is
# EXPLICITLY unsupported for the stated reason, enforced by
# test_unsupported_cells_have_no_api below. (Sequence parallelism shards
# the TIME axis inside the predictor/encoder via shard_map; the decode-level
# guidance wrappers — CFG's 3x-batch pred_fn and the enc-pred jax.grad
# cond_fn — are implemented on VQVAE.decode*, which builds its own
# unsharded x_T, so there is no seq-parallel API for them.)
UNSUPPORTED = {
    ("seq", "cfg"):
        "seq_parallel_vqvae_convert exposes no CFG (label/vq scale) params",
    ("seq", "enc_pred"):
        "seq_parallel_vqvae_convert exposes no enc_pred params",
    ("seq", "class_guided"):
        "classifier guidance is a sample_diffusion-path feature; the "
        "seq-parallel entry points expose no cond_fn parameter",
}

BATCH = 8
XLEN = 128  # uncond waveform length
SEQ_LEN = 256  # vqvae waveform length (divisible by downsample * 8 shards)


@pytest.fixture(scope="module")
def zoo():
    """Tiny models + fixed inputs, built once for every cell."""
    diffusion = Diffusion(make_schedule("exp"))

    pred = UNetPredictor(
        base_channels=4, channel_mult=(1, 2), middle_dilations=(2,),
        depth_mult=1,
    )
    rng = np.random.RandomState(0)
    x_T = jnp.asarray(rng.randn(BATCH, XLEN, 1), dtype=jnp.float32)
    ts0 = jnp.asarray([0.5] * BATCH, dtype=jnp.float32)
    pred_vars = jax.jit(lambda r: pred.init(r, x_T, ts0))(jax.random.key(1))

    clf = Classifier(
        num_labels=3, base_channels=2, channel_mult=(1, 2), output_mult=4,
        depth_mult=1,
    )
    clf_vars = jax.jit(lambda r: clf.init(r, x_T, ts0))(jax.random.key(2))

    model = VQVAE(
        pred_name="unet", base_channels=4, enc_name="unet", cond_mult=4,
        dictionary_size=8, num_labels=3,
    )
    model.predictor = UNetPredictor(
        base_channels=4, channel_mult=(1, 2), middle_dilations=(2,),
        depth_mult=1, cond_channels=16, num_labels=3,
    )
    model.encoder = UNetEncoder(
        base_channels=4, channel_mult=(1, 2, 2), depth_mult=1,
        out_channels=16,
    )
    vq_vars = model.init_variables(jax.random.key(3), seq_len=SEQ_LEN)
    x_audio = jnp.asarray(
        rng.randn(BATCH, SEQ_LEN, 1) * 0.3, dtype=jnp.float32
    )
    codes = model.encode(vq_vars, x_audio)
    labels = jnp.asarray([1] * BATCH)

    ep = EncoderPredictor(
        base_channels=2, downsample_rate=model.encoder.downsample_rate,
        num_latents=8, bottleneck_dim=8, channel_mult=(1, 2), depth_mult=1,
    )
    ep_vars = jax.jit(
        lambda r: ep.init(r, x_audio[:1], jnp.asarray([0.5]))
    )(jax.random.key(4))

    return dict(
        diffusion=diffusion, pred=pred, pred_vars=pred_vars,
        clf=clf, clf_vars=clf_vars, model=model, vq_vars=vq_vars,
        x_T=x_T, x_audio=x_audio, codes=codes, labels=labels,
        ep=ep, ep_vars=ep_vars, singles={},
    )


def _sample(diffusion, x_T, pred_fn, sampler, key, cond_fn=None):
    kw = dict(steps=2, cond_fn=cond_fn)
    if sampler == "ddim":
        return diffusion.ddim_sample(x_T, pred_fn, rng=None, **kw)
    if sampler == "dpmpp":
        return diffusion.dpmpp_sample(x_T, pred_fn, rng=None, **kw)
    return diffusion.ddpm_sample(x_T, pred_fn, rng=key, **kw)


def _cond_fn(zoo, variables=None):
    clf, clf_vars = zoo["clf"], variables or zoo["clf_vars"]

    def cond_fn(x, ts):
        def lp(xx):
            logits = clf.apply(clf_vars, xx, ts)
            return jnp.sum(jax.nn.log_softmax(logits)[:, 1])

        return jax.grad(lp)(x) * 0.5

    return cond_fn


def _run_cell(zoo, par, cond, sampler):
    """Execute one supported cell through the repo's real public APIs;
    returns the sampled waveform as np.ndarray."""
    key = jax.random.key(7)
    d = zoo["diffusion"]
    model, vq_vars = zoo["model"], zoo["vq_vars"]
    codes, labels = zoo["codes"], zoo["labels"]
    x_T = zoo["x_T"]
    pred_vars = zoo["pred_vars"]

    if par == "dp":
        mesh = create_mesh()
        bs = batch_sharding(mesh)
        x_T = jax.device_put(x_T, bs)
        codes = jax.device_put(codes, bs)
        labels = jax.device_put(labels, NamedSharding(mesh, P("data")))
    elif par == "tp":
        mesh = create_mesh_2d(2)
        pred_vars = jax.device_put(pred_vars,
                                   tp_shardings(mesh, pred_vars))
        vq_vars = jax.device_put(vq_vars, tp_shardings(mesh, vq_vars))
    elif par == "seq":
        mesh = create_seq_mesh()
        seq_sh = NamedSharding(mesh, P(None, SEQ_AXIS, None))
        if cond == "uncond":
            x1 = jax.device_put(zoo["x_T"][:1], seq_sh)
            return np.asarray(seq_parallel_sample(
                mesh, d, zoo["pred"], zoo["pred_vars"]["params"], x1,
                steps=2, rng=key, sampler=sampler,
            ))
        assert cond == "vq_cond"
        xa = jax.device_put(zoo["x_audio"][:1], seq_sh)
        return np.asarray(seq_parallel_vqvae_convert(
            mesh, model, vq_vars, xa, key, labels=labels[:1], steps=2,
            sampler=sampler,
        ))

    if cond == "uncond":
        pred_fn = lambda xs, ts: zoo["pred"].apply(  # noqa: E731
            pred_vars, xs, ts
        )
        return np.asarray(_sample(d, x_T, pred_fn, sampler, key))
    if cond == "class_guided":
        pred_fn = lambda xs, ts: zoo["pred"].apply(  # noqa: E731
            pred_vars, xs, ts
        )
        return np.asarray(
            _sample(d, x_T, pred_fn, sampler, key, cond_fn=_cond_fn(zoo))
        )
    if cond == "vq_cond":
        return np.asarray(model.decode(
            vq_vars, codes, key, labels=labels, steps=2, sampler=sampler,
        ))
    if cond == "cfg":
        return np.asarray(model.decode_uncond_guidance(
            vq_vars, codes, key, labels=labels, steps=2,
            label_scale=1.0, vq_scale=1.0, sampler=sampler,
        ))
    assert cond == "enc_pred"
    return np.asarray(model.decode(
        vq_vars, codes, key, labels=labels, steps=2, sampler=sampler,
        enc_pred=(zoo["ep"], zoo["ep_vars"]), enc_pred_scale=0.5,
    ))


def _cells():
    out = []
    for par in PARALLEL:
        for cond in COND:
            if par == "seq" and (par, cond) in UNSUPPORTED:
                continue
            for sampler in SAMPLERS:
                out.append((par, cond, sampler))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("par,cond,sampler", _cells())
def test_supported_cell(zoo, par, cond, sampler):
    got = _run_cell(zoo, par, cond, sampler)
    assert np.isfinite(got).all(), (par, cond, sampler)

    # Cache/compare: dp and tp see the same inputs + rng as single, so the
    # result must match it; seq cells run batch 1 of the same inputs and
    # must match the single result's first element (the reverse process is
    # independent per batch element for these cond modes).
    singles = zoo["singles"]
    if par == "single":
        singles[(cond, sampler)] = got
        return
    want = singles.get((cond, sampler))
    if want is None:  # cell order is parallel-major; recompute if missing
        want = _run_cell(zoo, "single", cond, sampler)
        singles[(cond, sampler)] = want
    if par == "seq" and cond == "uncond":
        np.testing.assert_allclose(got, want[:1], atol=5e-5, rtol=5e-5)
    elif par == "seq":
        # vq_cond via convert: encode(x)->decode vs decode(encode(x)) with
        # the same key; match the unsharded decode of the same codes.
        unsharded = np.asarray(zoo["model"].decode(
            zoo["vq_vars"], zoo["codes"][:1], jax.random.key(7),
            labels=zoo["labels"][:1], steps=2, sampler=sampler,
        ))
        np.testing.assert_allclose(got, unsharded, atol=5e-5, rtol=5e-5)
    elif par == "tp":
        # Model-axis sharding changes matmul reduction order; after 2
        # sampler steps on an untrained model (outputs O(1e2-1e3)) the
        # noise floor is ~1e-4 absolute.
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-4)
    else:
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("cell", sorted(UNSUPPORTED))
def test_unsupported_cells_have_no_api(cell):
    """Pins the documented holes: if someone adds the parameter, this fails
    and the matrix (plus UNSUPPORTED) must be updated with a real run-cell."""
    par, cond = cell
    assert par == "seq"
    convert_params = inspect.signature(seq_parallel_vqvae_convert).parameters
    sample_params = inspect.signature(seq_parallel_sample).parameters
    if cond == "cfg":
        for p in ("label_scale", "vq_scale"):
            assert p not in convert_params and p not in sample_params
    elif cond == "enc_pred":
        for p in ("enc_pred", "enc_pred_scale"):
            assert p not in convert_params and p not in sample_params
    else:
        assert cond == "class_guided"
        assert "cond_fn" not in convert_params
        assert "cond_fn" not in sample_params


@pytest.mark.slow
@pytest.mark.parametrize("surface", ("decode", "cfg", "seq"))
def test_unknown_sampler_rejected_everywhere(zoo, surface):
    """Every sampler dispatch surface fails loudly on a typo'd sampler
    instead of silently falling back to ddpm."""
    key = jax.random.key(0)
    with pytest.raises(AssertionError):
        if surface == "decode":
            zoo["model"].decode(
                zoo["vq_vars"], zoo["codes"][:1], key,
                labels=zoo["labels"][:1], steps=2, sampler="euler",
            )
        elif surface == "cfg":
            zoo["model"].decode_uncond_guidance(
                zoo["vq_vars"], zoo["codes"][:1], key,
                labels=zoo["labels"][:1], steps=2, sampler="euler",
            )
        else:
            mesh = create_seq_mesh()
            x1 = jax.device_put(
                zoo["x_T"][:1], NamedSharding(mesh, P(None, SEQ_AXIS, None))
            )
            seq_parallel_sample(
                mesh, zoo["diffusion"], zoo["pred"],
                zoo["pred_vars"]["params"], x1, steps=2, rng=key,
                sampler="euler",
            )
