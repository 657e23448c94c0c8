"""Tensor-parallel (2-D data x model mesh) numerical equivalence.

GSPMD guarantees the partitioned program computes the same function; these
tests pin that down empirically: a forward pass and a full train step under
a data x model mesh must match the single-device result (same rng;
jax_threefry_partitionable makes random draws layout-invariant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vq_voice_swap_tpu.parallel import (
    MODEL_AXIS,
    batch_sharding,
    create_mesh_2d,
    shard_batch,
    shard_state_tp,
    tp_shardings,
)
from vq_voice_swap_tpu.train import TrainState, build_optimizer, make_train_step
from vq_voice_swap_tpu.train.ema import build_rate_tree

SEQ = 256


def _model_and_vars(seed=0):
    from vq_voice_swap_tpu.diffusion_model import DiffusionModel

    # base_channels=8: every channel count divides the 4-way model axis.
    model = DiffusionModel(pred_name="wavegrad", base_channels=8,
                           num_labels=3)
    variables = model.init_variables(jax.random.key(seed), seq_len=SEQ)
    return model, variables


def test_tp_shardings_heuristic():
    mesh = create_mesh_2d(4)
    params = {
        "conv": {"kernel": jnp.zeros((3, 4, 8)), "bias": jnp.zeros((8,))},
        "odd": jnp.zeros((4, 6)),  # 6 % 4 != 0 -> replicated
        "vq": {"dictionary": jnp.zeros((16, 8))},  # name-excluded
        "scalar": jnp.zeros(()),
    }
    shardings = tp_shardings(mesh, params)
    assert shardings["conv"]["kernel"].spec == (None, None, MODEL_AXIS)
    assert shardings["conv"]["bias"].spec == (MODEL_AXIS,)
    assert shardings["odd"].spec == ()
    assert shardings["vq"]["dictionary"].spec == ()
    assert shardings["scalar"].spec == ()


@pytest.mark.slow
def test_tp_forward_matches_single_device():
    model, variables = _model_and_vars()
    rng = np.random.RandomState(0)
    x = rng.randn(8, SEQ, 1).astype(np.float32)
    ts = np.full((8,), 0.4, np.float32)
    labels = rng.randint(0, 3, 8).astype(np.int32)

    def fwd(variables, x, ts, labels):
        return model.predict_eps(variables, x, ts, labels=labels)

    ref = np.asarray(jax.jit(fwd)(variables, x, ts, labels))

    mesh = create_mesh_2d(4)  # 2 data x 4 model
    pshard = tp_shardings(mesh, variables["params"])
    tp_vars = {"params": jax.tree.map(jax.device_put,
                                      variables["params"], pshard)}
    bshard = batch_sharding(mesh)
    got = np.asarray(
        jax.jit(fwd)(
            tp_vars,
            jax.device_put(jnp.asarray(x), bshard),
            jax.device_put(jnp.asarray(ts), bshard),
            jax.device_put(jnp.asarray(labels), bshard),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_tp_train_step_matches_single_device():
    model, variables = _model_and_vars()
    params = variables["params"]

    def loss_fn(params, buffers, rng, batch, ctx):
        del buffers, ctx
        losses, ts = model.losses(
            {"params": params}, rng, batch["samples"][..., None],
            labels=batch["label"],
        )
        return jnp.mean(losses), {"mses": losses, "ts": ts}

    tx = build_optimizer(params, lr=1e-3)
    rate_trees = {"0.99": build_rate_tree(params, {"": 0.99})}

    def make_state():
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=jax.tree.map(jnp.copy, params),
            buffers={},
            opt_state=tx.init(params),
            emas={"0.99": jax.tree.map(jnp.copy, params)},
        )

    rng = np.random.RandomState(1)
    host_batch = {
        "label": rng.randint(0, 3, 8).astype(np.int32),
        "samples": rng.randn(8, SEQ).astype(np.float32) * 0.1,
    }
    key = jax.random.key(7)

    step_ref = make_train_step(loss_fn, tx, ema_rate_trees=rate_trees,
                               donate=False)
    ref_state, ref_metrics = step_ref(
        make_state(), {k: jnp.asarray(v) for k, v in host_batch.items()},
        key, None,
    )

    mesh = create_mesh_2d(4)
    tp_state = shard_state_tp(mesh, make_state(), tx)
    # Optimizer moments must actually be sharded (memory scales with tp).
    mu_leaf_shardings = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(tp_state.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 1
    ]
    assert any(
        MODEL_AXIS in (s[-1],) for s in mu_leaf_shardings if len(s)
    ), "no optimizer moment ended up model-sharded"

    step_tp = make_train_step(loss_fn, tx, ema_rate_trees=rate_trees,
                              donate=False)
    tp_result, tp_metrics = step_tp(
        tp_state, shard_batch(mesh, host_batch), key, None
    )

    np.testing.assert_allclose(
        float(tp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    flat_ref = jax.tree.leaves(ref_state.params)
    flat_tp = jax.tree.leaves(tp_result.params)
    for a, b in zip(flat_tp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
    # EMA follows params; spot-check one leaf tree.
    for a, b in zip(jax.tree.leaves(tp_result.emas["0.99"]),
                    jax.tree.leaves(ref_state.emas["0.99"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


@pytest.mark.slow
def test_train_loop_tensor_parallel_e2e(tmp_path, monkeypatch):
    """The CLI surface: --tensor-parallel 4 on the 8-device virtual mesh
    (2 data x 4 model) trains, saves, and resumes."""
    import os

    import vq_voice_swap_tpu.train.loops as loops_mod
    from tests.test_train import FakeToneLoader
    from vq_voice_swap_tpu.train import DiffusionTrainLoop

    monkeypatch.setattr(
        loops_mod, "create_data_loader",
        lambda **kw: (FakeToneLoader(kw.get("batch_size", 8)), 3),
    )
    args = DiffusionTrainLoop.arg_parser().parse_args(
        [
            "--predictor", "wavegrad",
            "--base-channels", "8",
            "--batch-size", "8",
            "--save-interval", "2",
            "--tensor-parallel", "4",
            "--output-dir", str(tmp_path),
            "--class-cond",
            "tones",
        ]
    )
    loop = DiffusionTrainLoop(args)
    assert loop.mesh.shape == {"data": 2, "model": 4}
    loop.loop(max_steps=2)
    assert os.path.exists(os.path.join(tmp_path, "model.npz"))

    loop2 = DiffusionTrainLoop(args)
    assert loop2.logger.start_step == 2
    loop2.loop(max_steps=1)
    log = open(os.path.join(tmp_path, "train_log.txt")).read()
    assert "step 3:" in log


@pytest.mark.slow
def test_tp_train_step_with_microbatch_remainder():
    """Weighted microbatch remainders under a 2-D data x model mesh: the
    remainder slice crosses shard boundaries and the partitioner must
    reshard, not fail — and the result still equals the full-batch step."""
    rng = np.random.RandomState(5)
    batch = {
        "x": jnp.asarray(rng.randn(6, 4), jnp.float32),
        "y": jnp.asarray(rng.randn(6, 8), jnp.float32),
    }
    params = {"w": jnp.asarray(rng.randn(4, 8), jnp.float32)}

    def loss_fn(params, buffers, rng, batch, ctx):
        per_ex = jnp.sum((batch["x"] @ params["w"] - batch["y"]) ** 2, -1)
        return jnp.mean(per_ex), {"mses": per_ex,
                                  "ts": jnp.zeros_like(per_ex)}

    tx = optax.sgd(1.0)

    def make_state():
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=jax.tree.map(jnp.copy, params), buffers={},
            opt_state=tx.init(params), emas={},
        )

    full_step = make_train_step(loss_fn, tx, ema_rate_trees={}, donate=False)
    ref_state, _ = full_step(
        make_state(), batch, jax.random.key(0), None
    )

    mesh = create_mesh_2d(4)  # 2 data x 4 model
    tp_state = shard_state_tp(mesh, make_state(), tx)
    rem_step = make_train_step(
        loss_fn, tx, ema_rate_trees={},
        microbatches=1, micro_remainder=2, donate=False,
    )
    tp_result, metrics = rem_step(
        tp_state, shard_batch(mesh, batch), jax.random.key(0), None
    )
    np.testing.assert_allclose(
        np.asarray(tp_result.params["w"]),
        np.asarray(ref_state.params["w"]), rtol=1e-5, atol=1e-6,
    )
    assert metrics["mses"].shape == (6,)
