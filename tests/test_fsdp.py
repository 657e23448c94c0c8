"""FSDP (ZeRO-3 storage sharding) numerical equivalence + memory scaling.

GSPMD computes the same function for any storage annotation; these tests
pin that down empirically (forward + full train step vs single device)
and assert the point of FSDP — that per-device parameter/optimizer shards
actually shrink 1/N — plus the CLI surface (--fsdp, alone and composed
with --tensor-parallel).
"""

import jax
import numpy as np
import pytest

from vq_voice_swap_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    create_mesh_2d,
    fsdp_shardings,
    shard_batch,
    shard_state_fsdp,
)
from vq_voice_swap_tpu.train import TrainState, build_optimizer, make_train_step
from vq_voice_swap_tpu.train.ema import build_rate_tree

import jax.numpy as jnp

SEQ = 256


def _model_and_vars(seed=0):
    from vq_voice_swap_tpu.diffusion_model import DiffusionModel

    model = DiffusionModel(pred_name="wavegrad", base_channels=8,
                           num_labels=3)
    variables = model.init_variables(jax.random.key(seed), seq_len=SEQ)
    return model, variables


def test_fsdp_shardings_heuristic():
    mesh = create_mesh(8)
    params = {
        # largest divisible axis (16) gets the data axis
        "conv": {"kernel": jnp.zeros((3, 16, 8)), "bias": jnp.zeros((8,))},
        "odd": jnp.zeros((5, 6)),  # nothing divides 8 -> replicated
        "vq": {"dictionary": jnp.zeros((16, 8))},  # name-excluded
        "scalar": jnp.zeros(()),
    }
    shardings = fsdp_shardings(mesh, params)
    assert shardings["conv"]["kernel"].spec == (None, DATA_AXIS, None)
    assert shardings["conv"]["bias"].spec == (DATA_AXIS,)
    assert shardings["odd"].spec == ()
    assert shardings["vq"]["dictionary"].spec == ()
    assert shardings["scalar"].spec == ()


def test_fsdp_shardings_compose_with_model_axis():
    mesh = create_mesh_2d(2)  # 4 data x 2 model
    params = {"w": jnp.zeros((12, 8)), "b": jnp.zeros((8,))}
    shardings = fsdp_shardings(mesh, params)
    # Last axis reserved for the model axis; FSDP takes the other.
    assert shardings["w"].spec == (DATA_AXIS, MODEL_AXIS)
    # 1-D leaf: model axis wins the only axis, no FSDP axis left
    # (8 % 2 == 0 -> MODEL_AXIS on the last dim).
    assert shardings["b"].spec == (MODEL_AXIS,)


@pytest.mark.slow
@pytest.mark.parametrize("tensor_parallel", [1, 2])
def test_fsdp_train_step_matches_single_device(tensor_parallel):
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

    if tensor_parallel > 1:
        mesh = create_mesh_2d(tensor_parallel)
    else:
        mesh = create_mesh()
    fs_state = shard_state_fsdp(mesh, make_state(), tx)

    # The point of ZeRO: per-device param + Adam-moment storage shrinks.
    # Every data-sharded leaf stores 1/dp per device, and the bulk of the
    # state (>= half the total bytes, params AND Adam moments) is sharded.
    dp = mesh.shape[DATA_AXIS]
    for tree in (fs_state.params, fs_state.opt_state):
        total = sharded = 0
        for leaf in jax.tree.leaves(tree):
            if not hasattr(leaf, "sharding") or leaf.ndim == 0:
                continue
            total += leaf.size
            shard = leaf.addressable_shards[0].data
            if DATA_AXIS in leaf.sharding.spec:
                assert shard.size <= leaf.size // dp, (
                    f"leaf {leaf.shape} not 1/dp-sharded: {shard.shape}"
                )
            if shard.size < leaf.size:
                sharded += leaf.size
        assert sharded >= total // 2, (
            f"only {sharded}/{total} elements sharded"
        )

    step_fs = make_train_step(loss_fn, tx, ema_rate_trees=rate_trees,
                              donate=False)
    fs_result, fs_metrics = step_fs(
        fs_state, shard_batch(mesh, host_batch), key, None
    )

    np.testing.assert_allclose(
        float(fs_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(fs_result.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
    for a, b in zip(jax.tree.leaves(fs_result.emas["0.99"]),
                    jax.tree.leaves(ref_state.emas["0.99"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


@pytest.mark.slow
def test_train_loop_fsdp_e2e(tmp_path, monkeypatch):
    """The CLI surface: --fsdp on the 8-device virtual mesh trains, saves
    (gather through np.asarray), and resumes."""
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
            "--fsdp",
            "--output-dir", str(tmp_path),
            "--class-cond",
            "tones",
        ]
    )
    loop = DiffusionTrainLoop(args)
    assert loop.fsdp
    loop.loop(max_steps=2)
    assert os.path.exists(os.path.join(tmp_path, "model.npz"))

    loop2 = DiffusionTrainLoop(args)
    assert loop2.logger.start_step == 2
    loop2.loop(max_steps=1)
    log = open(os.path.join(tmp_path, "train_log.txt")).read()
    assert "step 3:" in log
