"""Tests for vector quantization: nearest-neighbor correctness,
straight-through gradients, usage tracking, revival, and losses."""

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.vq import (
    VQLossConfig,
    embedding_distances,
    init_vq_params,
    nearest_codes,
    revive_dead_codes,
    update_usage,
    vq_forward,
    vq_loss_fn,
)


def test_embedding_distances_matches_naive():
    rng = np.random.RandomState(0)
    d = rng.randn(7, 5).astype(np.float32)
    x = rng.randn(11, 5).astype(np.float32)
    got = np.asarray(embedding_distances(jnp.asarray(d), jnp.asarray(x)))
    naive = ((x[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-4)


def test_nearest_codes_exact_match():
    d = jnp.asarray(np.eye(4, dtype=np.float32) * 3)
    x = jnp.asarray([[0, 3.1, 0, 0], [2.9, 0, 0, 0]], dtype=jnp.float32)
    idxs, _ = nearest_codes(d, x)
    np.testing.assert_array_equal(np.asarray(idxs), [1, 0])


def test_vq_forward_outputs_and_straight_through():
    rng = jax.random.key(0)
    dictionary = init_vq_params(rng, 8, 4)
    x = jax.random.normal(jax.random.key(1), (2, 6, 4))

    out = vq_forward(dictionary, x)
    assert out["idxs"].shape == (2, 6)
    assert out["embedded"].shape == x.shape
    # passthrough VALUE equals embedded.
    np.testing.assert_allclose(
        np.asarray(out["passthrough"]), np.asarray(out["embedded"]), rtol=1e-6
    )

    # passthrough GRADIENT flows to x (identity), not the dictionary.
    def f_x(xx):
        return jnp.sum(vq_forward(dictionary, xx)["passthrough"] * 2.0)

    gx = jax.grad(f_x)(x)
    np.testing.assert_allclose(np.asarray(gx), 2.0)

    def f_d(dd):
        return jnp.sum(vq_forward(dd, x)["passthrough"])

    gd = jax.grad(f_d)(dictionary)
    np.testing.assert_allclose(np.asarray(gd), 0.0)

    # "embedded" gradient flows to the dictionary.
    def f_d2(dd):
        return jnp.sum(vq_forward(dd, x)["embedded"])

    gd2 = jax.grad(f_d2)(dictionary)
    assert np.abs(np.asarray(gd2)).sum() > 0


def test_update_usage_semantics():
    usage = jnp.asarray([5, 0, 3, 10], dtype=jnp.int32)
    idxs = jnp.asarray([[0, 0], [3, 0]])
    new = np.asarray(update_usage(usage, idxs, dead_rate=10))
    # Used codes (0, 3) reset to dead_rate; others decay by 1 (floor 0).
    np.testing.assert_array_equal(new, [10, 0, 2, 10])


def test_revive_dead_codes():
    rng = jax.random.key(0)
    dictionary = jnp.asarray(
        [[0.0, 0.0], [100.0, 100.0], [0.1, 0.1]], dtype=jnp.float32
    )
    usage = jnp.asarray([5, 0, 5], dtype=jnp.int32)  # code 1 is dead
    batch = jnp.asarray([[1.0, 1.0], [2.0, 2.0]], dtype=jnp.float32)
    new_dict, new_usage = revive_dead_codes(rng, dictionary, usage, batch, 7)
    nd = np.asarray(new_dict)
    # Live codes unchanged.
    np.testing.assert_allclose(nd[0], [0.0, 0.0])
    np.testing.assert_allclose(nd[2], [0.1, 0.1])
    # Dead code replaced by one of the batch vectors.
    assert any(np.allclose(nd[1], b) for b in [[1, 1], [2, 2]])
    np.testing.assert_array_equal(np.asarray(new_usage), [5, 7, 5])


def test_revive_is_jittable():
    f = jax.jit(lambda r, d, u, b: revive_dead_codes(r, d, u, b, 3))
    d = jnp.zeros((4, 2))
    u = jnp.asarray([1, 0, 2, 0], dtype=jnp.int32)
    b = jnp.ones((5, 2))
    nd, nu = f(jax.random.key(0), d, u, b)
    assert nd.shape == (4, 2) and nu.shape == (4,)
    np.testing.assert_allclose(np.asarray(nd)[1], [1.0, 1.0])


def test_vq_loss_standard_and_revive():
    cfg = VQLossConfig(commitment=0.25)
    x = jnp.ones((1, 2, 3))
    emb = jnp.zeros((1, 2, 3))
    d = jnp.zeros((4, 3))
    loss = float(vq_loss_fn(cfg, x, emb, d))
    # codebook = mean((1-0)^2) = 1, commitment = 0.25 * 1.
    np.testing.assert_allclose(loss, 1.25, rtol=1e-6)

    cfg_r = VQLossConfig(commitment=0.25, revival=0.5)
    loss_r = float(vq_loss_fn(cfg_r, x, emb, d))
    # revival adds 0.5 * mean dist(dict, x) = 0.5 * 3 (each |1|^2 * 3 ch).
    np.testing.assert_allclose(loss_r, 1.25 + 0.5 * 3.0, rtol=1e-6)

    # Gradient flow: codebook term moves the dictionary rows used.
    def f(dd):
        out = vq_forward(dd, x)
        return vq_loss_fn(cfg, x, out["embedded"], dd)

    g = jax.grad(f)(jnp.asarray(np.random.RandomState(0).randn(4, 3),
                                dtype=jnp.float32))
    assert np.abs(np.asarray(g)).sum() > 0


def test_update_usage_decay_and_used_mask():
    """decay= folds microbatch forwards into one call; used= must agree with
    the scatter-derived mask (the Pallas kernel supplies it in-kernel)."""
    from vq_voice_swap_tpu.vq import update_usage, vq_forward

    usage = jnp.asarray([5, 3, 1, 0], jnp.int32)
    idxs = jnp.asarray([[0, 0]], jnp.int32)  # only code 0 used
    got = np.asarray(update_usage(usage, idxs, dead_rate=8, decay=2))
    np.testing.assert_array_equal(got, [8, 1, 0, 0])

    used = jnp.asarray([True, False, False, False])
    got2 = np.asarray(
        update_usage(usage, idxs, dead_rate=8, decay=2, used=used)
    )
    np.testing.assert_array_equal(got, got2)

    # vq_forward's used output matches its idxs.
    rng = np.random.RandomState(0)
    dictionary = jnp.asarray(rng.randn(8, 4), jnp.float32)
    x = jnp.asarray(rng.randn(2, 16, 4), jnp.float32)
    out = vq_forward(dictionary, x)
    want_used = np.zeros(8, bool)
    want_used[np.asarray(out["idxs"]).reshape(-1)] = True
    np.testing.assert_array_equal(np.asarray(out["used"]), want_used)


def test_codebook_used_metric_is_pre_revival():
    """With revive=True the liveness metric must reflect PRE-revival usage
    (post-revival it is trivially the full dictionary)."""
    import optax

    from vq_voice_swap_tpu.train import make_train_step
    from vq_voice_swap_tpu.train.steps import VQUpdateRule
    from vq_voice_swap_tpu.train.state import TrainState

    D, C = 4, 2
    params = {"vq": {"dictionary": jnp.eye(D, C, dtype=jnp.float32)}}
    # All codes one decay away from dead: any unused code dies this step.
    buffers = {"vq": {"usage_count": jnp.ones((D,), jnp.int32)}}

    def loss_fn(params, buffers, rng, batch, ctx):
        idxs = batch["idxs"]
        return 0.0 * jnp.sum(params["vq"]["dictionary"]), {
            "mses": jnp.zeros((idxs.shape[0],)),
            "ts": jnp.zeros((idxs.shape[0],)),
            "idxs": idxs,
            "enc_flat": jnp.ones((4, C)),
        }

    tx = optax.sgd(0.0)
    step = make_train_step(
        loss_fn, tx, ema_rate_trees={}, microbatches=1,
        vq_rule=VQUpdateRule(dead_rate=5, revive=True),
    )
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params, buffers=buffers,
        opt_state=tx.init(params), emas={},
    )
    batch = {"idxs": jnp.asarray([[0, 1]], jnp.int32)}  # codes 2, 3 unused
    new_state, metrics = step(state, batch, jax.random.key(0), None)
    assert int(metrics["codebook_used"]) == 2
    # Revival still refills the buffer afterwards.
    assert int(jnp.sum(new_state.buffers["vq"]["usage_count"] > 0)) == 4
