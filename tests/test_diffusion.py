"""Numerical unit tests for the diffusion core.

Verified against closed-form identities and an independent numpy
re-derivation of the DDPM update (not against reference code).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_voice_swap_tpu.diffusion import (
    CosSchedule,
    Diffusion,
    ExpSchedule,
    broadcast_to_batch,
    make_schedule,
    make_warp,
)


def test_schedule_endpoints():
    exp = ExpSchedule()
    assert np.isclose(float(exp(jnp.asarray(0.0))), 1.0)
    assert np.isclose(float(exp(jnp.asarray(1.0))), 1e-5, rtol=1e-5)
    cos = CosSchedule()
    assert np.isclose(float(cos(jnp.asarray(0.0))), 1.0)
    assert np.isclose(float(cos(jnp.asarray(1.0))), 0.0, atol=1e-12)


def test_make_schedule():
    assert isinstance(make_schedule("exp"), ExpSchedule)
    assert isinstance(make_schedule("cos"), CosSchedule)
    with pytest.raises(ValueError):
        make_schedule("nope")


@pytest.mark.parametrize("sched", ["exp", "cos"])
def test_eps_x0_roundtrip(sched):
    diff = Diffusion(make_schedule(sched))
    rng = jax.random.key(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (4, 128, 1))
    eps = jax.random.normal(k2, (4, 128, 1))
    ts = jax.random.uniform(k3, (4,), minval=0.05, maxval=0.95)

    x_t = diff.sample_q(x0, ts, epsilon=eps)
    # Given the true epsilon, eps_to_x0 must recover x0 exactly.
    x0_rec = diff.eps_to_x0(x_t, ts, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    # And x0_to_eps must recover epsilon.
    eps_rec = diff.x0_to_eps(x_t, ts, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), atol=1e-4)


def test_sample_q_formula():
    """sample_q should equal sqrt(a)x0 + sqrt(1-a)eps with a from the schedule."""
    diff = Diffusion(ExpSchedule())
    x0 = jnp.ones((2, 8))
    eps = jnp.full((2, 8), 0.5)
    ts = jnp.asarray([0.3, 0.7])
    got = np.asarray(diff.sample_q(x0, ts, epsilon=eps))
    a = np.exp(np.log(1e-5) * np.asarray([0.3, 0.7]) ** 2)
    want = np.sqrt(a)[:, None] * 1.0 + np.sqrt(1 - a)[:, None] * 0.5
    np.testing.assert_allclose(got, np.broadcast_to(want, got.shape), rtol=1e-5)


def _numpy_ddpm_previous(alpha_fn, x_t, ts, step, eps_pred, noise, sigma_large):
    """Independent numpy re-derivation of the ancestral update."""
    a_t = alpha_fn(ts)[:, None]
    a_prev = alpha_fn(ts - step)[:, None]
    a = a_t / a_prev
    b = 1 - a
    mean = (1 / np.sqrt(a)) * (x_t - b / np.sqrt(1 - a_t) * eps_pred)
    if sigma_large:
        sig = b
    else:
        sig = b * (1 - a_prev) / (1 - a_t)
    return mean + np.sqrt(sig) * noise


@pytest.mark.parametrize("sigma_large", [False, True])
def test_ddpm_previous_matches_numpy(sigma_large):
    diff = Diffusion(ExpSchedule())
    rng = np.random.RandomState(0)
    x_t = rng.randn(3, 16).astype(np.float32)
    eps = rng.randn(3, 16).astype(np.float32)
    noise = rng.randn(3, 16).astype(np.float32)
    ts = np.asarray([0.9, 0.5, 0.2], dtype=np.float32)
    step = 0.1

    got = diff.ddpm_previous(
        jnp.asarray(x_t),
        jnp.asarray(ts),
        jnp.asarray(step),
        jnp.asarray(eps),
        jnp.asarray(noise),
        sigma_large=sigma_large,
    )
    alpha_fn = lambda t: np.exp(np.log(1e-5) * t**2)
    want = _numpy_ddpm_previous(alpha_fn, x_t, ts, step, eps, noise, sigma_large)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_constrain_recentres_and_clamps():
    diff = Diffusion(ExpSchedule())
    # Large x_t with zero eps prediction -> x0 prediction is huge; constrain
    # must recentre (zero mean) and clamp to [-1, 1].
    x_t = jnp.asarray(np.linspace(-50, 50, 32, dtype=np.float32))[None, :]
    ts = jnp.asarray([0.5])
    eps = jnp.zeros_like(x_t)
    noise = jnp.zeros_like(x_t)
    out = diff.ddpm_previous(
        x_t, ts, jnp.asarray(0.01), eps, noise, constrain=True
    )
    # Recover the implied x0 at the *previous* timestep from the output mean.
    # Just sanity-check the output is finite and bounded by the clamp effect.
    assert np.all(np.isfinite(np.asarray(out)))
    a_prev = float(ExpSchedule()(jnp.asarray(0.49)))
    assert np.abs(np.asarray(out)).max() < 50.0  # clamped far below raw x_t scale


def test_cond_fn_shifts_mean():
    diff = Diffusion(ExpSchedule())
    x_t = jnp.ones((2, 8))
    ts = jnp.asarray([0.5, 0.5])
    eps = jnp.zeros_like(x_t)
    noise = jnp.zeros_like(x_t)
    base = diff.ddpm_previous(x_t, ts, jnp.asarray(0.1), eps, noise)
    shift = diff.ddpm_previous(
        x_t, ts, jnp.asarray(0.1), eps, noise,
        cond_fn=lambda mean, t: jnp.ones_like(mean),
    )
    # Guidance adds sigma^2-scaled gradient to the mean: strictly larger.
    assert np.all(np.asarray(shift) > np.asarray(base))


def test_ddpm_sample_zero_predictor_statistics():
    """With a perfect eps-predictor for x0=0 data (eps_hat = x_t/sqrt(1-a)),
    sampling must converge near zero."""
    diff = Diffusion(ExpSchedule())

    def predictor(x_t, ts):
        a = diff.schedule(ts)[:, None]
        return x_t / jnp.sqrt(1 - a)

    rng = jax.random.key(3)
    x_T = jax.random.normal(jax.random.key(4), (4, 256))
    out = diff.ddpm_sample(x_T, predictor, steps=50, rng=rng)
    assert np.abs(np.asarray(out)).mean() < 0.1


def test_ddpm_sample_warp_identity_equivalence():
    diff = Diffusion(CosSchedule())

    def predictor(x_t, ts):
        return 0.1 * x_t

    x_T = jax.random.normal(jax.random.key(5), (2, 64))
    rng = jax.random.key(6)
    a = diff.ddpm_sample(x_T, predictor, steps=10, rng=rng)
    b = diff.ddpm_sample(x_T, predictor, steps=10, rng=rng, warp=lambda t: t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_ddpm_sample_jits():
    diff = Diffusion(ExpSchedule())

    @jax.jit
    def run(x_T, rng):
        return diff.ddpm_sample(
            x_T, lambda x, t: 0.5 * x, steps=8, rng=rng, constrain=True
        )

    out = run(jnp.ones((2, 32)), jax.random.key(0))
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddpm_losses_shapes_and_perfect_predictor():
    diff = Diffusion(ExpSchedule())
    x = jax.random.normal(jax.random.key(1), (6, 100))

    # A predictor that returns the true noise would give zero loss; we can't
    # close over the noise, so instead check a fixed ts/noise path.
    ts = jnp.full((6,), 0.5)
    noise = jax.random.normal(jax.random.key(2), (6, 100))
    losses = diff.ddpm_losses(
        x, lambda s, t: noise, ts=ts, noise=noise
    )
    assert losses.shape == (6,)
    np.testing.assert_allclose(np.asarray(losses), 0.0, atol=1e-10)

    losses2 = diff.ddpm_losses(x, lambda s, t: jnp.zeros_like(s), rng=jax.random.key(7))
    assert losses2.shape == (6,)
    assert np.all(np.asarray(losses2) > 0)


def test_make_warp():
    assert make_warp(None) is None
    assert make_warp("linear") is None
    q = make_warp("quadratic")
    np.testing.assert_allclose(float(q(jnp.asarray(0.5))), 0.25)
    p = make_warp("pow:3")
    np.testing.assert_allclose(float(p(jnp.asarray(2.0))), 8.0)
    with pytest.raises(ValueError):
        make_warp("exp(t)")


def test_ddim_perfect_predictor_recovers_x0():
    """DDIM with the exact eps for a FIXED x0 recovers that x0 exactly at
    every step count (the deterministic update is exact when eps is exact)."""
    diff = Diffusion(ExpSchedule())
    x0 = jnp.asarray(np.random.RandomState(0).randn(3, 128), jnp.float32)
    eps_T = jnp.asarray(np.random.RandomState(1).randn(3, 128), jnp.float32)
    x_T = diff.sample_q(x0, jnp.ones((3,)), eps_T)

    def predictor(x_t, ts):
        return diff.x0_to_eps(x_t, ts, x0)

    for steps in (2, 5, 50):
        out = diff.ddim_sample(x_T, predictor, steps=steps)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x0), atol=2e-3, rtol=1e-3
        )


def test_ddim_deterministic_no_rng():
    diff = Diffusion(CosSchedule())
    x_T = jax.random.normal(jax.random.key(7), (2, 64))
    a = diff.ddim_sample(x_T, lambda x, t: 0.1 * x, steps=10)
    b = diff.ddim_sample(x_T, lambda x, t: 0.1 * x, steps=10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        diff.ddim_sample(x_T, lambda x, t: 0.1 * x, steps=10, eta=0.5)


def test_dpmpp_perfect_predictor_recovers_x0():
    """DPM-Solver++(2M) with the exact eps for a FIXED x0 recovers that x0
    at every step count: the data prediction is constant along the
    trajectory, so both the first- and second-order updates are exact."""
    diff = Diffusion(ExpSchedule())
    x0 = jnp.asarray(np.random.RandomState(0).randn(3, 128), jnp.float32)
    eps_T = jnp.asarray(np.random.RandomState(1).randn(3, 128), jnp.float32)
    x_T = diff.sample_q(x0, jnp.ones((3,)), eps_T)

    def predictor(x_t, ts):
        return diff.x0_to_eps(x_t, ts, x0)

    for steps in (1, 2, 5, 50):
        out = diff.dpmpp_sample(x_T, predictor, steps=steps)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x0), atol=2e-3, rtol=1e-3
        )


def test_dpmpp_matches_ddim_for_constant_eps():
    """For a predictor whose eps is CONSTANT (independent of x and t), the
    probability-flow trajectory has a time-invariant x0 prediction, so the
    DPM++ multistep update reduces algebraically to the DDIM update —
    sample-for-sample, at any step count."""
    diff = Diffusion(CosSchedule())
    e = jnp.asarray(np.random.RandomState(3).randn(2, 64), jnp.float32)
    x_T = jnp.asarray(np.random.RandomState(4).randn(2, 64), jnp.float32)
    predictor = lambda x, t: jnp.broadcast_to(e, x.shape)  # noqa: E731
    for steps in (3, 10):
        want = diff.ddim_sample(x_T, predictor, steps=steps)
        got = diff.dpmpp_sample(x_T, predictor, steps=steps)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )


def test_dpmpp_higher_order_converges_faster_than_ddim():
    """The selling point: against a (nonlinear, smooth) predictor, DPM++ at
    few steps lands closer to the fine-grained ODE solution than DDIM at
    the same step count."""
    diff = Diffusion(ExpSchedule())
    w = jnp.asarray(np.random.RandomState(5).randn(32, 32) * 0.2,
                    jnp.float32)

    def predictor(x, ts):
        t = broadcast_to_batch(ts, x)
        return jnp.tanh(x @ w) * (0.5 + t)

    x_T = jnp.asarray(np.random.RandomState(6).randn(4, 32), jnp.float32)
    ref = np.asarray(diff.ddim_sample(x_T, predictor, steps=512))
    for steps in (4, 8, 16):
        err_ddim = np.max(np.abs(
            np.asarray(diff.ddim_sample(x_T, predictor, steps=steps)) - ref
        ))
        err_dpmpp = np.max(np.abs(
            np.asarray(diff.dpmpp_sample(x_T, predictor, steps=steps)) - ref
        ))
        assert err_dpmpp < err_ddim, (
            f"steps={steps}: dpmpp {err_dpmpp} not better than "
            f"ddim {err_ddim}"
        )


def test_dpmpp_warp_constrain_and_jit():
    diff = Diffusion(ExpSchedule())
    warp = make_warp("quadratic")

    @jax.jit
    def run(x_T):
        return diff.dpmpp_sample(
            x_T, lambda x, t: 0.5 * x, steps=8, constrain=True, warp=warp,
        )

    out = run(jnp.ones((2, 32)))
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))
    # Deterministic: rng is ignored.
    out2 = diff.dpmpp_sample(
        jnp.ones((2, 32)), lambda x, t: 0.5 * x, steps=8, constrain=True,
        warp=warp, rng=jax.random.key(9),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_ddim_eta1_matches_ancestral_small_sigma():
    """At eta=1 the DDIM variance equals the ancestral small-sigma variance,
    so a single step from the same state/noise matches ddpm_previous."""
    diff = Diffusion(ExpSchedule())
    rng = np.random.RandomState(2)
    x_t = jnp.asarray(rng.randn(2, 64), jnp.float32)
    eps = jnp.asarray(rng.randn(2, 64), jnp.float32)
    noise = jnp.asarray(rng.randn(2, 64), jnp.float32)
    ts = jnp.full((2,), 0.6, jnp.float32)
    step = jnp.asarray(0.1, jnp.float32)

    want = diff.ddpm_previous(x_t, ts, step, eps, noise, sigma_large=False)
    got = diff.ddim_previous(x_t, ts, step, eps, noise, eta=1.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_ddim_warp_and_jit():
    diff = Diffusion(ExpSchedule())
    warp = make_warp("quadratic")

    @jax.jit
    def run(x_T, rng):
        return diff.ddim_sample(
            x_T, lambda x, t: 0.5 * x, steps=8, rng=rng, eta=0.3,
            constrain=True, warp=warp,
        )

    out = run(jnp.ones((2, 32)), jax.random.key(0))
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))
