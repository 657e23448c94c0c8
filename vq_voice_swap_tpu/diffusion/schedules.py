"""Noise schedules alpha(t) for continuous-time diffusion.

Capability parity with the reference schedules (see
/root/reference/vq_voice_swap/diffusion/schedule.py:15-41): an exponential
schedule alpha(t) = exp(-k t^2) with k = -ln(alpha_final), and the squared
cosine schedule cos(t*pi/2)^2 of https://arxiv.org/abs/2102.09672.

Schedules here are plain callables over jnp arrays so they trace cleanly
under jit/scan; there is no torch-style module state.
"""

import math
from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["Schedule", "ExpSchedule", "CosSchedule", "make_schedule"]


class Schedule:
    """alpha(t) for t in [0, 1]; alpha(0) ~ 1 (clean), alpha(1) ~ 0 (noise)."""

    name: str = "abstract"

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


@dataclass(frozen=True)
class ExpSchedule(Schedule):
    """alpha(t) = exp(-k * t^2), with alpha(1) = alpha_final.

    Nearly equivalent to betas linearly interpolated from a tiny value to a
    larger one (reference schedule.py:15-31).
    """

    alpha_final: float = 1e-5
    name: str = "exp"

    @property
    def k(self) -> float:
        return -math.log(self.alpha_final)

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t)
        return jnp.exp(-self.k * jnp.square(t))


@dataclass(frozen=True)
class CosSchedule(Schedule):
    """alpha(t) = cos(t * pi / 2)^2 (reference schedule.py:34-41)."""

    name: str = "cos"

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        t = jnp.asarray(t)
        return jnp.square(jnp.cos(t * (math.pi / 2)))


_SCHEDULES = {
    "exp": ExpSchedule,
    "cos": CosSchedule,
}


def make_schedule(name: str) -> Schedule:
    """Look up a schedule by name ("exp" | "cos")."""
    if name not in _SCHEDULES:
        raise ValueError(
            f"unknown schedule: {name!r} (available: {sorted(_SCHEDULES)})"
        )
    return _SCHEDULES[name]()
