"""Test helpers.

This box compiles XLA programs with a large fixed per-compile cost, so eager
linen init (which dispatches dozens of tiny op-by-op compiles) is
pathologically slow. Wrapping init/apply in jax.jit turns each test into ONE
compilation.
"""

import jax

__all__ = ["jinit", "japply"]


def jinit(module, rng, *args, **kwargs):
    """jit-wrapped module.init with static kwargs closed over."""
    return jax.jit(lambda r: module.init(r, *args, **kwargs))(rng)


def japply(module, variables, *args, method=None, **kwargs):
    """jit-wrapped module.apply with static kwargs closed over."""
    return jax.jit(
        lambda v: module.apply(v, *args, method=method, **kwargs)
    )(variables)
