"""Named sample-time timestep warps.

The reference lets users pass arbitrary Python lambdas via an eval()'d CLI
flag (``--schedule "lambda t: t**2"``, reference sample_diffusion.py:22,139).
Evaluating user strings is both unsafe and untraceable; here the same
capability is exposed as *named* warps that are pure jnp functions, so they
compile inside the sampling lax.scan. The README's headline t = s**2 recipe is
available as "quadratic" (or "pow:2").
"""

import re
from typing import Callable, Optional

import jax.numpy as jnp

__all__ = ["make_warp"]

TimeWarp = Callable[[jnp.ndarray], jnp.ndarray]

_POW_RE = re.compile(r"^pow:([0-9.]+)$")


def make_warp(name: Optional[str]) -> Optional[TimeWarp]:
    """Build a time warp callable from a name.

    Supported names:
      - None, "", "linear", "identity": no warp (returns None)
      - "quadratic": t -> t**2 (the README t=s^2 eval recipe)
      - "sqrt": t -> sqrt(t)
      - "pow:X": t -> t**X for float X
    """
    if name is None or name in ("", "linear", "identity"):
        return None
    if name == "quadratic":
        return lambda t: jnp.square(t)
    if name == "sqrt":
        return lambda t: jnp.sqrt(t)
    m = _POW_RE.match(name)
    if m:
        try:
            p = float(m.group(1))
        except ValueError:
            m = None  # e.g. "pow:1.2.3" — fall to the descriptive error
        if m:
            return lambda t: jnp.power(t, p)
    raise ValueError(
        f"unknown time warp: {name!r} "
        "(use 'linear', 'quadratic', 'sqrt', or 'pow:X')"
    )
