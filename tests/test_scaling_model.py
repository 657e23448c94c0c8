"""Unit tests for the scaling-model HLO collective parser.

The end-to-end script (scripts/scaling_model.py) compiles the flagship
train step over an 8-device mesh — minutes of CPU compile — so the fast
suite covers the parsing/accounting layer on synthetic HLO lines, plus a
tiny real compile that checks the DP gradient all-reduce volume matches
the model's parameter bytes.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "scaling_model",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "scaling_model.py"),
)
scaling_model = importlib.util.module_from_spec(_SPEC)
sys.modules.setdefault("scaling_model", scaling_model)
_SPEC.loader.exec_module(scaling_model)


def test_shape_bytes_scalar_tuple_and_opaque():
    assert scaling_model._shape_bytes("f32[8,3]{1,0}") == 8 * 3 * 4
    assert (
        scaling_model._shape_bytes("(f32[4]{0}, bf16[2,2]{1,0})")
        == 4 * 4 + 2 * 2 * 2
    )
    # token/opaque types carry no payload
    assert scaling_model._shape_bytes("token[]") == 0


def test_group_size_brace_and_iota_formats():
    assert scaling_model._group_size("replica_groups={{0,2,4,6},{1,3,5,7}}",
                                     8) == 4
    assert scaling_model._group_size("replica_groups=[2,4]<=[8]", 8) == 4
    assert scaling_model._group_size("no groups here", 8) == 8


def test_collect_collectives_ring_model():
    hlo = "\n".join([
        "  %ar = f32[1000]{0} all-reduce(x), replica_groups={{0,1,2,3}}",
        "  %ag = bf16[800]{0} all-gather(y), replica_groups=[1,4]<=[4]",
        "  %cp = f32[100]{0} collective-permute(z)",
        "  %skip = f32[9]{0} add(a, b)",
        "  %deg = f32[50]{0} all-reduce(w), replica_groups={{0},{1}}",
    ])
    out = scaling_model.collect_collectives(hlo, world=4)
    assert out["all-reduce"]["count"] == 1  # degenerate group dropped
    assert out["all-reduce"]["bytes"] == 4000
    np.testing.assert_allclose(
        out["all-reduce"]["seconds"],
        2 * 4000 * 3 / 4 / scaling_model.W_AXIS,
    )
    assert out["all-gather"]["bytes"] == 1600
    np.testing.assert_allclose(
        out["collective-permute"]["seconds"],
        400 / (scaling_model.W_AXIS / 2),
    )
    assert "add" not in out


@pytest.mark.slow
def test_dp_gradient_allreduce_volume_matches_params():
    """A tiny real DP compile: the partitioner's gradient all-reduce must
    move (about) one f32 copy of the gradients — the accounting the
    scaling model is built on."""
    from vq_voice_swap_tpu.parallel import (
        create_mesh,
        global_batch_from_local,
        replicate,
    )

    n = min(4, jax.device_count())
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = create_mesh(num_devices=n)

    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(64)(nn.Dense(128)(x))

    m = M()
    params = m.init(jax.random.key(0), jnp.zeros((1, 32)))["params"]
    params = replicate(mesh, params)
    batch = global_batch_from_local(
        mesh, {"x": np.zeros((n * 2, 32), np.float32)}
    )

    def loss(p, b):
        return jnp.mean(jnp.square(m.apply({"params": p}, b["x"])))

    compiled = (
        jax.jit(jax.grad(loss)).lower(params, batch).compile()
    )
    colls = scaling_model.collect_collectives(compiled.as_text(), n)
    n_param_bytes = 4 * sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(params)
    )
    ar = colls.get("all-reduce", {"bytes": 0})
    # one f32 grad copy, within 10% slack for any fused extras
    assert 0.9 * n_param_bytes <= ar["bytes"] <= 1.5 * n_param_bytes, (
        ar, n_param_bytes,
    )
