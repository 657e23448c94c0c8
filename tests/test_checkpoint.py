"""Tests for the self-describing checkpoint format and model wrappers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_voice_swap_tpu.checkpoint import (
    copy_intersection,
    load_checkpoint,
    save_checkpoint,
    tree_size,
)
from vq_voice_swap_tpu.diffusion_model import (
    DiffusionModel,
    add_labels_to_params,
    label_param_paths,
)
from vq_voice_swap_tpu.model_base import ModelBase


def test_save_load_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "ckpt.npz")
    variables = {
        "params": {"a": np.ones((2, 3), np.float32),
                   "b": {"c": np.arange(4, dtype=np.int32)}},
        "buffers": {"u": np.zeros(5, np.int32)},
    }
    save_checkpoint(path, "Test", {"x": 1, "y": "z"}, variables)
    cls, kwargs, loaded, extra = load_checkpoint(path)
    assert cls == "Test" and kwargs == {"x": 1, "y": "z"} and extra == {}
    np.testing.assert_array_equal(loaded["params"]["a"], variables["params"]["a"])
    np.testing.assert_array_equal(
        loaded["params"]["b"]["c"], variables["params"]["b"]["c"]
    )
    np.testing.assert_array_equal(loaded["buffers"]["u"], variables["buffers"]["u"])


def test_orbax_roundtrip(tmp_path):
    from vq_voice_swap_tpu.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    variables = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "buffers": {"u": np.ones(4, np.int32)},
    }
    path = os.path.join(tmp_path, "ckpt_dir")
    save_checkpoint_orbax(path, "Test", {"a": 1}, variables)
    cls, kwargs, loaded, _ = load_checkpoint_orbax(path)
    assert cls == "Test" and kwargs == {"a": 1}
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["w"]), variables["params"]["w"]
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["buffers"]["u"]), variables["buffers"]["u"]
    )


def test_copy_intersection():
    dst = {"a": np.zeros((2,)), "b": {"c": np.zeros((3,))}, "d": np.zeros(1)}
    src = {"a": np.ones((2,)), "b": {"c": np.ones((3,))}, "e": np.ones(9)}
    out, n = copy_intersection(dst, src)
    assert n == 5
    np.testing.assert_array_equal(np.asarray(out["a"]), 1)
    np.testing.assert_array_equal(np.asarray(out["b"]["c"]), 1)
    np.testing.assert_array_equal(np.asarray(out["d"]), 0)

    bad_src = {"a": np.ones((3,))}
    with pytest.raises(ValueError):
        copy_intersection(dst, bad_src)


def test_tree_size():
    assert tree_size({"a": np.zeros((2, 3)), "b": np.zeros(4)}) == 10


def _tiny_dm(**kw):
    return DiffusionModel(
        pred_name="wavegrad", base_channels=2, num_labels=3, **kw
    )


@pytest.mark.slow
def test_diffusion_model_save_load(tmp_path):
    model = _tiny_dm()
    variables = model.init_variables(jax.random.key(0), seq_len=128)
    path = os.path.join(tmp_path, "model.npz")
    model.save(path, variables)

    loaded_model, loaded_vars = DiffusionModel.load(path)
    assert loaded_model.pred_name == "wavegrad"
    assert loaded_model.num_labels == 3
    assert tree_size(loaded_vars) == tree_size(variables)

    # ModelBase.load dispatches on the stored class name.
    any_model, _ = ModelBase.load(path)
    assert isinstance(any_model, DiffusionModel)


@pytest.mark.slow
def test_label_surgery():
    model = _tiny_dm()
    variables = model.init_variables(jax.random.key(0), seq_len=128)
    paths = label_param_paths(variables["params"]["predictor"])
    # WaveGrad has a label_emb in each of 3 FiLM layers x 5 UBlocks.
    assert len(paths) == 15

    new_model, new_vars = model.add_labels(variables, 2)
    assert new_model.num_labels == 5
    from flax import traverse_util

    flat_old = traverse_util.flatten_dict(
        variables["params"]["predictor"], sep="/"
    )
    flat_new = traverse_util.flatten_dict(
        new_vars["params"]["predictor"], sep="/"
    )
    for p in paths:
        old, new = np.asarray(flat_old[p]), np.asarray(flat_new[p])
        assert new.shape[0] == old.shape[0] + 2
        np.testing.assert_array_equal(new[:3], old)  # end=True keeps prefix

    # end=False prepends.
    _, pre_vars = model.add_labels(variables, 1, end=False)
    flat_pre = traverse_util.flatten_dict(
        pre_vars["params"]["predictor"], sep="/"
    )
    for p in paths:
        np.testing.assert_array_equal(
            np.asarray(flat_pre[p])[1:], np.asarray(flat_old[p])
        )


@pytest.mark.slow
def test_load_from_pretrained_partial(tmp_path):
    model = _tiny_dm()
    v1 = model.init_variables(jax.random.key(0), seq_len=128)
    v2 = model.init_variables(jax.random.key(1), seq_len=128)
    merged, n = model.load_from_pretrained(v1, v2)
    assert n == tree_size(v2)
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), merged, v2
    )
    assert all(jax.tree.leaves(chex_equal))


def test_model_load_reads_orbax_directory(tmp_path):
    """ModelBase.load / load_model route directory paths to the Orbax
    backend (regression: they previously fell through to np.load and
    surfaced a misleading npz parse error)."""
    import jax

    from vq_voice_swap_tpu.checkpoint import save_checkpoint_orbax
    from vq_voice_swap_tpu.diffusion_model import DiffusionModel
    from vq_voice_swap_tpu.model_base import load_model

    model = DiffusionModel(pred_name="wavegrad", base_channels=2)
    variables = model.init_variables(jax.random.key(0), seq_len=256)
    path = os.path.join(tmp_path, "ckpt_dir")
    save_checkpoint_orbax(
        path, "DiffusionModel", model.save_kwargs(), variables
    )

    loaded_model, loaded_vars = load_model(path)
    assert isinstance(loaded_model, DiffusionModel)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(loaded_vars)[0]),
        np.asarray(jax.tree.leaves(variables)[0]),
    )


def test_orbax_staged_fallback_after_crash_window(tmp_path):
    """A crash between _commit_staged's two renames leaves <path> missing
    and a COMPLETE <path>.new; loaders must fall back to it (model API
    included) so the checkpoint is never lost."""
    import os as _os

    from vq_voice_swap_tpu.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    variables = {"params": {"w": np.arange(4, dtype=np.float32)}}
    path = os.path.join(tmp_path, "ckpt_dir")
    save_checkpoint_orbax(path, "Test", {"a": 1}, variables)
    # Simulate the crash window: the committed dir was renamed away but
    # the staged replacement never moved in.
    _os.rename(path, path + ".new")

    cls, kwargs, loaded, _ = load_checkpoint_orbax(path)
    assert cls == "Test" and kwargs == {"a": 1}
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["w"]), variables["params"]["w"]
    )


def test_orbax_overwrite_and_extra_meta(tmp_path):
    """Re-saving over an existing Orbax checkpoint must swap atomically (old
    tree replaced, still loadable) and round-trip extra_meta."""
    from vq_voice_swap_tpu.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    path = str(tmp_path / "ckpt")
    v1 = {"params": {"w": np.ones((2, 2), np.float32)}}
    v2 = {"params": {"w": np.full((2, 2), 7.0, np.float32)}}
    save_checkpoint_orbax(path, "M", {"a": 1}, v1)
    save_checkpoint_orbax(path, "M", {"a": 2}, v2, extra_meta={"step": 5})

    cls, kwargs, variables, extra = load_checkpoint_orbax(path)
    assert cls == "M" and kwargs == {"a": 2}
    np.testing.assert_array_equal(variables["params"]["w"], v2["params"]["w"])
    assert extra == {"step": 5}
    # No stray temp dirs left behind.
    leftovers = [p for p in tmp_path.iterdir() if p.name.startswith(".ckpt")]
    assert leftovers == []
