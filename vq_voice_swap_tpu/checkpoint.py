"""Self-describing single-file checkpoints.

Capability parity with the reference's Savable format
(/root/reference/vq_voice_swap/models/base.py:63-134): a checkpoint embeds the
model class name and constructor kwargs next to the weights, so ``load(path)``
can rebuild the model without outside configuration; saves are atomic
(temp file + rename); and partial warm-starts copy the name-intersection of
parameters, erroring on shape mismatches.

Storage is a single ``.npz``: a ``__meta__`` JSON entry plus one array per
leaf, keyed by its "/"-joined tree path within each variable collection
(``params/...``, ``buffers/...``). This keeps checkpoints host-portable and
framework-agnostic; large-model sharded checkpoints can layer Orbax on top
without changing the manifest.
"""

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "save_tree_orbax",
    "load_tree_orbax",
    "flatten_variables",
    "unflatten_variables",
    "copy_intersection",
    "tree_size",
]

_META_KEY = "__meta__"
_FORMAT_VERSION = 1


def flatten_variables(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Nested variable collections -> {"collection/a/b": array} dict."""
    flat = traverse_util.flatten_dict(variables, sep="/")
    return {k: np.asarray(v) for k, v in flat.items()}


def unflatten_variables(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return traverse_util.unflatten_dict(dict(flat), sep="/")


def save_checkpoint(
    path: str,
    class_name: str,
    kwargs: Dict[str, Any],
    variables: Dict[str, Any],
    extra_meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomically write a self-describing checkpoint."""
    meta = {
        "format": _FORMAT_VERSION,
        "class": class_name,
        "kwargs": kwargs,
    }
    if extra_meta:
        meta["extra"] = extra_meta
    arrays = flatten_variables(variables)
    dirname = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            # Stream straight into the temp file: an intermediate BytesIO
            # would hold a second full copy of a multi-GB checkpoint.
            np.savez(f, **{_META_KEY: np.asarray(json.dumps(meta)), **arrays})
            f.flush()
            os.fsync(f.fileno())  # no truncated file at `path` on power loss
        # mkstemp creates 0600 regardless of umask; match normal file perms
        # so other-uid eval/serving jobs can keep reading the path.
        os.chmod(tmp, 0o644)
        os.rename(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(
    path: str,
) -> Tuple[str, Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Load a checkpoint -> (class_name, kwargs, variables, extra_meta)."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data[_META_KEY]))
        flat = {k: data[k] for k in data.files if k != _META_KEY}
    variables = unflatten_variables(flat)
    return meta["class"], meta["kwargs"], variables, meta.get("extra", {})


def save_checkpoint_orbax(
    path: str,
    class_name: str,
    kwargs: Dict[str, Any],
    variables: Dict[str, Any],
    extra_meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Directory-format checkpoint via Orbax, for sharded/multi-host scale.

    Same self-describing manifest as the npz format (a manifest.json next to
    the Orbax tree), so either backend can rebuild the model. The save is
    COLLECTIVE on multi-host runs: every process writes its own shards —
    no host-side gather.

    Crash-safe at every point via the ``.new`` staging protocol (see
    _commit_staged): the previous checkpoint stays intact until the new
    one is fully committed, and loaders fall back to a complete ``.new``
    dir if a crash hit the final swap window.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta = {"format": _FORMAT_VERSION, "class": class_name, "kwargs": kwargs}
    if extra_meta:
        meta["extra"] = extra_meta

    new = path + ".new"
    _primary_rm_and_barrier(new, "ckpt_stage")
    ckptr = ocp.StandardCheckpointer()
    # Orbax commits new/variables atomically (its own tmp+rename), so the
    # manifest inside `new` is only readable next to a complete tree.
    ckptr.save(os.path.join(new, "variables"), variables)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        tmp_manifest = os.path.join(new, ".manifest.tmp")
        with open(tmp_manifest, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_manifest, os.path.join(new, "manifest.json"))
    _barrier("ckpt_staged")
    if jax.process_index() == 0:
        _commit_staged(path)
    _barrier("ckpt_committed")


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _primary_rm_and_barrier(path: str, tag: str) -> None:
    import shutil

    if jax.process_index() == 0:
        shutil.rmtree(path, ignore_errors=True)
    _barrier(tag)


def _commit_staged(path: str) -> None:
    """Swap ``path.new`` over ``path``. Crash analysis: before the first
    rename the old checkpoint is intact; between the renames ``path`` is
    missing but ``path.new`` is complete (loaders fall back to it); after,
    the new checkpoint is live. ``path.old`` is transient cleanup state."""
    import shutil

    old = path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(path + ".new", path)
    shutil.rmtree(old, ignore_errors=True)


def staged_fallback(path: str) -> str:
    """The committed checkpoint dir, or its complete ``.new`` staging dir
    when a crash hit the swap window of _commit_staged."""
    if not os.path.exists(path) and os.path.isdir(path + ".new"):
        return path + ".new"
    return path


def load_checkpoint_orbax(
    path: str,
) -> Tuple[str, Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    path = staged_fallback(os.path.abspath(path))
    with open(os.path.join(path, "manifest.json")) as f:
        meta = json.load(f)
    variables = load_tree_orbax(os.path.join(path, "variables"))
    return meta["class"], meta["kwargs"], variables, meta.get("extra", {})


def save_tree_orbax(path: str, tree: Any) -> None:
    """Write one pytree of (possibly sharded, multi-host) arrays via
    Orbax — each process writes its own shards, no host-side gather.
    Collective: every process must call this with the same path.
    Crash-atomic via the same ``.new`` staging protocol as
    save_checkpoint_orbax (a kill mid-save can never lose the previous
    tree AND the new one)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    _primary_rm_and_barrier(path + ".new", "tree_stage")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path + ".new", tree)
    ckptr.wait_until_finished()
    _barrier("tree_saved")
    if jax.process_index() == 0:
        _commit_staged(path)
    _barrier("tree_committed")


def load_tree_orbax(path: str, target: Any = None) -> Any:
    """Restore a pytree written by save_tree_orbax; with a ``target``
    template the result matches its structure (and shardings, when the
    template leaves are sharded jax.Arrays).

    Without a target, a plain restore preserves the saved shardings —
    right for same-topology resume. When the saved devices are absent
    (train on a pod, sample/eval on one chip), that restore fails; fall
    back to a metadata-derived target placed on the current default
    device, which is what the serving path wants.
    """
    import orbax.checkpoint as ocp

    path = staged_fallback(os.path.abspath(path))
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target)
    try:
        return ckptr.restore(path)
    except Exception:
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        md = ckptr.metadata(path).item_metadata.tree
        tgt = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(
                tuple(m.shape), m.dtype, sharding=sharding
            ),
            md,
            is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"),
        )
        return ckptr.restore(path, tgt)


def copy_intersection(
    dst: Dict[str, Any], src: Dict[str, Any], strict_shapes: bool = True
) -> Tuple[Dict[str, Any], int]:
    """Copy src leaves into dst wherever paths match (pretrained warm start).

    Returns (new_dst, number_of_scalar_params_copied). Raises on shape
    mismatch when strict_shapes (reference base.py:106-127 semantics).
    """
    dst_flat = traverse_util.flatten_dict(dst, sep="/")
    src_flat = traverse_util.flatten_dict(src, sep="/")
    total = 0
    out = dict(dst_flat)
    for name, value in dst_flat.items():
        if name in src_flat:
            s = src_flat[name]
            if tuple(np.shape(s)) != tuple(np.shape(value)):
                if strict_shapes:
                    raise ValueError(
                        f"parameter {name} has shape {np.shape(value)} in "
                        f"destination but {np.shape(s)} in source"
                    )
                continue
            out[name] = jnp.asarray(s, dtype=jnp.asarray(value).dtype)
            total += int(np.prod(np.shape(s)))
    return traverse_util.unflatten_dict(out, sep="/"), total


def tree_size(tree: Any) -> int:
    """Total number of scalars in a pytree."""
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))
