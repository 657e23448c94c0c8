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
    the Orbax tree), so either backend can rebuild the model. Use this for
    models too large for a single-host npz; Orbax writes each device's
    shards in parallel.

    Crash-safe: the new tree + manifest are written to a sibling temp dir
    and swapped in with renames, so a kill mid-save leaves the previous
    checkpoint intact (a process death between the two renames can lose the
    OLD checkpoint only after the NEW one is fully on disk).
    """
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta = {"format": _FORMAT_VERSION, "class": class_name, "kwargs": kwargs}
    if extra_meta:
        meta["extra"] = extra_meta

    if jax.process_count() > 1:
        # Multi-host: the save is COLLECTIVE (every process writes its own
        # shards), so all hosts must target the SAME final path — the
        # single-host sibling-tmp-dir swap below would have each host
        # invent a different tmp name. Orbax's own tmp+commit protocol
        # makes the variables tree atomic; the manifest lands after the
        # commit (host 0), so a reader that finds a manifest has a
        # complete tree.
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            os.makedirs(path, exist_ok=True)
        multihost_utils.sync_global_devices("ckpt_dir_ready")
        save_tree_orbax(os.path.join(path, "variables"), variables)
        if jax.process_index() == 0:
            tmp_manifest = os.path.join(path, ".manifest.tmp")
            with open(tmp_manifest, "w") as f:
                json.dump(meta, f)
            os.replace(tmp_manifest, os.path.join(path, "manifest.json"))
        multihost_utils.sync_global_devices("ckpt_manifest_done")
        return

    tmp = tempfile.mkdtemp(dir=os.path.dirname(path), prefix=".ckpt_tmp_")
    try:
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(meta, f)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(tmp, "variables"), variables)
        ckptr.wait_until_finished()
        os.chmod(tmp, 0o755)
        if os.path.exists(path):
            old = tempfile.mkdtemp(
                dir=os.path.dirname(path), prefix=".ckpt_old_"
            )
            os.rename(path, os.path.join(old, "prev"))
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, path)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def load_checkpoint_orbax(
    path: str,
) -> Tuple[str, Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    path = os.path.abspath(path)
    with open(os.path.join(path, "manifest.json")) as f:
        meta = json.load(f)
    variables = load_tree_orbax(os.path.join(path, "variables"))
    return meta["class"], meta["kwargs"], variables, meta.get("extra", {})


def save_tree_orbax(path: str, tree: Any) -> None:
    """Write one pytree of (possibly sharded, multi-host) arrays via
    Orbax — each process writes its own shards, no host-side gather.
    Collective: every process must call this with the same path."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_tree_orbax(path: str, target: Any = None) -> Any:
    """Restore a pytree written by save_tree_orbax; with a ``target``
    template the result matches its structure (and shardings, when the
    template leaves are sharded jax.Arrays)."""
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(
        os.path.abspath(path), target
    )


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
