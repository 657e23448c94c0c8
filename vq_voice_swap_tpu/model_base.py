"""High-level model wrappers: self-describing save/load and checkpoint-time
parameter surgery.

In JAX, parameters live outside modules, so the reference's Savable nn.Module
(/root/reference/vq_voice_swap/models/base.py:63-134) becomes a thin config
object: it owns the linen module(s) and the constructor kwargs, while the
variables pytree is passed explicitly. ``save(path, variables)`` embeds the
class name + kwargs (self-describing checkpoints); ``ModelBase.load(path)``
rebuilds the wrapper from any registered class; ``load_from_pretrained``
copies the path-intersection of parameters and returns the scalar count.
"""

import os
from typing import Any, Dict, Optional, Tuple, Type

import jax

from .checkpoint import (
    copy_intersection,
    load_checkpoint,
    save_checkpoint,
    tree_size,
)

__all__ = ["ModelBase", "register_model", "build_model", "load_model",
           "jit_init"]


def jit_init(module, rng, *args, **kwargs):
    """Initialise a linen module under jit.

    Eager init dispatches one tiny XLA compile per primitive; under jit the
    whole init graph compiles once, which is dramatically faster on hosts
    with high per-compile overhead.
    """
    return jax.jit(lambda r: module.init(r, *args, **kwargs))(rng)

_REGISTRY: Dict[str, Type["ModelBase"]] = {}


def register_model(cls: Type["ModelBase"]) -> Type["ModelBase"]:
    _REGISTRY[cls.__name__] = cls
    return cls


def _ensure_registered() -> None:
    """Import the modules that register the standard model classes (lazy, so
    loading a checkpoint works regardless of what the caller imported)."""
    import importlib

    for mod in (".diffusion_model", ".vq_vae", ".classifier_model"):
        importlib.import_module(mod, package=__package__)


def build_model(class_name: str, kwargs: Dict[str, Any]) -> "ModelBase":
    _ensure_registered()
    if class_name not in _REGISTRY:
        raise ValueError(
            f"unknown model class {class_name!r} (known: {sorted(_REGISTRY)})"
        )
    return _REGISTRY[class_name](**kwargs)


def _load_any_checkpoint(path: str):
    """Load an npz checkpoint, transparently converting reference PyTorch
    .pt checkpoints on the fly (torch required for those). A directory is
    an Orbax checkpoint (checkpoint.py::save_checkpoint_orbax — same
    self-describing manifest, array-store backend)."""
    if os.path.isdir(path) or os.path.isdir(path + ".new"):
        # .new: a crash hit the commit-swap window of an Orbax save; the
        # staging dir is complete (checkpoint.py::staged_fallback).
        from .checkpoint import load_checkpoint_orbax

        return load_checkpoint_orbax(path)
    try:
        return load_checkpoint(path)
    except Exception as npz_err:  # not our npz format — maybe a torch file
        try:
            from .convert.torch_import import load_torch_checkpoint

            registry_name, kwargs, variables = load_torch_checkpoint(path)
            return registry_name, kwargs, variables, {}
        except Exception as torch_err:
            # A real torch checkpoint that failed mid-conversion must show
            # the conversion error, not the irrelevant npz parse failure.
            if _looks_like_torch_file(path):
                raise torch_err from npz_err
            raise npz_err from torch_err


def _looks_like_torch_file(path: str) -> bool:
    """True if the file is plausibly a torch checkpoint (zip archive with a
    .pt-style layout, or the legacy pickle magic) rather than our npz."""
    if path.endswith((".pt", ".pth")):
        return True
    try:
        import zipfile

        if zipfile.is_zipfile(path):
            with zipfile.ZipFile(path) as z:
                return any(n.endswith("data.pkl") for n in z.namelist())
        with open(path, "rb") as f:
            return f.read(2) == b"\x80\x02"  # pickle protocol-2 magic
    except Exception:
        return False


def load_model(path: str) -> Tuple["ModelBase", Dict[str, Any]]:
    """Load any registered model: (wrapper, variables)."""
    class_name, kwargs, variables, _ = _load_any_checkpoint(path)
    return build_model(class_name, kwargs), variables


class ModelBase:
    """Base for high-level model wrappers (config + linen modules)."""

    def save_kwargs(self) -> Dict[str, Any]:
        raise NotImplementedError

    def init_variables(self, rng: jax.Array) -> Dict[str, Any]:
        """Initialise a fresh variables tree with canonical dummy shapes."""
        raise NotImplementedError

    def save(self, path: str, variables: Dict[str, Any]) -> None:
        """A ``.orbax`` path selects the directory format (sharded,
        multi-host-collective, no host-side gather); anything else writes
        the single-file npz."""
        if path.endswith(".orbax"):
            from .checkpoint import save_checkpoint_orbax

            save_checkpoint_orbax(
                path, type(self).__name__, self.save_kwargs(), variables
            )
        else:
            save_checkpoint(
                path, type(self).__name__, self.save_kwargs(), variables
            )

    @classmethod
    def load(
        cls,
        path: str,
        dtype: Optional[str] = None,
        act_int8_min_t: Optional[int] = None,
    ) -> Tuple["ModelBase", Dict[str, Any]]:
        """Load from a checkpoint; the class is taken from the manifest but
        must be cls or a subclass when called on a concrete class.

        Reference PyTorch .pt checkpoints are converted transparently.
        ``dtype`` overrides the compute dtype the checkpoint was saved with
        (params stay float32) — e.g. "bfloat16" for serving.
        ``act_int8_min_t`` overrides int8 activation storage (ops/qact.py):
        levels with T >= the value serve with int8-stored activations; 0
        forces it off. Serving-only, like ``dtype``.
        """
        class_name, kwargs, variables, _ = _load_any_checkpoint(path)
        _ensure_registered()
        model_cls = _REGISTRY.get(class_name)
        if model_cls is None:
            raise ValueError(f"unknown model class in checkpoint: {class_name}")
        if cls is not ModelBase and not issubclass(model_cls, cls):
            raise ValueError(
                f"checkpoint contains {class_name}, expected {cls.__name__}"
            )
        if dtype is not None:
            kwargs = {**kwargs, "dtype": dtype}
        if act_int8_min_t is not None:
            kwargs = {**kwargs, "act_int8_min_t": act_int8_min_t}
        return model_cls(**kwargs), variables

    def load_from_pretrained(
        self,
        variables: Dict[str, Any],
        src_variables: Dict[str, Any],
    ) -> Tuple[Dict[str, Any], int]:
        """Copy the path-intersection of src into our variables tree."""
        return copy_intersection(variables, src_variables)

    @staticmethod
    def count_params(variables: Dict[str, Any]) -> int:
        return tree_size(variables.get("params", variables))
