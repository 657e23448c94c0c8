"""Convert reference PyTorch checkpoints into our npz format.

The released vq-voice-swap checkpoints (unet32/unet64/vqvae-unet-mfcc/...)
are torch ``{"kwargs", "state_dict"}`` dicts (reference models/base.py:74-104).
This module maps them onto our flax param trees so they can be sampled /
evaluated / fine-tuned on TPU. Only torch tensor layout differs:

  Linear    weight [out, in]     ->  Dense kernel [in, out]      (transpose)
  Conv1d    weight [out, in, k]  ->  Conv kernel [k, in, out]    (transpose)
  GroupNorm weight/bias          ->  scale/bias                  (copy)
  LayerNorm weight/bias          ->  scale/bias                  (copy)
  Embedding weight               ->  embedding                   (copy)

The name mapping below mirrors the reference module trees one submodule at a
time; see each _map_* function for the topology citation.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import traverse_util

__all__ = ["convert_torch_checkpoint", "convert_state_dict"]


class _Mapper:
    """Collects (torch_key -> ours_path) leaf transforms."""

    def __init__(self, state_dict: Dict[str, np.ndarray]):
        self.src = state_dict
        self.out: Dict[str, np.ndarray] = {}
        self.used = set()

    def _get(self, key: str) -> Optional[np.ndarray]:
        if key in self.src:
            self.used.add(key)
            return np.asarray(self.src[key])
        return None

    def linear(self, tkey: str, path: str):
        w = self._get(f"{tkey}.weight")
        if w is None:
            return
        self.out[f"{path}/kernel"] = w.T
        b = self._get(f"{tkey}.bias")
        if b is not None:
            self.out[f"{path}/bias"] = b

    def conv(self, tkey: str, path: str):
        w = self._get(f"{tkey}.weight")
        if w is None:
            return
        self.out[f"{path}/conv/kernel"] = np.transpose(w, (2, 1, 0))
        b = self._get(f"{tkey}.bias")
        if b is not None:
            self.out[f"{path}/conv/bias"] = b

    def raw_conv(self, tkey: str, path: str):
        """Conv whose flax module is a bare nn.Conv (no Conv1d wrapper)."""
        w = self._get(f"{tkey}.weight")
        if w is None:
            return
        self.out[f"{path}/kernel"] = np.transpose(w, (2, 1, 0))
        b = self._get(f"{tkey}.bias")
        if b is not None:
            self.out[f"{path}/bias"] = b

    def norm(self, tkey: str, path: str):
        w = self._get(f"{tkey}.weight")
        if w is None:
            return
        self.out[f"{path}/scale"] = w
        b = self._get(f"{tkey}.bias")
        if b is not None:
            self.out[f"{path}/bias"] = b

    def embed(self, tkey: str, path: str):
        w = self._get(f"{tkey}.weight")
        if w is not None:
            self.out[f"{path}/embedding"] = w

    def array(self, tkey: str, path: str):
        v = self._get(tkey)
        if v is not None:
            self.out[path] = v


# --------------------------------------------------------------- UNet parts


def _map_resblock(m: _Mapper, t: str, o: str):
    """Reference unet.py:248-316 ResBlock -> models/layers.py ResBlock."""
    m.norm(f"{t}.pre_cond.0.0", f"{o}/norm_in/norm")
    m.conv(f"{t}.pre_cond.2", f"{o}/conv_in")
    m.norm(f"{t}.pre_cond.3", f"{o}/norm_mid/norm")
    m.linear(f"{t}.cond_layers.1", f"{o}/cond_proj")
    # post_cond index shifts by one when dropout is present.
    if f"{t}.post_cond.2.weight" in m.src:
        m.conv(f"{t}.post_cond.2", f"{o}/conv_out")
    else:
        m.conv(f"{t}.post_cond.1", f"{o}/conv_out")
    m.conv(f"{t}.skip.1", f"{o}/skip_proj")


def _map_unet_predictor(m: _Mapper, t: str, o: str):
    """Reference unet.py:16-184 UNetPredictor."""
    m.linear(f"{t}time_embed.proj", f"{o}time_embed/proj")
    m.linear(f"{t}time_embed_extra.1", f"{o}time_embed_extra")
    m.embed(f"{t}class_embed", f"{o}class_embed")
    m.conv(f"{t}cond_proj", f"{o}cond_proj")
    m.conv(f"{t}in_conv", f"{o}in_conv")
    for group in ("down_blocks", "middle_blocks", "up_blocks"):
        i = 0
        while f"{t}{group}.{i}.pre_cond.2.weight" in m.src:
            _map_resblock(m, f"{t}{group}.{i}", f"{o}{group}_{i}")
            i += 1
    m.norm(f"{t}out.0.0", f"{o}out_norm/norm")
    m.conv(f"{t}out.1", f"{o}out_conv")


def _map_unet_encoder(m: _Mapper, t: str, o: str):
    """Reference unet.py:187-245 UNetEncoder."""
    m.conv(f"{t}in_conv", f"{o}in_conv")
    i = 0
    while f"{t}blocks.{i}.pre_cond.2.weight" in m.src:
        _map_resblock(m, f"{t}blocks.{i}", f"{o}blocks_{i}")
        i += 1
    m.norm(f"{t}out.0.0", f"{o}out_norm/norm")
    m.conv(f"{t}out.1", f"{o}out_conv")


# ----------------------------------------------------------- WaveGrad parts


def _map_film(m: _Mapper, t: str, o: str):
    """Reference wavegrad.py:280-336 FILM."""
    m.linear(f"{t}.time_emb.proj", f"{o}/time_emb/proj")
    m.embed(f"{t}.label_emb", f"{o}/label_emb")
    m.norm(f"{t}.cond_emb.0.ln", f"{o}/cond_norm")
    m.conv(f"{t}.cond_emb.1", f"{o}/cond_conv")
    m.conv(f"{t}.out_layer.1", f"{o}/out_conv")


def _map_ublock(m: _Mapper, t: str, o: str):
    """Reference wavegrad.py:163-225 UBlock."""
    m.conv(f"{t}.res_transform.1", f"{o}/res_conv")
    m.norm(f"{t}.block_1.0.ln", f"{o}/norm_1")
    m.conv(f"{t}.block_1.3", f"{o}/conv_1")
    m.conv(f"{t}.block_2.1", f"{o}/conv_2")
    m.norm(f"{t}.block_3.0.ln", f"{o}/norm_3")
    m.conv(f"{t}.block_3.2", f"{o}/conv_3")
    m.conv(f"{t}.block_4.1", f"{o}/conv_4")
    m.conv(f"{t}.block_4.3", f"{o}/conv_5")
    for film in ("film_1", "film_2", "film_3"):
        _map_film(m, f"{t}.{film}", f"{o}/{film}")


def _map_dblock(m: _Mapper, t: str, o: str):
    """Reference wavegrad.py:232-277 DBlock."""
    m.conv(f"{t}.res_transform.0", f"{o}/res_conv")
    m.norm(f"{t}.block_1.0.ln", f"{o}/norm_in")
    m.conv(f"{t}.block_1.3", f"{o}/conv_1")
    m.conv(f"{t}.block_1.5", f"{o}/conv_2")
    j = 0
    while f"{t}.extra.{j}.0.ln.weight" in m.src:
        m.norm(f"{t}.extra.{j}.0.ln", f"{o}/extra_norm_{j}")
        m.conv(f"{t}.extra.{j}.2", f"{o}/extra_conv_{j}_a")
        m.conv(f"{t}.extra.{j}.4", f"{o}/extra_conv_{j}_b")
        m.conv(f"{t}.extra.{j}.6", f"{o}/extra_conv_{j}_c")
        j += 1


def _map_wavegrad_predictor(m: _Mapper, t: str, o: str):
    """Reference wavegrad.py:16-129 WaveGradPredictor."""
    m.conv(f"{t}d_blocks.0", f"{o}d_in_conv")
    for i in range(4):
        _map_dblock(m, f"{t}d_blocks.{i + 1}", f"{o}d_block_{i}")
    m.conv(f"{t}u_conv_1", f"{o}u_in_conv")
    for i in range(5):
        _map_ublock(m, f"{t}u_blocks.{i}", f"{o}u_block_{i}")
    m.norm(f"{t}u_ln.ln", f"{o}out_norm")
    m.conv(f"{t}u_conv_2", f"{o}out_conv")


def _map_wavegrad_encoder(m: _Mapper, t: str, o: str):
    """Reference wavegrad.py:132-160 WaveGradEncoder."""
    m.conv(f"{t}d_blocks.0", f"{o}in_conv")
    for i in range(5):
        _map_dblock(m, f"{t}d_blocks.{i + 1}", f"{o}d_block_{i}")


# --------------------------------------------------------------- MFCC conv


def _map_mfcc_encoder(m: _Mapper, t: str, o: str):
    """Reference conv_encoder.py:14-109 ConvMFCCEncoder."""
    m.conv(f"{t}blocks.0.0", f"{o}conv_in")
    m.conv(f"{t}blocks.1.conv", f"{o}res_0")
    m.raw_conv(f"{t}blocks.2.0", f"{o}down_conv")
    m.conv(f"{t}blocks.3.conv", f"{o}res_3_0")
    m.conv(f"{t}blocks.4.conv", f"{o}res_3_1")
    for j in range(4):
        m.conv(f"{t}blocks.{5 + j}.conv", f"{o}res_1_{j}")
    m.conv(f"{t}blocks.9", f"{o}out_conv")


# -------------------------------------------------------------- Classifier


def _map_classifier(m: _Mapper):
    """Reference classifier.py:18-130 Classifier + ClassifierStem."""
    m.conv("stem.in_conv", "stem/in_conv")
    m.linear("stem.time_embed.proj", "stem/time_embed/proj")
    m.linear("stem.time_embed_extra.1", "stem/time_embed_extra")
    i = 0
    while f"stem.blocks.{i}.pre_cond.2.weight" in m.src:
        _map_resblock(m, f"stem.blocks.{i}", f"stem/block_{i}")
        i += 1
    m.norm("stem.out.0.0", "stem/out_norm/norm")
    m.conv("stem.out.1.qkv_proj", "stem/pool/qkv_proj")
    m.conv("stem.out.1.c_proj", "stem/pool/c_proj")
    m.linear("out.1", "head")


# ------------------------------------------------------------ entry points


def _encoder_mapper(enc_name: str):
    if enc_name.startswith("unet"):
        return _map_unet_encoder
    if enc_name == "wavegrad":
        return _map_wavegrad_encoder
    if enc_name.startswith("conv-mfcc"):
        return _map_mfcc_encoder
    raise ValueError(f"unknown encoder name: {enc_name}")


def convert_state_dict(
    class_name: str, kwargs: Dict[str, Any], state_dict: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """Torch state_dict -> our variables tree for a given model class."""
    m = _Mapper(state_dict)
    buffers: Dict[str, np.ndarray] = {}

    if class_name in ("DiffusionModel", "VQVAE"):
        pred_name = kwargs.get("pred_name", "unet")
        if pred_name == "unet":
            _map_unet_predictor(m, "predictor.", "predictor/")
        elif pred_name == "wavegrad":
            _map_wavegrad_predictor(m, "predictor.", "predictor/")
        else:
            raise ValueError(f"unknown predictor name: {pred_name}")
        if class_name == "VQVAE":
            enc = kwargs.get("enc_name", "unet")
            _encoder_mapper(enc)(m, "encoder.", "encoder/")
            m.array("vq.dictionary", "vq/dictionary")
            usage = m._get("vq.usage_count")
            if usage is not None:
                buffers["vq/usage_count"] = usage.astype(np.int32)
    elif class_name == "Classifier":
        _map_classifier(m)
    elif class_name == "EncoderPredictor":
        _map_unet_predictor(m, "unet.", "unet/")
        m.conv("out", "out_proj")
    else:
        raise ValueError(f"unsupported model class: {class_name}")

    unused = set(state_dict) - m.used
    # torchaudio's MFCC module stores persistent buffers (dct_mat, the Hann
    # window, the mel filterbank) in the state_dict; they are deterministic
    # constants of the config and the frontend is reimplemented in pure JAX
    # (ops/mfcc.py), so they are expected leftovers, not conversion gaps.
    unused = {u for u in unused
              if not u.endswith("num_batches_tracked")
              and ".mfcc." not in u}
    if unused:
        raise ValueError(f"unconverted torch parameters: {sorted(unused)[:10]}")

    variables = {
        "params": traverse_util.unflatten_dict(m.out, sep="/"),
    }
    if buffers:
        variables["buffers"] = traverse_util.unflatten_dict(buffers, sep="/")
    return variables


def _translate_kwargs(
    class_name: str, kwargs: Dict[str, Any]
) -> Dict[str, Any]:
    kwargs = dict(kwargs)
    # Reference bug-compat: dropout may be stored as a tuple
    # (diffusion_model.py:31).
    if isinstance(kwargs.get("dropout"), (tuple, list)):
        kwargs["dropout"] = kwargs["dropout"][0]
    if class_name == "VQVAE":
        kwargs.pop("cond_channels", None)  # derived from cond_mult
    if class_name == "Classifier":
        if "channel_mult" in kwargs:
            kwargs["channel_mult"] = list(kwargs["channel_mult"])
    return kwargs


def convert_torch_checkpoint(
    torch_path: str, out_path: str
) -> Tuple[str, Dict[str, Any]]:
    """Convert a reference .pt checkpoint file into our .npz format.

    Returns (class_name, kwargs). Requires torch (CPU) to deserialise.
    """
    from ..checkpoint import save_checkpoint

    registry_name, our_kwargs, variables = load_torch_checkpoint(torch_path)
    save_checkpoint(out_path, registry_name, our_kwargs, variables)
    return registry_name, our_kwargs


def load_torch_checkpoint(torch_path):
    """Load + convert a reference ``.pt`` checkpoint in memory.

    Returns (registry_name, our_kwargs, variables). The ONLY place the
    class-from-parameter-names inference and the Classifier ->
    ClassifierModel registry rename live — model_base's transparent .pt
    loading shares it, so the two paths can never classify the same
    checkpoint differently.
    """
    import torch

    state = torch.load(torch_path, map_location="cpu", weights_only=False)
    kwargs = state["kwargs"]
    sd = {k: v.numpy() for k, v in state["state_dict"].items()}

    # Infer the model class from its parameter names.
    if any(k.startswith("vq.") for k in sd):
        class_name = "VQVAE"
    elif any(k.startswith("stem.") for k in sd):
        class_name = "Classifier"
    elif any(k.startswith("unet.") for k in sd):
        class_name = "EncoderPredictor"
    else:
        class_name = "DiffusionModel"

    variables = convert_state_dict(class_name, kwargs, sd)
    our_kwargs = _translate_kwargs(class_name, kwargs)
    # Our wrappers for Classifier/EncoderPredictor are registered under
    # *Model names.
    registry_name = {
        "Classifier": "ClassifierModel",
        "EncoderPredictor": "EncoderPredictorModel",
    }.get(class_name, class_name)
    return registry_name, our_kwargs, variables
