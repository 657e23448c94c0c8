"""VQ-VAE with a diffusion decoder, for speaker conversion.

Capability parity with /root/reference/vq_voice_swap/vq_vae.py:10-261:
training losses (encoder -> optional temporal jitter -> VQ -> vq loss +
conditional diffusion MSE, with optional per-sequence cond dropout),
encode/decode, encoder-predictor gradient guidance during decoding, 3x-batch
classifier-free guidance (decode_uncond_guidance) combining VQ and label
scales, and the LCM downsample-rate contract.

TPU-first: decode() compiles the entire reverse process into one lax.scan;
the CFG pred_fn triples the batch inside the scan so all three conditional
branches run as a single batched predictor call on the MXU.
"""

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .diffusion_model import DiffusionModel
from .model_base import jit_init, register_model
from .models import make_encoder
from .models.encoder_predictor import EncoderPredictor
from .vq import (
    VQLossConfig,
    init_vq_params,
    vq_forward,
    vq_loss_fn,
)

__all__ = ["VQVAE", "jitter_seq"]


def jitter_seq(rng: jax.Array, seq: jnp.ndarray, p: float) -> jnp.ndarray:
    """Temporal jitter regularization (https://arxiv.org/abs/1901.08810):
    each timestep is replaced by a neighbor with probability p
    (reference vq_vae.py:243-261). seq: [N, T, C]."""
    right = jnp.concatenate([seq[:, :1], seq[:, :-1]], axis=1)
    left = jnp.concatenate([seq[:, 1:], seq[:, -1:]], axis=1)
    nums = jax.random.uniform(rng, (seq.shape[0], seq.shape[1], 1))
    return jnp.where(
        nums < p / 2, right, jnp.where(nums < p, left, seq)
    )


@register_model
class VQVAE(DiffusionModel):
    """A waveform VQ-VAE whose decoder is the diffusion model."""

    def __init__(
        self,
        base_channels: int,
        enc_name: str = "unet",
        cond_mult: int = 16,
        dictionary_size: int = 512,
        dead_rate: int = 100,
        **kwargs: Any,
    ):
        kwargs["cond_channels"] = base_channels * cond_mult
        super().__init__(base_channels=base_channels, **kwargs)
        self.enc_name = enc_name
        self.cond_mult = cond_mult
        self.dictionary_size = dictionary_size
        self.dead_rate = dead_rate
        self.encoder = make_encoder(
            enc_name,
            base_channels=base_channels,
            cond_mult=cond_mult,
            dtype=jnp.dtype(self.dtype_name) if self.dtype_name else None,
            remat=self.remat,
        )

    def save_kwargs(self) -> Dict[str, Any]:
        res = super().save_kwargs()
        del res["cond_channels"]  # derived from cond_mult
        res.update(
            enc_name=self.enc_name,
            cond_mult=self.cond_mult,
            dictionary_size=self.dictionary_size,
            dead_rate=self.dead_rate,
        )
        return res

    @property
    def downsample_rate(self) -> int:
        """LCM of predictor and encoder rates (reference vq_vae.py:222-229)."""
        x, y = self.predictor.downsample_rate, self.encoder.downsample_rate
        return x * y // math.gcd(x, y)

    # ----------------------------------------------------------------- init

    def init_variables(self, rng: jax.Array, seq_len: int = 0) -> Dict[str, Any]:
        seq_len = seq_len or self.downsample_rate * 4
        p_rng, e_rng, v_rng = jax.random.split(rng, 3)
        variables = super().init_variables(p_rng, seq_len=seq_len)
        x = jnp.zeros((1, seq_len, 1), dtype=jnp.float32)
        enc = jit_init(self.encoder, e_rng, x)
        variables["params"]["encoder"] = enc["params"]
        variables["params"]["vq"] = {
            "dictionary": init_vq_params(
                v_rng, self.dictionary_size, self.cond_channels
            )
        }
        variables["buffers"] = {
            "vq": {
                "usage_count": jnp.full(
                    (self.dictionary_size,), self.dead_rate, dtype=jnp.int32
                )
            }
        }
        return variables

    # -------------------------------------------------------------- compute

    def encode_raw(
        self, variables: Dict[str, Any], inputs: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Encoder output before quantization: [N, T1, C]."""
        return self.encoder.apply(
            {"params": variables["params"]["encoder"]}, inputs, train=train
        )

    def encode(self, variables: Dict[str, Any], inputs: jnp.ndarray) -> jnp.ndarray:
        """Waveform [N, T, 1] -> integer codes [N, T1]."""
        enc = self.encode_raw(variables, inputs)
        return vq_forward(variables["params"]["vq"]["dictionary"], enc)["idxs"]

    def embed_codes(
        self, variables: Dict[str, Any], codes: jnp.ndarray
    ) -> jnp.ndarray:
        """[N, T1] int codes -> [N, T1, C] codebook embeddings."""
        return jnp.take(
            variables["params"]["vq"]["dictionary"], codes, axis=0
        )

    def losses(
        self,
        variables: Dict[str, Any],
        rng: jax.Array,
        inputs: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        vq_loss_cfg: VQLossConfig = VQLossConfig(),
        jitter: float = 0.0,
        no_vq_prob: float = 0.0,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Training losses (reference vq_vae.py:34-80).

        Returns a dict with "vq_loss", "mse", "ts", "mses", plus auxiliary
        tensors for the on-device usage/revival pipeline: "idxs" and
        "enc_flat" (stop-gradient flattened encoder outputs).
        """
        t_rng, n_rng, j_rng, m_rng, d_rng = jax.random.split(rng, 5)
        dictionary = variables["params"]["vq"]["dictionary"]

        enc_out = self.encode_raw(variables, inputs, train=train)
        if jitter:
            enc_out = jitter_seq(j_rng, enc_out, jitter)
        vq_out = vq_forward(dictionary, enc_out)
        vq_loss = vq_loss_fn(vq_loss_cfg, enc_out, vq_out["embedded"], dictionary)

        ts = jax.random.uniform(t_rng, (inputs.shape[0],))
        epsilon = jax.random.normal(n_rng, inputs.shape, dtype=inputs.dtype)
        noised = self.diffusion.sample_q(inputs, ts, epsilon=epsilon)
        cond = vq_out["passthrough"]

        if no_vq_prob:
            keep = jax.random.uniform(m_rng, (cond.shape[0], 1, 1)) > no_vq_prob
            cond = cond * keep.astype(cond.dtype)

        predictions = self.predict_eps(
            variables,
            noised,
            ts,
            cond=cond,
            labels=labels,
            train=train,
            rngs={"dropout": d_rng} if train and self.dropout else None,
        )
        sq = jnp.square(predictions - epsilon)
        mses = jnp.mean(jnp.reshape(sq, (inputs.shape[0], -1)), axis=1)

        return {
            "vq_loss": vq_loss,
            "mse": jnp.mean(mses),
            "ts": ts,
            "mses": mses,
            "idxs": vq_out["idxs"],
            "used": vq_out["used"],
            "enc_flat": jax.lax.stop_gradient(
                jnp.reshape(enc_out, (-1, enc_out.shape[-1]))
            ),
        }

    # ------------------------------------------------------------- sampling

    def _cond_seq(self, variables, codes: jnp.ndarray) -> jnp.ndarray:
        if codes.ndim == 2:
            return self.embed_codes(variables, codes)
        if codes.ndim == 3:
            return codes
        raise ValueError(f"unsupported codes shape: {codes.shape}")

    def decode(
        self,
        variables: Dict[str, Any],
        codes: jnp.ndarray,
        rng: jax.Array,
        labels: Optional[jnp.ndarray] = None,
        steps: int = 100,
        constrain: bool = False,
        enc_pred: Optional[Tuple[EncoderPredictor, Dict[str, Any]]] = None,
        enc_pred_scale: float = 1.0,
        sampler: str = "ddpm",
        eta: float = 0.0,
        **kwargs: Any,
    ) -> jnp.ndarray:
        """Sample audio for codes (+ labels); optional encoder-predictor
        gradient guidance (reference vq_vae.py:93-145). ``sampler`` picks
        the ancestral DDPM sampler or the (beyond-reference) DDIM sampler;
        ``eta`` is DDIM-only."""
        cond_seq = self._cond_seq(variables, codes)
        x_len = cond_seq.shape[1] * self.encoder.downsample_rate
        rng, noise_rng = jax.random.split(rng)
        x_T = jax.random.normal(
            noise_rng, (cond_seq.shape[0], x_len, 1), dtype=jnp.float32
        )

        cond_fn = None
        if enc_pred is not None:
            ep_model, ep_vars = enc_pred
            targets = vq_forward(
                variables["params"]["vq"]["dictionary"], cond_seq
            )["idxs"]

            def cond_fn(x, ts):
                def total_loss(xx):
                    losses = ep_model.apply(
                        {"params": ep_vars["params"]}, xx, ts, targets,
                        method=ep_model.losses,
                    )
                    return jnp.sum(losses * targets.shape[-1])

                return -enc_pred_scale * jax.grad(total_loss)(x)

        pred_fn = lambda xs, ts: self.predict_eps(  # noqa: E731
            variables, xs, ts, cond=cond_seq, labels=labels
        )
        if sampler == "ddim":
            return self.diffusion.ddim_sample(
                x_T, pred_fn, steps=steps, rng=rng, eta=eta,
                constrain=constrain, cond_fn=cond_fn, **kwargs,
            )
        if sampler == "dpmpp":
            return self.diffusion.dpmpp_sample(
                x_T, pred_fn, steps=steps, rng=rng,
                constrain=constrain, cond_fn=cond_fn, **kwargs,
            )
        assert sampler == "ddpm", f"unknown sampler {sampler!r}"
        return self.diffusion.ddpm_sample(
            x_T,
            pred_fn,
            steps=steps,
            rng=rng,
            constrain=constrain,
            cond_fn=cond_fn,
            **kwargs,
        )

    def decode_uncond_guidance(
        self,
        variables: Dict[str, Any],
        codes: jnp.ndarray,
        rng: jax.Array,
        labels: Optional[jnp.ndarray] = None,
        steps: int = 100,
        constrain: bool = False,
        label_scale: float = 0.0,
        vq_scale: float = 0.0,
        sampler: str = "ddpm",
        eta: float = 0.0,
        **kwargs: Any,
    ) -> jnp.ndarray:
        """Classifier-free guidance decoding for models fine-tuned with
        train_vqvae_uncond (reference vq_vae.py:147-220). ``labels`` are raw
        (not offset for the unconditional label)."""
        cond_seq = self._cond_seq(variables, codes)
        n = cond_seq.shape[0]
        x_len = cond_seq.shape[1] * self.encoder.downsample_rate
        rng, noise_rng = jax.random.split(rng)
        x_T = jax.random.normal(noise_rng, (n, x_len, 1), dtype=jnp.float32)

        # Build the stacked conditioning batch once (static structure).
        cond_batches = [cond_seq]
        label_batches = [labels + 1] if labels is not None else None
        if vq_scale:
            cond_batches.append(jnp.zeros_like(cond_seq))
            if label_batches is not None:
                label_batches.append(labels + 1)
        if labels is not None and label_scale:
            cond_batches.append(cond_seq)
            label_batches.append(jnp.zeros_like(labels))
        k = len(cond_batches)
        cond_all = jnp.concatenate(cond_batches, axis=0)
        labels_all = (
            jnp.concatenate(label_batches, axis=0)
            if label_batches is not None
            else None
        )

        def pred_fn(xs, ts):
            xs_k = jnp.concatenate([xs] * k, axis=0)
            ts_k = jnp.concatenate([ts] * k, axis=0)
            outs = self.predict_eps(
                variables, xs_k, ts_k, cond=cond_all, labels=labels_all
            )
            base = outs[:n]
            rest = outs[n:]
            pred = base
            for flag, scale in [(bool(vq_scale), vq_scale),
                                (labels is not None and bool(label_scale),
                                 label_scale)]:
                if flag and scale:
                    sub = rest[:n]
                    rest = rest[n:]
                    pred = pred + scale * (base - sub)
            return pred

        if sampler == "ddim":
            return self.diffusion.ddim_sample(
                x_T, pred_fn, steps=steps, rng=rng, eta=eta,
                constrain=constrain, **kwargs
            )
        if sampler == "dpmpp":
            return self.diffusion.dpmpp_sample(
                x_T, pred_fn, steps=steps, rng=rng,
                constrain=constrain, **kwargs
            )
        assert sampler == "ddpm", f"unknown sampler {sampler!r}"
        return self.diffusion.ddpm_sample(
            x_T, pred_fn, steps=steps, rng=rng, constrain=constrain, **kwargs
        )
