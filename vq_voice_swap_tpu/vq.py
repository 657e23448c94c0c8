"""Vector quantization with straight-through gradients and on-device
dead-code revival.

Capability parity with /root/reference/vq_voice_swap/vq.py:17-243: nearest-
neighbor quantization over a learned codebook, a straight-through
"passthrough" output, codebook-usage tracking with a dead_rate horizon,
k-means++-style revival of dead entries from the most recent batch, and the
Standard / Revive VQ losses.

TPU-first design: the reference syncs code usage to the host every step
(vq.py:190-196, a Python set()) and runs revival as a numpy loop
(vq.py:145-188). Here both are pure jittable array ops — usage is a scatter
over the code axis and revival is a batched categorical draw — so the whole
train step stays on device; under data parallelism the usage mask and the
revival pool are combined across devices with a psum/all-gather by the train
step (see train/loops.py).

The nearest-neighbor search is expressed as one [B, C] x [C, D] matmul plus
norms, which XLA maps straight onto the MXU; a fused Pallas kernel for the
distance+argmin path lives in ops/vq_pallas.py and is used automatically on
TPU for large batches.
"""

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "embedding_distances",
    "nearest_codes",
    "vq_forward",
    "update_usage",
    "revive_dead_codes",
    "VQLossConfig",
    "vq_loss_fn",
    "init_vq_params",
]


def embedding_distances(dictionary: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances between rows of x [..., C] and a [D, C] codebook.

    Expanded form ||x||^2 - 2 x.d + ||d||^2: the cross term is a single MXU
    matmul; no [B, D, C] intermediate is materialised.
    """
    x = x.astype(jnp.float32)
    d = dictionary.astype(jnp.float32)
    dict_norms = jnp.sum(jnp.square(d), axis=-1)  # [D]
    x_norms = jnp.sum(jnp.square(x), axis=-1)  # [...]
    # HIGHEST precision: the argmin over distances must not flip on
    # bf16-rounded ties (TPU matmuls default to bf16 inputs).
    dots = jnp.einsum(
        "...c,dc->...d", x, d,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return -2.0 * dots + dict_norms + x_norms[..., None]


def nearest_codes(
    dictionary: jnp.ndarray, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the nearest codebook row per input vector, plus distances."""
    dists = embedding_distances(dictionary, x)
    return jnp.argmin(dists, axis=-1), dists


def vq_forward(
    dictionary: jnp.ndarray, x: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Quantize x [N, T, C] against a [D, C] codebook.

    Returns (reference vq.py:112-143 semantics):
      - "embedded": codebook rows, gradients flow to the dictionary.
      - "passthrough": straight-through output, gradients flow to x.
      - "idxs": [N, T] integer code indices.

    The nearest-neighbor assignment dispatches to the fused Pallas kernel on
    TPU for large batches (ops/vq_pallas.py); the assignment itself is
    non-differentiable, so routing it through stop_gradient is exact.
    """
    from .ops.vq_pallas import vq_assign

    flat = jnp.reshape(jax.lax.stop_gradient(x), (-1, x.shape[-1]))
    idxs_flat, used = vq_assign(jax.lax.stop_gradient(dictionary), flat)
    idxs = jnp.reshape(idxs_flat, x.shape[:-1])
    embedded = jnp.take(dictionary, idxs, axis=0)  # [N, T, C]
    passthrough = x + jax.lax.stop_gradient(embedded - x)
    return {
        "embedded": embedded,
        "passthrough": passthrough,
        "idxs": idxs,
        # [D] bool used-mask — already accumulated in-kernel on the Pallas
        # path; feeding it to update_usage avoids re-deriving it by scatter.
        "used": used.astype(jnp.bool_),
    }


def update_usage(
    usage: jnp.ndarray,
    idxs: jnp.ndarray,
    dead_rate: int,
    decay: int = 1,
    used: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Decay unused codes by ``decay``, reset used codes to dead_rate
    (reference vq.py:190-196), entirely on device.

    ``decay`` is the number of microbatch forwards folded into this call:
    the reference updates its tracker once per microbatch, so a code unused
    for a whole optimizer step decays by the microbatch count there. (For
    codes used in SOME microbatch the reference's final value depends on
    microbatch order within the step — dead_rate minus the number of later
    unused microbatches; this single-call form lands on dead_rate exactly.
    The difference is bounded by decay-1 and only delays death detection by
    less than one step.)

    ``used`` optionally supplies the precomputed [D] bool mask from
    vq_forward (in-kernel on the Pallas path); otherwise it is derived from
    idxs by scatter.
    """
    num_codes = usage.shape[0]
    if used is None:
        used = jnp.zeros(
            (num_codes,), dtype=jnp.bool_
        ).at[idxs.reshape(-1)].set(True)
    return jnp.where(
        used,
        jnp.asarray(dead_rate, usage.dtype),
        jnp.clip(usage - decay, 0, dead_rate),
    )


def revive_dead_codes(
    rng: jax.Array,
    dictionary: jnp.ndarray,
    usage: jnp.ndarray,
    batch_vecs: jnp.ndarray,
    dead_rate: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-initialise dead codebook entries from the current batch.

    k-means++-style: sampling probabilities proportional to each input's
    squared distance to its nearest (live) code (reference vq.py:145-188),
    with one independent categorical draw per dead entry — no host loop.

    batch_vecs: [B, C] flattened encoder outputs.
    Returns (new_dictionary, new_usage).
    """
    dead = usage == 0
    min_dists = jnp.min(
        embedding_distances(dictionary, batch_vecs), axis=-1
    )  # [B]
    probs = jnp.clip(min_dists, 0.0, None)
    # Guard: if all distances are zero, fall back to uniform.
    probs = jnp.where(jnp.sum(probs) > 0, probs, jnp.ones_like(probs))
    logits = jnp.log(probs)
    picks = jax.random.categorical(
        rng, logits[None, :], shape=(dictionary.shape[0],)
    )  # [D] indices into batch_vecs
    replacements = batch_vecs[picks].astype(dictionary.dtype)
    new_dict = jnp.where(dead[:, None], replacements, dictionary)
    new_usage = jnp.where(dead, jnp.asarray(dead_rate, usage.dtype), usage)
    return new_dict, new_usage


@dataclass(frozen=True)
class VQLossConfig:
    """Standard VQ-VAE loss, optionally with a revival pull term.

    commitment: coefficient on the encoder-commitment term.
    revival: if > 0, adds revival * mean distance of every codebook entry to
             the batch (ReviveVQLoss, reference vq.py:54-71); when 0 the
             training loop performs hard revival each step instead.
    """

    commitment: float = 0.25
    revival: float = 0.0


def vq_loss_fn(
    cfg: VQLossConfig,
    inputs: jnp.ndarray,
    embedded: jnp.ndarray,
    dictionary: jnp.ndarray,
) -> jnp.ndarray:
    """Codebook + commitment (+ optional revival) loss
    (reference vq.py:36-71)."""
    sg = jax.lax.stop_gradient
    codebook_loss = jnp.mean(jnp.square(sg(inputs) - embedded))
    commit_loss = jnp.mean(jnp.square(inputs - sg(embedded)))
    loss = codebook_loss + cfg.commitment * commit_loss
    if cfg.revival:
        flat = jnp.reshape(inputs, (-1, inputs.shape[-1]))
        dists = embedding_distances(dictionary, flat)
        loss = loss + cfg.revival * jnp.mean(dists)
    return loss


def init_vq_params(
    rng: jax.Array, num_codes: int, num_channels: int
) -> jnp.ndarray:
    """Gaussian-initialised [D, C] codebook (reference vq.py:94)."""
    return jax.random.normal(rng, (num_codes, num_channels), dtype=jnp.float32)
