"""The jitted train step: microbatch gradient accumulation, optimizer
update, EMA updates, and the on-device VQ usage/revival pipeline.

Replaces the reference's Python-side step loop
(/root/reference/vq_voice_swap/train_loop.py:63-120): microbatch splitting +
per-microbatch backward becomes a ``lax.scan`` gradient accumulation inside
one compiled function, and the VQ codebook bookkeeping that the reference
does via host numpy round-trips (vq.py:145-196) runs as array ops in the same
program. One step = one XLA computation = zero host syncs besides metrics.
"""

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..train.ema import ema_update
from ..vq import revive_dead_codes, update_usage
from .state import TrainState

__all__ = ["VQUpdateRule", "make_train_step", "make_multi_train_step",
           "LossFn"]

# loss_fn(params, buffers, rng, batch, ctx) ->
#   (scalar_total_loss, aux) where aux contains at least
#   {"mses": [n], "ts": [n], "extra": {name: scalar}} and, for VQ models,
#   {"idxs": [n, T1], "enc_flat": [n*T1, C]}. ``ctx`` carries frozen
#   auxiliary parameters (e.g. the frozen VQ-VAE for encoder-predictor
#   training) as a traced argument so they are not baked into the
#   executable as constants.
LossFn = Callable[[Any, Any, jax.Array, Dict[str, jnp.ndarray], Any],
                  Tuple[jnp.ndarray, Dict[str, Any]]]


@dataclass(frozen=True)
class VQUpdateRule:
    """How the train step maintains the VQ codebook usage statistics."""

    dead_rate: int
    revive: bool  # hard k-means++ revival each step (reference
    # train_loop.py:425-431: only when no revival loss and VQ not frozen)


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    ema_rate_trees: Dict[str, Any],
    microbatches: int = 1,
    micro_remainder: int = 0,
    vq_rule: Optional[VQUpdateRule] = None,
    donate: bool = True,
    jit: bool = True,
):
    """Build a jitted (state, batch, rng) -> (state, metrics) train step.

    ``microbatches`` is the number of FULL microbatches; ``micro_remainder``
    is the size of one trailing partial microbatch (0 if the batch divides
    evenly). Non-divisible batches match the reference's weighted
    accumulation (train_loop.py:99-112: each chunk's gradient is weighted by
    its share of the batch) — here as a ``lax.scan`` over the equal-size
    chunks plus ONE extra statically-shaped grad call for the remainder, so
    every shape stays static under jit.
    """
    n_forwards = microbatches + (1 if micro_remainder else 0)

    def train_step(state: TrainState, batch, rng: jax.Array, ctx=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if microbatches == 1 and not micro_remainder:
            (loss, aux), grads = grad_fn(
                state.params, state.buffers, rng, batch, ctx
            )
        else:
            batch_size = max(
                x.shape[0] for x in jax.tree.leaves(batch) if jnp.ndim(x)
            )
            full = batch_size - micro_remainder
            micro_size, rem = divmod(full, microbatches)
            assert rem == 0, (
                f"batch {batch_size} != {microbatches}x{micro_size}"
                f"+{micro_remainder}"
            )
            # Rank-0 entries (curriculum scalars like ts_power) replicate
            # across microbatches instead of being sliced.
            micro = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (microbatches,))
                if jnp.ndim(x) == 0
                else jnp.reshape(
                    x[:full], (microbatches, micro_size) + x.shape[1:]
                ),
                batch,
            )
            keys = jax.random.split(rng, n_forwards)
            w_full = micro_size / batch_size  # reference weight len(mb)/len(b)

            def body(carry, inputs):
                grads_acc, loss_acc = carry
                key, mb = inputs
                (mb_loss, mb_aux), mb_grads = grad_fn(
                    state.params, state.buffers, key, mb, ctx
                )
                grads_acc = jax.tree.map(
                    lambda a, g: a + g * w_full, grads_acc, mb_grads
                )
                return (grads_acc, loss_acc + mb_loss * w_full), mb_aux

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss), aux_stack = jax.lax.scan(
                body, (zero_grads, 0.0), (keys[:microbatches], micro)
            )
            # Re-flatten stacked per-microbatch aux back to full-batch shape;
            # scalar extras are weighted like the losses.
            aux = {
                k: (jax.tree.map(lambda v: jnp.mean(v), v) if k == "extra"
                    else jnp.any(v, axis=0) if k == "used"  # [M, D] -> [D]
                    else jnp.reshape(v, (-1,) + v.shape[2:]))
                for k, v in aux_stack.items()
            }
            if micro_remainder:
                rem = jax.tree.map(
                    lambda x: x if jnp.ndim(x) == 0 else x[full:], batch
                )
                (rem_loss, rem_aux), rem_grads = grad_fn(
                    state.params, state.buffers, keys[-1], rem, ctx
                )
                w_rem = micro_remainder / batch_size
                grads = jax.tree.map(
                    lambda a, g: a + g * w_rem, grads, rem_grads
                )
                loss = loss + rem_loss * w_rem
                merged = {}
                for k, v in aux.items():
                    if k == "extra":
                        merged[k] = jax.tree.map(
                            # Stacked mean covered w_full*M of the mass.
                            lambda a, b: a * (1.0 - w_rem) + b * w_rem,
                            v, rem_aux[k],
                        )
                    elif k == "used":
                        merged[k] = jnp.logical_or(v, rem_aux[k])
                    else:
                        merged[k] = jnp.concatenate([v, rem_aux[k]], axis=0)
                aux = merged

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_buffers = state.buffers

        # --- VQ codebook maintenance (all on device) ---------------------
        if vq_rule is not None:
            usage = new_buffers["vq"]["usage_count"]
            # decay=n_forwards: the reference ticks its tracker once per
            # microbatch forward (vq.py:190-196 inside each compute_losses),
            # including the partial-remainder forward.
            usage = update_usage(
                usage, aux["idxs"], vq_rule.dead_rate,
                decay=n_forwards, used=aux.get("used"),
            )
            # Liveness is only meaningful BEFORE revival refills dead slots
            # (with revive=True the post-revival count is always D).
            codebook_used = jnp.sum((usage > 0).astype(jnp.int32))
            dictionary = new_params["vq"]["dictionary"]
            if vq_rule.revive:
                revive_rng = jax.random.fold_in(rng, 0x5EED)
                dictionary, usage = revive_dead_codes(
                    revive_rng, dictionary, usage, aux["enc_flat"],
                    vq_rule.dead_rate,
                )
                new_params = dict(new_params)
                new_params["vq"] = dict(new_params["vq"])
                new_params["vq"]["dictionary"] = dictionary
            new_buffers = dict(new_buffers)
            new_buffers["vq"] = dict(new_buffers["vq"])
            new_buffers["vq"]["usage_count"] = usage

        new_emas = {
            rate: ema_update(state.emas[rate], new_params, rate_tree)
            for rate, rate_tree in ema_rate_trees.items()
        }

        metrics = {
            "loss": loss,
            "mses": aux["mses"],
            "ts": aux["ts"],
            "extra": aux.get("extra", {}),
        }
        if vq_rule is not None:
            metrics["codebook_used"] = codebook_used

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            buffers=new_buffers,
            opt_state=new_opt_state,
            emas=new_emas,
        )
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_multi_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    ema_rate_trees: Dict[str, Any],
    steps_per_dispatch: int,
    microbatches: int = 1,
    micro_remainder: int = 0,
    vq_rule: Optional[VQUpdateRule] = None,
    donate: bool = True,
):
    """K train steps per host dispatch, as ONE jitted ``lax.scan``.

    Takes ``batches`` with a leading [K, ...] axis (see
    parallel/mesh.py::staged_global_batch_from_local) and ``rngs`` [K];
    returns the state after K steps plus metrics stacked [K, ...]. Every
    host round-trip — dispatch, Python step overhead, metric fetch — is
    amortized over K optimizer updates, the standard TPU mitigation for
    dispatch jitter on a tunnelled/remote runtime. Step semantics are
    bit-identical to K sequential single-step dispatches: the scan body IS
    the single-step program, each slice seeing its own batch and the same
    per-global-step fold_in rng stream the K=1 path uses.
    """
    assert steps_per_dispatch > 1, "use make_train_step for K=1"
    step = make_train_step(
        loss_fn, tx, ema_rate_trees,
        microbatches=microbatches, micro_remainder=micro_remainder,
        vq_rule=vq_rule, jit=False,
    )

    def multi_step(state: TrainState, batches, rngs, ctx=None):
        def body(st, inp):
            rng_k, batch_k = inp
            return step(st, batch_k, rng_k, ctx)

        return jax.lax.scan(body, state, (rngs, batches))

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())
