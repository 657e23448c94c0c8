"""Template-method training loops.

Capability parity with /root/reference/vq_voice_swap/train_loop.py:28-648:
an abstract TrainLoop wiring data/model/EMA/optimizer/logger with checkpoint
discovery + resume, parameter freezing, microbatch accumulation, multi-EMA
from a comma list, run-info JSON, and six concrete loops:

  DiffusionTrainLoop        unconditional / class-conditional diffusion
  VQVAETrainLoop            the flagship VQ-VAE + diffusion trainer
  VQVAEAddClassesTrainLoop  grow the label space of a trained VQVAE
  VQVAEUncondTrainLoop      CFG fine-tuning with label/cond dropout
  ClassifierTrainLoop       noised-audio classifier with t-curriculum
  EncoderPredictorTrainLoop VQ-code predictor for guidance

TPU-first: each loop builds ONE jitted train step (microbatch scan + optimizer
+ EMA + VQ bookkeeping fused into a single XLA program, see steps.py); batches
are sharded over a data-parallel mesh; per-step host work is limited to
logging scalars.
"""

import argparse
import json
import os
import sys
import time
from abc import ABC, abstractmethod
from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..classifier_model import ClassifierModel, EncoderPredictorModel
from ..data import create_data_loader
from ..diffusion import Diffusion, make_schedule
from ..diffusion_model import DiffusionModel
from ..model_base import ModelBase
from ..observe import Logger, LossTracker
from ..parallel import (
    create_mesh,
    global_batch_from_local,
    replicate,
    staged_global_batch_from_local,
)
from ..util import repeat_dataset
from ..vq import VQLossConfig
from ..vq_vae import VQVAE
from .ema import build_rate_tree
from .state import TrainState, build_optimizer, prefix_predicate
from .steps import VQUpdateRule, make_multi_train_step, make_train_step

__all__ = [
    "TrainLoop",
    "DiffusionTrainLoop",
    "VQVAETrainLoop",
    "VQVAEAddClassesTrainLoop",
    "VQVAEUncondTrainLoop",
    "ClassifierTrainLoop",
    "EncoderPredictorTrainLoop",
]


class TrainLoop(ABC):
    """Abstract training loop; subclasses override model construction and the
    per-batch loss function."""

    def __init__(self, args=None):
        if args is None:
            args = self.arg_parser().parse_args()
        self.args = args

        os.makedirs(args.output_dir, exist_ok=True)

        # Multi-host: a no-op single-host; on a pod this makes jax.devices()
        # span all hosts BEFORE the mesh is built (and refuses to silently
        # degrade when coordinator env vars are set — parallel/mesh.py).
        from ..parallel import initialize_multihost

        initialize_multihost()
        self.is_primary = jax.process_index() == 0

        self.tensor_parallel = max(
            1, getattr(args, "tensor_parallel", 1) or 1
        )
        self.fsdp = bool(getattr(args, "fsdp", False))
        if (
            getattr(args, "async_save", False)
            and getattr(args, "checkpoint_format", "npz") == "orbax"
            and jax.process_count() > 1
        ):
            print(
                "warning: --async-save is ignored with --checkpoint-format "
                "orbax on multi-host runs (the collective save's barriers "
                "cannot run on a worker thread while the main thread issues "
                "train-step collectives)",
                file=sys.stderr,
            )
        if self.tensor_parallel > 1:
            from ..parallel import create_mesh_2d

            self.mesh = create_mesh_2d(self.tensor_parallel)
        else:
            self.mesh = create_mesh()
        # Keep the fused Pallas VQ assignment enabled under this mesh
        # (ops/vq_pallas.py runs it per-shard inside shard_map). Under a
        # 2-D data x model mesh the codebook stays replicated and the XLA
        # assignment path is used instead.
        from ..ops.vq_pallas import set_vq_mesh

        set_vq_mesh(
            self.mesh
            if self.mesh.devices.size > 1 and self.tensor_parallel == 1
            else None
        )
        self.rng_seed = getattr(args, "seed", 0)

        self.data_loader, self.num_labels = self.create_data_loader()
        self.model, self.variables, self.resume = self.create_model()

        params = self.variables["params"]
        buffers = self.variables.get("buffers", {})

        if (self.fsdp or self.tensor_parallel > 1) and jax.process_count() == 1:
            # Place params sharded BEFORE the EMA copies and Adam moments
            # are created: eager jnp.copy / optax zeros_like inherit the
            # input sharding, so startup peak per-device memory stays
            # ~1x params instead of ~4-5x — which matters exactly when
            # --fsdp exists (training state larger than one chip's HBM).
            # Multi-host keeps the late-shard order: the host-0 broadcast
            # in _sync_state_from_primary needs host-local state, and the
            # final shard_state_* pass below re-places everything anyway
            # (a no-op for leaves already holding the target sharding).
            from ..parallel import fsdp_shardings, tp_shardings

            make_shardings = fsdp_shardings if self.fsdp else tp_shardings
            params = jax.tree.map(
                jax.device_put,
                params,
                make_shardings(self.mesh, params),
            )

        self.ema_rates = [float(r) for r in args.ema_rate.split(",")]
        assert len(set(self.ema_rates)) == len(self.ema_rates), (
            "duplicate EMA rates"
        )
        emas = self.create_emas(params)

        self.tx = build_optimizer(
            params,
            lr=args.lr,
            weight_decay=args.weight_decay,
            frozen_fn=self.frozen_predicate(),
            lr_final=getattr(args, "lr_final", None),
            lr_anneal_steps=getattr(args, "lr_anneal_steps", None),
            grad_clip=getattr(args, "grad_clip", None),
        )
        opt_state = self.create_opt_state(params)

        self.state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            buffers=buffers,
            opt_state=opt_state,
            emas=emas,
        )
        self._sync_state_from_primary()
        if self.fsdp:
            from ..parallel import shard_state_fsdp

            # ZeRO-3: params/EMAs/optimizer moments STORED sharded over
            # the data axis (and the model axis too when combined with
            # --tensor-parallel); XLA all-gathers weights at use and
            # reduce-scatters grads (parallel/fsdp.py).
            self.state = shard_state_fsdp(self.mesh, self.state, self.tx)
        elif self.tensor_parallel > 1:
            from ..parallel import shard_state_tp

            # Params/EMAs/optimizer moments sharded on the model axis;
            # XLA inserts the TP collectives (parallel/tensor.py).
            self.state = shard_state_tp(self.mesh, self.state, self.tx)
        else:
            self.state = replicate(self.mesh, self.state)

        self.logger, self.tracker = self.create_logger_tracker()
        self.total_steps = self.logger.start_step
        self.loop_steps = 0

        rate_trees = {
            str(r): build_rate_tree(params, {"": r}) for r in self.ema_rates
        }
        microbatches, micro_remainder = 1, 0
        if args.microbatch and args.microbatch < args.batch_size:
            # Non-divisible batches use the reference's weighted accumulation
            # (train_loop.py:99-112): full chunks scan-accumulate, the
            # trailing partial chunk is one extra statically-shaped grad
            # call weighted by its share of the batch. --batch-size and
            # --microbatch are PER-HOST sizes; the train step sees the
            # GLOBAL batch (x process_count), so the remainder scales by
            # the host count while the chunk COUNT stays the same.
            microbatches = args.batch_size // args.microbatch
            micro_remainder = (
                args.batch_size % args.microbatch
            ) * jax.process_count()
        self.train_step = make_train_step(
            self.build_loss_fn(),
            self.tx,
            ema_rate_trees=rate_trees,
            microbatches=microbatches,
            micro_remainder=micro_remainder,
            vq_rule=self.vq_update_rule(),
        )
        self.steps_per_dispatch = max(
            1, getattr(args, "steps_per_dispatch", 1) or 1
        )
        if self.steps_per_dispatch > 1:
            # K optimizer steps per host dispatch as one lax.scan: amortizes
            # dispatch/Python/fetch round-trips (the 12% median-vs-max
            # train-throughput spread measured through the tunnel, PERF.md).
            self.multi_step = make_multi_train_step(
                self.build_loss_fn(),
                self.tx,
                ema_rate_trees=rate_trees,
                steps_per_dispatch=self.steps_per_dispatch,
                microbatches=microbatches,
                micro_remainder=micro_remainder,
                vq_rule=self.vq_update_rule(),
            )
        self.frozen_ctx = self.build_frozen_ctx()

        self.write_run_info()

    # ----------------------------------------------------------- main loop

    def loop(self, max_steps: Optional[int] = None):
        if max_steps is None:
            max_steps = getattr(self.args, "max_steps", None)
        if getattr(self.args, "profile_dir", None):
            jax.profiler.start_trace(self.args.profile_dir)
        self._pending = []
        self._last_finish = None
        try:
            if self.steps_per_dispatch > 1:
                self._loop_multi(max_steps, self.steps_per_dispatch)
            else:
                for i, batch in enumerate(repeat_dataset(self.data_loader)):
                    if max_steps is not None and i >= max_steps:
                        break
                    self.total_steps = i + self.logger.start_step
                    self.loop_steps = i
                    self.step(batch)
        finally:
            self._flush_pending()
            self.finish_pending_save()
            if getattr(self.args, "profile_dir", None):
                jax.profiler.stop_trace()

    def _loop_multi(self, max_steps: Optional[int], k_steps: int):
        """--steps-per-dispatch driver: gather K host batches, stage them as
        one [K, ...] device array, and run ONE jitted ``lax.scan`` of K
        optimizer steps (steps.py::make_multi_train_step) — every host
        round-trip is amortized over K updates. Step semantics (rng stream,
        batch order, curriculum scalars) are identical to K single-step
        dispatches; saves land on dispatch boundaries (the first boundary
        at/after each configured --save-interval). A max_steps tail that
        does not divide by K runs through the single-step program."""
        it = iter(repeat_dataset(self.data_loader))
        i = 0
        while max_steps is None or i < max_steps:
            if max_steps is not None and max_steps - i < k_steps:
                self.total_steps = i + self.logger.start_step
                self.loop_steps = i
                self.step(next(it))
                i += 1
                continue
            batches = []
            for k in range(k_steps):
                # prepare_batch hooks read self.total_steps (curriculum).
                self.total_steps = i + k + self.logger.start_step
                batches.append(self.prepare_batch(next(it)))
            self.loop_steps = i
            self._dispatch_multi(batches, i)
            i += k_steps

    def _dispatch_multi(self, batches, base_loop_step: int):
        k_steps = len(batches)
        start = self.logger.start_step
        key = jax.random.key(self.rng_seed)
        # Same per-global-step fold_in stream as the K=1 path.
        rngs = jax.vmap(lambda s: jax.random.fold_in(key, s))(
            jnp.arange(base_loop_step + start,
                       base_loop_step + start + k_steps, dtype=jnp.uint32)
        )
        device_batches = staged_global_batch_from_local(self.mesh, batches)
        dispatched = time.perf_counter()
        self.state, metrics = self.multi_step(
            self.state, device_batches, rngs, self.frozen_ctx
        )
        depth = max(1, getattr(self.args, "pipeline_depth", 1) or 1)
        pending = self._pending_queue()
        pending.append((base_loop_step, k_steps, metrics, dispatched))
        while len(pending) > depth:
            self._flush_one()
        last = base_loop_step + start + k_steps  # 1-based count after window
        if (last // self.args.save_interval
                != (last - k_steps) // self.args.save_interval):
            self._flush_pending()
            self.save()

    def step(self, batch: Dict[str, np.ndarray]):
        """Dispatch one train step; metric fetches lag dispatch by
        --pipeline-depth steps (default 1), so the per-step host work (loss
        fetch, tracker, log line, next batch prep) overlaps device compute
        instead of serialising with it. Deeper pipelines smooth per-step
        dispatch jitter (e.g. a tunnelled runtime) at the cost of metrics
        arriving that many steps late."""
        rng = jax.random.fold_in(
            jax.random.key(self.rng_seed), self.total_steps
        )
        # Per-host local batch -> global sharded batch (multi-host safe).
        device_batch = global_batch_from_local(
            self.mesh, self.prepare_batch(batch)
        )
        dispatched = time.perf_counter()
        self.state, metrics = self.train_step(
            self.state, device_batch, rng, self.frozen_ctx
        )
        depth = max(1, getattr(self.args, "pipeline_depth", 1) or 1)
        pending = self._pending_queue()
        pending.append((self.loop_steps, 1, metrics, dispatched))
        while len(pending) > depth:
            self._flush_one()
        if (self.total_steps + 1) % self.args.save_interval == 0:
            # Keep the '# saved' sentinel ordered after this step's log line.
            self._flush_pending()
            self.save()

    def _pending_queue(self):
        # getattr dance: step() is callable without going through loop()
        # (driver/tests).
        if not isinstance(getattr(self, "_pending", None), list):
            self._pending = []
        return self._pending

    def _flush_one(self):
        """Fetch + log the metrics of the OLDEST dispatched entry (blocks
        until it completes on device). An entry is one train step (K=1) or
        one K-step dispatch window whose metrics are stacked [K, ...]; the
        window logs K per-step lines sharing the dispatch-average rate."""
        loop_steps, k_steps, metrics, dispatched = self._pending.pop(0)
        if k_steps == 1:
            metrics = dict(metrics)
            loss = float(metrics["loss"])  # forces completion
            now = time.perf_counter()
            # Steady state: time between consecutive completions; first step
            # falls back to dispatch->completion (includes compile).
            baseline = getattr(self, "_last_finish", None) or dispatched
            self._last_finish = now
            metrics["samples_per_sec"] = (
                self.args.batch_size / (now - baseline)
            )
            self.log_metrics(metrics, loss=loss, step=loop_steps + 1)
            return
        metrics = jax.device_get(metrics)  # forces completion of the window
        now = time.perf_counter()
        baseline = getattr(self, "_last_finish", None) or dispatched
        self._last_finish = now
        rate = self.args.batch_size * k_steps / (now - baseline)
        for j in range(k_steps):
            m = dict(jax.tree.map(lambda v: v[j], metrics))
            m["samples_per_sec"] = rate
            self.log_metrics(m, step=loop_steps + j + 1)

    def _flush_pending(self):
        for _ in range(len(self._pending_queue())):
            self._flush_one()

    def prepare_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Hook to augment the host batch (e.g. curriculum scalars)."""
        return batch

    def log_metrics(
        self,
        metrics: Dict[str, Any],
        loss: Optional[float] = None,
        step: Optional[int] = None,
    ):
        # One D2H transfer for the scalar metrics per step.
        if loss is None:
            loss = float(metrics["loss"])
        self.tracker.add(metrics["ts"], metrics["mses"])
        other = {k: float(v) for k, v in metrics.get("extra", {}).items()}
        if "codebook_used" in metrics:
            other["codebook_used"] = float(metrics["codebook_used"])
        if "samples_per_sec" in metrics:
            other["samples_per_sec"] = float(metrics["samples_per_sec"])
        other.update(self.tracker.log_dict())
        if step is None:
            step = self.loop_steps + 1
        self.logger.log(step, loss=loss, **other)

    # ------------------------------------------------------------- plumbing

    def create_data_loader(self):
        return create_data_loader(
            directory=self.args.data_dir,
            batch_size=self.args.batch_size,
            encoding=self.args.encoding,
            # All hosts share the shuffle seed and take disjoint shards of
            # one global per-epoch permutation — a global step never sees a
            # sample twice and each epoch covers the dataset exactly once.
            # (A per-host `seed + process_index` offset would collide with
            # the per-epoch `seed + epoch` increment: host k at epoch e
            # replays host k+1's epoch e-1 permutation.)
            seed=self.rng_seed,
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
        )

    def _sync_state_from_primary(self):
        """Make host 0's freshly-built state authoritative on every host.

        On a pod WITHOUT a shared filesystem, non-primary hosts miss the
        checkpoint files: create_model/create_emas/create_opt_state would
        quietly initialize fresh weights there while host 0 resumed, and
        replicate() would then assemble a nominally replicated global
        array from DIFFERENT per-host values — silent training
        corruption. One collective broadcast at startup removes the whole
        failure mode (shared-filesystem pods broadcast identical data,
        which is merely redundant).
        """
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        self.state = multihost_utils.broadcast_one_to_all(self.state)

    def _ckpt_exists(self, path: str) -> bool:
        # <path>.new: a crash hit the commit window of an Orbax save; the
        # staging dir is complete and the loaders fall back to it.
        return os.path.exists(path) or (
            self.ckpt_ext() == "orbax" and os.path.isdir(path + ".new")
        )

    def create_model(self) -> Tuple[ModelBase, Dict[str, Any], bool]:
        if self._ckpt_exists(self.checkpoint_path()):
            print("loading from checkpoint...")
            model, variables = self.model_class().load(self.checkpoint_path())
            resume = True
        else:
            print("creating new model")
            model, variables = self.create_new_model()
            resume = False
            if self.args.pretrained_path:
                print(f"loading pretrained: {self.args.pretrained_path} ...")
                variables, n = self.load_from_pretrained(model, variables)
                print(f"loaded {n} pre-trained parameters")
        print(f"total parameters: {ModelBase.count_params(variables)}")
        return model, variables, resume

    def load_from_pretrained(self, model, variables):
        _, src_vars = ModelBase.load(self.args.pretrained_path)
        return model.load_from_pretrained(variables, src_vars)

    def create_emas(self, params) -> Dict[str, Any]:
        emas = {}
        for rate in self.ema_rates:
            path = self.ema_path(rate)
            if self._ckpt_exists(path):
                print(f"loading EMA {rate} from checkpoint...")
                _, ema_vars = ModelBase.load(path)
                emas[str(rate)] = ema_vars["params"]
            else:
                emas[str(rate)] = jax.tree.map(jnp.copy, params)
        return emas

    def create_opt_state(self, params):
        opt_state = self.tx.init(params)
        path = self.opt_path()
        if self._ckpt_exists(path):
            print("loading optimizer state from checkpoint...")
            if self.ckpt_ext() == "orbax":
                from ..checkpoint import load_tree_orbax

                restored = load_tree_orbax(
                    path, serialization.to_state_dict(opt_state)
                )
            else:
                with open(path, "rb") as f:
                    restored = serialization.msgpack_restore(f.read())
            opt_state = serialization.from_state_dict(opt_state, restored)
        return opt_state

    def create_logger_tracker(self) -> Tuple[Logger, LossTracker]:
        # Non-primary hosts read the resume step but never write the log.
        logger = Logger(
            self.log_path(), resume=self.resume, write=self.is_primary
        )
        if jax.process_count() > 1:
            # Without a shared filesystem non-primary hosts cannot scan the
            # host-0 log; make process 0 authoritative so start_step (and
            # hence the per-step rng fold) agrees everywhere.
            from jax.experimental import multihost_utils

            logger.start_step = int(
                multihost_utils.broadcast_one_to_all(
                    np.int64(logger.start_step)
                )
            )
        return logger, LossTracker()

    def frozen_predicate(self) -> Optional[Callable[[str], bool]]:
        return None

    def vq_update_rule(self) -> Optional[VQUpdateRule]:
        return None

    def build_frozen_ctx(self) -> Any:
        return None

    # -------------------------------------------------------------- saving

    def save(self):
        state = self.state
        parts = (state.params, state.emas, state.buffers, state.opt_state)
        if self.ckpt_ext() == "orbax" and (
            jax.process_count() > 1
            or not getattr(self.args, "async_save", False)
        ):
            # Sharded directory format: every process writes ITS OWN
            # shards collectively — no host-side gather (the npz path's
            # process_allgather would materialize the full FSDP/TP state
            # on every host, exactly what the format exists to avoid).
            # Multi-host saves stay synchronous: the collective's barriers
            # must not interleave with train-step collectives from the
            # --async-save worker thread. Single-process orbax has no
            # barriers (checkpoint.py::_barrier no-ops), so --async-save
            # falls through to the shared worker-thread path below — the
            # snapshot + two-phase '# saving @ N'/'# saved' sentinel and
            # the .new staging protocol give the same crash-safety as the
            # synchronous save.
            self.finish_pending_save()
            self._write_checkpoints(*parts)
            return
        if any(
            not (
                getattr(leaf, "is_fully_addressable", True)
                # Plain multi-host DP: replicated arrays are locally
                # complete (np.asarray reads the local copy) — only
                # genuinely cross-host-SHARDED leaves (multi-host TP) need
                # the collective.
                or getattr(leaf, "is_fully_replicated", False)
            )
            for leaf in jax.tree.leaves(parts)
        ):
            # Multi-host tensor parallelism: shards live on other hosts, so
            # ALL hosts reassemble collectively before host 0 writes.
            from jax.experimental import multihost_utils

            # tiled=True: reassemble each sharded global array (required —
            # and the only supported mode — for non-fully-addressable
            # inputs).
            parts = multihost_utils.process_allgather(parts, tiled=True)
        if not self.is_primary:
            return  # only host 0 persists
        if getattr(self.args, "async_save", False):
            # Snapshot so the NEXT train step's donation cannot invalidate
            # the buffers mid-write, then write on a worker thread,
            # overlapping device compute. The step-ordered '# saving @ N'
            # marker goes in NOW; the worker's '# saved' confirmation may
            # land lines later (resume truncates back to the marker —
            # observe/logger.py).
            #
            # Two snapshot placements (--async-snapshot):
            # - host (default): async-enqueue every D2H, then block until
            #   the copies land in host RAM. Costs the transfer time in
            #   the loop (the sync path pays the same D2H) but zero extra
            #   HBM; the worker hides serialization + disk I/O.
            # - device: jnp.copy keeps the snapshot on-chip and the worker
            #   overlaps the D2H too — but holds a FULL extra replica of
            #   params+EMAs+opt_state in HBM until the write finishes.
            #   Measured (PERF.md round 4): OOMs the flagship batch-16
            #   train on one v5e chip; use only with HBM headroom.
            if getattr(self.args, "async_snapshot", "host") == "device":
                parts = jax.tree.map(
                    lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                    parts,
                )
            else:
                for leaf in jax.tree.leaves(parts):
                    if isinstance(leaf, jax.Array):
                        leaf.copy_to_host_async()
                parts = jax.tree.map(
                    lambda x: (
                        np.asarray(x) if isinstance(x, jax.Array) else x
                    ),
                    parts,
                )
            self.finish_pending_save()  # one save in flight; raises if the
            # previous save failed — a silently dead worker would leave the
            # run checkpoint-less for its remaining lifetime.
            self.logger.mark_saving(self.loop_steps + 1)
            import threading

            def worker():
                try:
                    self._write_checkpoints(*parts)
                except BaseException as e:  # surfaced at the next join
                    self._save_error = e

            self._save_error = None
            self._save_thread = threading.Thread(target=worker, daemon=False)
            self._save_thread.start()
        else:
            self._write_checkpoints(*parts)

    def finish_pending_save(self):
        if getattr(self, "_save_thread", None) is not None:
            self._save_thread.join()
            self._save_thread = None
            err = getattr(self, "_save_error", None)
            if err is not None:
                self._save_error = None
                raise RuntimeError(
                    "asynchronous checkpoint save failed"
                ) from err

    def _write_checkpoints(self, params, emas, buffers, opt_state):
        variables = {"params": params}
        if jax.tree.leaves(buffers):
            variables["buffers"] = buffers
        self.model.save(self.checkpoint_path(), variables)
        for rate in self.ema_rates:
            ema_vars = {"params": emas[str(rate)]}
            if "buffers" in variables:
                ema_vars["buffers"] = buffers
            self.model.save(self.ema_path(rate), ema_vars)
        self.save_opt_state(opt_state)
        self.logger.mark_save()

    def save_opt_state(self, opt_state=None):
        if opt_state is None:
            opt_state = self.state.opt_state
        if self.ckpt_ext() == "orbax":
            from ..checkpoint import save_tree_orbax

            # Collective sharded write of the Adam moments (the bulk of
            # the training state) — no np.asarray gather.
            save_tree_orbax(
                self.opt_path(),
                serialization.to_state_dict(opt_state),
            )
            return
        state_dict = serialization.to_state_dict(
            jax.tree.map(np.asarray, opt_state)
        )
        data = serialization.msgpack_serialize(state_dict)
        tmp = self.opt_path() + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, self.opt_path())

    def ckpt_ext(self):
        fmt = getattr(self.args, "checkpoint_format", "npz") or "npz"
        return "orbax" if fmt == "orbax" else "npz"

    def checkpoint_path(self):
        return os.path.join(self.args.output_dir, f"model.{self.ckpt_ext()}")

    def ema_path(self, rate):
        return os.path.join(
            self.args.output_dir, f"model_ema_{rate}.{self.ckpt_ext()}"
        )

    def opt_path(self):
        return os.path.join(self.args.output_dir, f"opt.{self.ckpt_ext()}")

    def log_path(self):
        return os.path.join(self.args.output_dir, "train_log.txt")

    def write_run_info(self):
        if not self.is_primary:
            return
        filename = f"run_info_{int(time.time())}.json"
        info = dict(
            args=vars(self.args),
            command=sys.argv[0],
            start_steps=self.total_steps,
            num_devices=len(self.mesh.devices.flatten()),
        )
        with open(os.path.join(self.args.output_dir, filename), "w") as f:
            json.dump(info, f, indent=4)

    # ------------------------------------------------------------ abstract

    @abstractmethod
    def model_class(self):
        """The ModelBase subclass this loop trains."""

    @abstractmethod
    def create_new_model(self) -> Tuple[ModelBase, Dict[str, Any]]:
        """Build a fresh model wrapper + initialised variables."""

    @abstractmethod
    def build_loss_fn(self):
        """Return loss_fn(params, buffers, rng, batch, ctx) -> (loss, aux)."""

    @classmethod
    @abstractmethod
    def default_output_dir(cls) -> str:
        ...

    @classmethod
    def arg_parser(cls) -> argparse.ArgumentParser:
        parser = argparse.ArgumentParser(
            formatter_class=argparse.ArgumentDefaultsHelpFormatter
        )
        parser.add_argument("--lr", default=1e-4, type=float)
        parser.add_argument("--lr-final", default=None, type=float,
                            help="linearly anneal to this LR (the released "
                                 "unet64 recipe) over --lr-anneal-steps")
        parser.add_argument("--lr-anneal-steps", default=None, type=int)
        parser.add_argument("--grad-clip", default=None, type=float,
                            help="clip gradients to this global norm")
        parser.add_argument("--ema-rate", default="0.9999", type=str)
        parser.add_argument("--weight-decay", default=0.0, type=float)
        parser.add_argument("--batch-size", default=8, type=int)
        parser.add_argument("--microbatch", default=None, type=int)
        parser.add_argument("--output-dir", default=cls.default_output_dir(),
                            type=str)
        parser.add_argument("--pretrained-path", default=None, type=str)
        parser.add_argument("--save-interval", default=1000, type=int)
        parser.add_argument(
            "--grad-checkpoint", nargs="?", const="full", default=False,
            choices=["full", "convs"],
            help="rematerialize ResBlocks in the backward: 'full' (bare "
                 "flag; minimum memory, recomputes convs) or 'convs' (save "
                 "conv outputs, recompute only norm/GELU chains — less "
                 "saved-activation HBM traffic at near-zero extra FLOPs). "
                 "NOTE: the bare flag greedily consumes a following "
                 "positional argument — place it after the data dir or "
                 "write --grad-checkpoint=full")
        parser.add_argument("--encoding", default="linear", type=str)
        parser.add_argument("--seed", default=0, type=int)
        parser.add_argument("--bf16", action="store_true",
                            help="compute in bfloat16 (params stay float32)")
        parser.add_argument("--profile-dir", default=None, type=str,
                            help="write a jax.profiler trace here")
        parser.add_argument("--pipeline-depth", default=1, type=int,
                            help="how many dispatched steps metric fetches "
                                 "may lag behind; >1 smooths dispatch "
                                 "jitter (metrics arrive that many steps "
                                 "late)")
        parser.add_argument("--steps-per-dispatch", default=1, type=int,
                            help="fuse K optimizer steps into ONE jitted "
                                 "lax.scan dispatch over K staged batches; "
                                 "amortizes every host round-trip over K "
                                 "updates (saves land on K-step "
                                 "boundaries)")
        parser.add_argument("--tensor-parallel", default=1, type=int,
                            help="model-axis size of a 2-D data x model "
                                 "mesh; weights/optimizer shard on their "
                                 "output-feature axis (device count must "
                                 "be divisible)")
        parser.add_argument("--fsdp", action="store_true",
                            help="ZeRO-3: store params/EMAs/optimizer "
                                 "moments sharded over the data axis "
                                 "(per-device state memory scales 1/N); "
                                 "composes with --tensor-parallel")
        parser.add_argument("--checkpoint-format", default="npz", type=str,
                            choices=("npz", "orbax"),
                            help="npz: single-file, host-gathered; orbax: "
                                 "directory format where every process "
                                 "writes its own shards (pair with --fsdp/"
                                 "--tensor-parallel for state too large to "
                                 "gather). orbax + --async-save overlaps "
                                 "on single-host runs; multi-host orbax "
                                 "saves stay synchronous")
        parser.add_argument("--async-save", action="store_true",
                            help="write checkpoints from a worker thread, "
                                 "overlapping save I/O with training")
        parser.add_argument("--async-snapshot", default="host", type=str,
                            choices=("host", "device"),
                            help="where --async-save snapshots the state "
                                 "before the worker writes it: host (zero "
                                 "extra HBM; loop blocks only for the D2H) "
                                 "or device (worker overlaps the D2H too, "
                                 "but a full extra state replica lives in "
                                 "HBM until the write completes)")
        parser.add_argument("--max-steps", default=None, type=int,
                            help="stop after this many steps (default: run "
                                 "until killed, as the reference does)")
        parser.add_argument("data_dir", type=str)
        return parser

    # -------------------------------------------------------------- helpers

    def model_dtype(self) -> Optional[str]:
        return "bfloat16" if getattr(self.args, "bf16", False) else None


class DiffusionTrainLoop(TrainLoop):
    """Unconditional / class-conditional diffusion training
    (reference train_loop.py:299-342)."""

    def model_class(self):
        return DiffusionModel

    def create_new_model(self):
        model = DiffusionModel(
            pred_name=self.args.predictor,
            base_channels=self.args.base_channels,
            schedule_name=self.args.schedule,
            dropout=self.args.dropout,
            num_labels=self.num_labels if self.args.class_cond else None,
            dtype=self.model_dtype(),
            remat=self.args.grad_checkpoint,
        )
        variables = model.init_variables(jax.random.key(self.rng_seed))
        return model, variables

    def build_loss_fn(self):
        model = self.model
        class_cond = self.args.class_cond

        def loss_fn(params, buffers, rng, batch, ctx):
            del buffers, ctx
            x = batch["samples"][..., None]
            labels = batch["label"] if class_cond else None
            losses, ts = model.losses(
                {"params": params}, rng, x, labels=labels, train=True
            )
            return jnp.mean(losses), {"mses": losses, "ts": ts, "extra": {}}

        return loss_fn

    @classmethod
    def arg_parser(cls):
        parser = super().arg_parser()
        parser.add_argument("--predictor", default="unet", type=str)
        parser.add_argument("--base-channels", default=32, type=int)
        parser.add_argument("--dropout", default=0.0, type=float)
        parser.add_argument("--schedule", default="exp", type=str)
        parser.add_argument("--class-cond", action="store_true")
        return parser

    @classmethod
    def default_output_dir(cls):
        return "ckpt_diffusion"


class VQVAETrainLoop(DiffusionTrainLoop):
    """The flagship speaker-conversion trainer
    (reference train_loop.py:345-435)."""

    def model_class(self):
        return VQVAE

    @contextmanager
    def _pretrained_loaded(self):
        """Load --pretrained-path ONCE for the duration of create_model:
        load_from_pretrained reuses self._pretrained instead of
        re-deserialising the (potentially multi-hundred-MB) file, and the
        host copy is freed on exit. Also captures the pretrained kwargs /
        label count the label-surgery subclasses build their models from.
        """
        pretrained, pretrained_vars = VQVAE.load(self.args.pretrained_path)
        self._pretrained = (pretrained, pretrained_vars)
        self.pretrained_num_labels = pretrained.num_labels
        self.pretrained_kwargs = pretrained.save_kwargs()
        try:
            yield pretrained
        finally:
            self._pretrained = None

    def create_new_model(self):
        model = VQVAE(
            pred_name=self.args.predictor,
            base_channels=self.args.base_channels,
            enc_name=self.args.encoder,
            cond_mult=self.args.cond_mult,
            dictionary_size=self.args.dictionary_size,
            dead_rate=self.args.dead_rate,
            schedule_name=self.args.schedule,
            dropout=self.args.dropout,
            num_labels=self.num_labels if self.args.class_cond else None,
            dtype=self.model_dtype(),
            remat=self.args.grad_checkpoint,
        )
        variables = model.init_variables(jax.random.key(self.rng_seed))
        return model, variables

    def create_model(self):
        model, variables, resume = super().create_model()
        # dead_rate is a runtime knob, not a weight (reference
        # train_loop.py:375-378).
        model.dead_rate = self.args.dead_rate
        return model, variables, resume

    def load_from_pretrained(self, model, variables):
        # Accept either a VQVAE or a bare DiffusionModel checkpoint
        # (reference train_loop.py:414-423): the predictor subtree intersects
        # either way.
        src_model, src_vars = ModelBase.load(self.args.pretrained_path)
        if isinstance(src_model, VQVAE) or isinstance(src_model, DiffusionModel):
            return model.load_from_pretrained(variables, src_vars)
        raise ValueError(
            f"unsupported pretrained model: {type(src_model).__name__}"
        )

    def vq_loss_config(self) -> VQLossConfig:
        return VQLossConfig(
            commitment=self.args.commitment_coeff,
            revival=self.args.revival_coeff,
        )

    def build_loss_fn(self):
        model = self.model
        class_cond = self.args.class_cond
        vq_cfg = self.vq_loss_config()
        jitter = self.args.jitter

        def loss_fn(params, buffers, rng, batch, ctx):
            del ctx
            x = batch["samples"][..., None]
            labels = batch["label"] if class_cond else None
            out = model.losses(
                {"params": params, "buffers": buffers},
                rng,
                x,
                labels=labels,
                vq_loss_cfg=vq_cfg,
                jitter=jitter,
                train=True,
            )
            total = out["mse"] + out["vq_loss"]
            return total, {
                "mses": out["mses"],
                "ts": out["ts"],
                "extra": {"vq_loss": out["vq_loss"]},
                "idxs": out["idxs"],
                "used": out["used"],
                "enc_flat": out["enc_flat"],
            }

        return loss_fn

    def frozen_predicate(self):
        prefixes = []
        if self.args.freeze_encoder:
            prefixes.append("encoder")
        if self.args.freeze_vq:
            prefixes.append("vq")
        return prefix_predicate(prefixes) if prefixes else None

    def should_revive(self) -> bool:
        return not self.args.revival_coeff and not self.args.freeze_vq

    def vq_update_rule(self):
        return VQUpdateRule(
            dead_rate=self.args.dead_rate, revive=self.should_revive()
        )

    @classmethod
    def arg_parser(cls):
        parser = super().arg_parser()
        parser.add_argument("--encoder", default="unet", type=str)
        parser.add_argument("--cond-mult", default=16, type=int)
        parser.add_argument("--dictionary-size", default=512, type=int)
        parser.add_argument("--freeze-encoder", action="store_true")
        parser.add_argument("--freeze-vq", action="store_true")
        parser.add_argument("--commitment-coeff", default=0.25, type=float)
        parser.add_argument("--revival-coeff", default=0.0, type=float)
        parser.add_argument("--dead-rate", default=100, type=int)
        parser.add_argument("--jitter", default=0.0, type=float)
        return parser

    @classmethod
    def default_output_dir(cls):
        return "ckpt_vqvae"


class VQVAEAddClassesTrainLoop(VQVAETrainLoop):
    """Fine-tune only fresh label embeddings on new speakers
    (reference train_loop.py:438-485)."""

    def __init__(self, args=None):
        self.pretrained_kwargs = None
        self.pretrained_num_labels = None
        super().__init__(args)
        assert self.args.class_cond, "must train a class-conditional model"

    def create_model(self):
        assert self.args.pretrained_path, "must load from a pre-trained VQVAE"
        assert self.args.class_cond, "must create a class-conditional model"
        with self._pretrained_loaded():
            return super().create_model()

    def create_new_model(self):
        kwargs = dict(self.pretrained_kwargs)
        kwargs["num_labels"] = self.num_labels + self.pretrained_num_labels
        model = VQVAE(**kwargs)
        variables = model.init_variables(jax.random.key(self.rng_seed))
        return model, variables

    def load_from_pretrained(self, model, variables):
        base_model, base_vars = self._pretrained
        base_model, base_vars = base_model.add_labels(
            base_vars, self.num_labels
        )
        return model.load_from_pretrained(variables, base_vars)

    def prepare_batch(self, batch):
        batch = dict(batch)
        batch["label"] = batch["label"] + self.pretrained_num_labels
        return batch

    def frozen_predicate(self):
        # Freeze everything except the label embeddings.
        label_paths = set(self.model.label_parameter_paths(self.variables))

        def pred(path: str) -> bool:
            return path not in label_paths

        return pred

    def should_revive(self):
        # Preserve the codebook for the original classes
        # (reference train_loop.py:477-481).
        return False

    @classmethod
    def default_output_dir(cls):
        return "ckpt_vqvae_added"


class VQVAEUncondTrainLoop(VQVAETrainLoop):
    """Fine-tune for classifier-free guidance: label dropout to class 0 and
    per-sequence cond dropout (reference train_loop.py:488-543)."""

    def __init__(self, args=None):
        self.pretrained_kwargs = None
        self.pretrained_num_labels = None
        super().__init__(args)
        assert self.args.class_cond

    def create_model(self):
        assert self.args.pretrained_path, "must load from a pre-trained VQVAE"
        assert self.args.class_cond, "must create a class-conditional model"
        with self._pretrained_loaded():
            # flax nn.Embed clamps out-of-range indices inside jit (unlike
            # the reference's torch nn.Embedding, which crashes): extra
            # dataset speakers would otherwise all silently train the last
            # row.
            assert self.num_labels <= self.pretrained_num_labels, (
                f"dataset has {self.num_labels} speakers but the "
                f"pretrained VQVAE knows {self.pretrained_num_labels}; "
                f"grow the label space with train_vqvae_add.py first"
            )
            return super().create_model()

    def create_new_model(self):
        kwargs = dict(self.pretrained_kwargs)
        kwargs["num_labels"] = self.pretrained_num_labels + 1
        model = VQVAE(**kwargs)
        variables = model.init_variables(jax.random.key(self.rng_seed))
        return model, variables

    def load_from_pretrained(self, model, variables):
        base_model, base_vars = self._pretrained
        # New unconditional label goes at the *beginning*
        # (reference train_loop.py:529-532).
        base_model, base_vars = base_model.add_labels(base_vars, 1, end=False)
        return model.load_from_pretrained(variables, base_vars)

    def build_loss_fn(self):
        model = self.model
        vq_cfg = self.vq_loss_config()
        jitter = self.args.jitter
        no_class_prob = self.args.no_class_prob
        no_vq_prob = self.args.no_vq_prob

        def loss_fn(params, buffers, rng, batch, ctx):
            del ctx
            rng, mask_rng = jax.random.split(rng)
            x = batch["samples"][..., None]
            keep = (
                jax.random.uniform(mask_rng, batch["label"].shape)
                > no_class_prob
            )
            labels = (batch["label"] + 1) * keep.astype(batch["label"].dtype)
            out = model.losses(
                {"params": params, "buffers": buffers},
                rng,
                x,
                labels=labels,
                vq_loss_cfg=vq_cfg,
                jitter=jitter,
                no_vq_prob=no_vq_prob,
                train=True,
            )
            total = out["mse"] + out["vq_loss"]
            return total, {
                "mses": out["mses"],
                "ts": out["ts"],
                "extra": {"vq_loss": out["vq_loss"]},
                "idxs": out["idxs"],
                "used": out["used"],
                "enc_flat": out["enc_flat"],
            }

        return loss_fn

    @classmethod
    def arg_parser(cls):
        parser = super().arg_parser()
        parser.add_argument("--no-class-prob", default=0.1, type=float)
        parser.add_argument("--no-vq-prob", default=0.1, type=float)
        return parser

    @classmethod
    def default_output_dir(cls):
        return "ckpt_vqvae_uncond"


class _CurriculumMixin:
    """Timestep curriculum ts**power annealed from curriculum_start to 1 over
    curriculum_steps (reference train_loop.py:563-569)."""

    def curriculum_power(self) -> float:
        if self.total_steps < self.args.curriculum_steps:
            frac = self.total_steps / self.args.curriculum_steps
            return self.args.curriculum_start * (1 - frac) + frac
        return 1.0

    def prepare_batch(self, batch):
        batch = dict(batch)
        # Traced scalar: changing the power never recompiles the step.
        batch["ts_power"] = np.asarray(self.curriculum_power(), np.float32)
        return batch


class ClassifierTrainLoop(_CurriculumMixin, TrainLoop):
    """Train the noised-audio classifier (reference train_loop.py:546-594)."""

    def model_class(self):
        return ClassifierModel

    def create_new_model(self):
        model = ClassifierModel(
            num_labels=self.num_labels,
            base_channels=self.args.base_channels,
            dtype=self.model_dtype(),
        )
        variables = model.init_variables(jax.random.key(self.rng_seed))
        return model, variables

    def load_from_pretrained(self, model, variables):
        src_model, src_vars = ModelBase.load(self.args.pretrained_path)
        assert isinstance(src_model, DiffusionModel)
        return model.load_from_predictor(
            variables, src_vars["params"]["predictor"]
        )

    def build_loss_fn(self):
        model = self.model
        diffusion = Diffusion(make_schedule(self.args.schedule))

        def loss_fn(params, buffers, rng, batch, ctx):
            del buffers, ctx
            t_rng, n_rng = jax.random.split(rng)
            x = batch["samples"][..., None]
            labels = batch["label"]
            ts = jax.random.uniform(t_rng, (x.shape[0],)) ** batch["ts_power"]
            noise = jax.random.normal(n_rng, x.shape, dtype=x.dtype)
            samples = diffusion.sample_q(x, ts, epsilon=noise)
            logits = model.logits({"params": params}, samples, ts)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nlls = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            return jnp.mean(nlls), {"mses": nlls, "ts": ts, "extra": {}}

        return loss_fn

    @classmethod
    def arg_parser(cls):
        parser = super().arg_parser()
        parser.add_argument("--base-channels", default=32, type=int)
        parser.add_argument("--schedule", default="exp", type=str)
        parser.add_argument("--curriculum-start", default=30.0, type=float)
        parser.add_argument("--curriculum-steps", default=0, type=int)
        return parser

    @classmethod
    def default_output_dir(cls):
        return "ckpt_classifier"


class EncoderPredictorTrainLoop(_CurriculumMixin, TrainLoop):
    """Train the VQ-code predictor against a frozen VQ-VAE
    (reference train_loop.py:597-648)."""

    def __init__(self, args=None):
        self.vq_vae = None
        self.vq_vae_vars = None
        super().__init__(args)

    def model_class(self):
        return EncoderPredictorModel

    def create_model(self):
        self.vq_vae, self.vq_vae_vars = VQVAE.load(self.args.vq_vae_path)
        return super().create_model()

    def create_new_model(self):
        model = EncoderPredictorModel(
            base_channels=self.args.base_channels,
            downsample_rate=self.vq_vae.encoder.downsample_rate,
            num_latents=self.vq_vae.dictionary_size,
            dtype=self.model_dtype(),
        )
        variables = model.init_variables(jax.random.key(self.rng_seed))
        return model, variables

    def build_frozen_ctx(self):
        # The frozen VQ-VAE rides along as a traced pytree argument.
        return replicate(self.mesh, self.vq_vae_vars)

    def build_loss_fn(self):
        model = self.model
        vq_vae = self.vq_vae

        def loss_fn(params, buffers, rng, batch, ctx):
            del buffers
            t_rng, n_rng = jax.random.split(rng)
            x = batch["samples"][..., None]
            ts = jax.random.uniform(t_rng, (x.shape[0],)) ** batch["ts_power"]
            targets = jax.lax.stop_gradient(vq_vae.encode(ctx, x))
            noise = jax.random.normal(n_rng, x.shape, dtype=x.dtype)
            samples = vq_vae.diffusion.sample_q(x, ts, epsilon=noise)
            losses = model.losses({"params": params}, samples, ts, targets)
            return jnp.mean(losses), {"mses": losses, "ts": ts, "extra": {}}

        return loss_fn

    @classmethod
    def arg_parser(cls):
        parser = super().arg_parser()
        parser.add_argument("--vq-vae-path", type=str, required=True)
        parser.add_argument("--base-channels", type=int, default=32)
        parser.add_argument("--curriculum-start", default=30.0, type=float)
        parser.add_argument("--curriculum-steps", default=0, type=int)
        return parser

    @classmethod
    def default_output_dir(cls):
        return "ckpt_enc_pred"
