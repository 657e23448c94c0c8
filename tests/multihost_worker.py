"""Worker process for the real 2-process multi-host integration test.

Launched by test_multihost_integration.py (NOT collected by pytest). Each
process owns 2 virtual CPU devices and joins a real jax.distributed cluster
over a localhost coordinator — exercising the exact code paths a TPU pod
uses (parallel/mesh.py:103-122) with no mocks: device discovery across
processes, global_batch_from_local assembly, and a jitted sharded train step.

Writes (process 0 only) an .npz with the updated params and the assembled
global batch for the parent to verify against a single-process reference.
"""

import os
import sys

proc_id = int(os.environ["MH_PROC_ID"])
num_procs = int(os.environ["MH_NUM_PROCS"])
coord = os.environ["MH_COORD"]
out_path = os.environ["MH_OUT"]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coord,
    num_processes=num_procs,
    process_id=proc_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vq_voice_swap_tpu.parallel import (  # noqa: E402
    create_mesh,
    global_batch_from_local,
    replicate,
)

assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs, jax.devices()

mesh = create_mesh()

# Each host contributes a DISTINCT, deterministic local slice (4 rows) of
# the 8-row global batch — the parent rebuilds the same batch with numpy.
rng = np.random.RandomState(100 + proc_id)
local = {
    "x": rng.randn(4, 3).astype(np.float32),
    "y": rng.randn(4, 2).astype(np.float32),
    "scale": np.float32(2.0),  # rank-0: must come back replicated
}
batch = global_batch_from_local(mesh, local)
assert batch["x"].shape == (4 * num_procs, 3), batch["x"].shape
assert batch["scale"].shape == ()

params = replicate(mesh, {"w": jnp.ones((3, 2), jnp.float32) * 0.5})


@jax.jit
def train_step(params, batch):
    def loss_fn(p):
        pred = batch["x"] @ p["w"] * batch["scale"]
        return jnp.mean(jnp.sum((pred - batch["y"]) ** 2, -1))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return jax.tree.map(lambda p, g: p - 0.1 * g, params, grads), loss


new_params, loss = train_step(params, batch)

# Fully-addressable global view for the assertion (allgather to every host).
from jax.experimental import multihost_utils  # noqa: E402

global_x = multihost_utils.process_allgather(batch["x"], tiled=True)

if proc_id == 0:
    np.savez(
        out_path,
        w=np.asarray(new_params["w"]),
        loss=float(loss),
        global_x=np.asarray(global_x),
    )

multihost_utils.sync_global_devices("done")
print(f"worker {proc_id}: ok", flush=True)

# --- TP-across-hosts checkpoint-gather mechanism (save()'s allgather
# branch): with tensor_parallel=4 over 2 hosts x 2 devices the model axis
# spans both hosts, so a model-sharded leaf is NOT fully addressable and
# host 0 must reassemble it collectively before writing — exactly what
# TrainLoop.save does.
from vq_voice_swap_tpu.parallel import create_mesh_2d, tp_shardings  # noqa: E402

mesh_tp = create_mesh_2d(2 * num_procs)
leaf = jnp.arange(16, dtype=jnp.float32).reshape(2, 8)
shardings = tp_shardings(mesh_tp, {"w": leaf})
sharded = jax.device_put(leaf, shardings["w"])
assert not sharded.is_fully_addressable, (
    "expected a cross-host model-sharded leaf"
)
gathered = multihost_utils.process_allgather(sharded, tiled=True)
np.testing.assert_array_equal(np.asarray(gathered), np.asarray(leaf))

if proc_id == 0:
    # Append to the result file the parent checks.
    with open(out_path + ".tp", "w") as f:
        f.write("tp-gather-ok\n")

multihost_utils.sync_global_devices("tp-done")
print(f"worker {proc_id}: tp ok", flush=True)

# --- Startup state sync (TrainLoop._sync_state_from_primary): hosts that
# missed the checkpoint files build DIFFERENT fresh state; host 0's must
# win on every host.
divergent = {
    "w": np.full((2, 2), float(proc_id), np.float32),  # differs per host
    "step": np.int64(1000 if proc_id == 0 else 0),
}
synced = multihost_utils.broadcast_one_to_all(divergent)
np.testing.assert_array_equal(
    np.asarray(synced["w"]), np.zeros((2, 2), np.float32)
)
assert int(synced["step"]) == 1000, synced["step"]
print(f"worker {proc_id}: sync ok", flush=True)

# --- Collective Orbax checkpoint (TrainLoop --checkpoint-format orbax):
# every process writes its own shards of a cross-host-sharded tree into
# ONE directory checkpoint; no host gathers the full state.
from vq_voice_swap_tpu.checkpoint import (  # noqa: E402
    load_checkpoint_orbax,
    save_checkpoint_orbax,
)

ckpt_dir = out_path + ".orbax"
save_checkpoint_orbax(
    ckpt_dir, "Test", {"a": 1}, {"params": {"w": sharded}}
)
multihost_utils.sync_global_devices("orbax-saved")
cls_name, kwargs, restored, _ = load_checkpoint_orbax(ckpt_dir)
assert cls_name == "Test" and kwargs == {"a": 1}
# Restore preserves the cross-host sharding: gather to compare.
restored_w = restored["params"]["w"]
if not getattr(restored_w, "is_fully_addressable", True):
    restored_w = multihost_utils.process_allgather(restored_w, tiled=True)
np.testing.assert_array_equal(np.asarray(restored_w), np.asarray(leaf))
if proc_id == 0:
    with open(out_path + ".orbax_ok", "w") as f:
        f.write("orbax-collective-ok\n")
multihost_utils.sync_global_devices("orbax-done")
print(f"worker {proc_id}: orbax ok", flush=True)
