"""Real 2-process multi-host integration test (no mocks).

Spawns two OS processes that join one jax.distributed cluster over a
localhost coordinator (2 virtual CPU devices each -> a 4-device global
mesh), assemble a global batch with global_batch_from_local, and run one
jitted sharded train step. The parent verifies the assembled batch and the
resulting parameters against a plain single-process computation — retiring
the last mocked distributed path (parallel/mesh.py:103-122).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster_train_step(tmp_path):
    out = str(tmp_path / "result.npz")
    coord = f"localhost:{_free_port()}"

    env_base = {
        k: v for k, v in os.environ.items()
        # The axon hook would register the TPU plugin inside the workers.
        if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            MH_PROC_ID=str(pid),
            MH_NUM_PROCS="2",
            MH_COORD=coord,
            MH_OUT=out,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests",
                                              "multihost_worker.py")],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    got = np.load(out)

    # Reference: the same batch and step computed single-process in numpy.
    def host_rows(pid):
        rng = np.random.RandomState(100 + pid)
        return rng.randn(4, 3).astype(np.float32), rng.randn(4, 2).astype(
            np.float32
        )

    x0, y0 = host_rows(0)
    x1, y1 = host_rows(1)
    x = np.concatenate([x0, x1])
    y = np.concatenate([y0, y1])

    # global_batch_from_local must concatenate host slices in process order.
    np.testing.assert_array_equal(got["global_x"], x)

    w = np.full((3, 2), 0.5, np.float32)
    pred = (x @ w) * 2.0
    loss = np.mean(np.sum((pred - y) ** 2, -1))
    # d/dw mean_i sum_j (s x_i w - y_i)_j^2 = (2 s / N) x^T (pred - y), s=2
    grad = (2.0 * 2.0 / x.shape[0]) * x.T @ (pred - y)
    np.testing.assert_allclose(float(got["loss"]), loss, rtol=1e-5)
    np.testing.assert_allclose(got["w"], w - 0.1 * grad, rtol=1e-4,
                               atol=1e-6)

    # TP-across-hosts gather (the save() allgather branch): the worker
    # asserts non-addressability and round-trips the leaf collectively.
    assert os.path.exists(out + ".tp"), "tp gather section did not run"
    assert _worker_logs_contain(logs, "tp ok")

    # Startup state sync: host 0's divergent state won on every host.
    assert _worker_logs_contain(logs, "sync ok")

    # Collective Orbax checkpoint: both processes wrote their own shards
    # into one directory and restored the full tree.
    assert os.path.exists(out + ".orbax_ok"), "orbax section did not run"
    assert _worker_logs_contain(logs, "orbax ok")


def _worker_logs_contain(logs, needle):
    return all(needle in log for log in logs)
