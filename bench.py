"""Sampling-throughput benchmark for the flagship model.

Measures generated audio throughput (waveform samples/sec/chip) for 50-step
DDPM sampling with the unet64-class predictor (~50M params) — the headline
configuration of BASELINE.md — and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the PyTorch reference running the same
50-step unet64 sampling on this host's CPU (measured with
scripts/measure_reference_cpu.py; see BASELINE_CPU_SAMPLES_PER_SEC below).
"""

import json
import os
import subprocess
import sys
import time

# NOTE: jax is imported inside main(), after the backend probe — when the
# axon tunnel is down, `import jax` itself hangs forever in PJRT client
# init (the sitecustomize hook), which is how the round-2 bench became an
# unparseable rc=124. The probe bounds that failure mode and turns it into
# a parseable JSON record instead.

# Reference (torch CPU, this host) throughput for 50-step unet64 sampling,
# in generated waveform samples per second. Measured via
# scripts/measure_reference_cpu.py on 2026-08-16: 2.17 s per predictor
# forward (batch 1, 4 s clip) -> 108.6 s per 50-step sample -> 589.4
# samples/sec.
BASELINE_CPU_SAMPLES_PER_SEC = 589.4

SAMPLE_LEN = 64000
STEPS = 50
BATCH = 16  # throughput saturates at batch >= 16 on v5e
REPEATS = 2


QUEUE_LOCK = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "runs", "tpu_queue.lock"
)


def _proc_descendants(root_pid: int) -> list:
    """root_pid plus every live descendant, via /proc ppid links.

    Ancestry-based (never name/pattern-based) so it can only ever touch the
    measurement queue's own process tree.
    """
    children = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(int(d))
    out, stack = [], [root_pid]
    while stack:
        p = stack.pop()
        out.append(p)
        stack.extend(children.get(p, []))
    return out


def take_chip_from_queue() -> None:
    """If scripts/tpu_queue.sh holds the chip, terminate it by PID.

    The official driver-run headline must not share the chip with a
    background measurement drain (contention would corrupt the number).
    Queue steps are idempotent + done-marker resumable, so killing the
    drain mid-step only reruns that step on the next launch. Skipped when
    we ARE the queue's own headline step (VVS_TPU_QUEUE set).
    """
    if os.environ.get("VVS_TPU_QUEUE"):
        return
    try:
        with open(QUEUE_LOCK) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return
    import signal

    try:
        os.kill(pid, 0)
    except OSError:  # stale lock from a dead queue
        try:
            os.remove(QUEUE_LOCK)
        except OSError:
            pass
        return
    print(f"bench: terminating tpu_queue (pid {pid}) for a quiet chip; "
          "its steps are resumable", file=sys.stderr)
    procs = _proc_descendants(pid)
    for p in procs:
        try:
            os.kill(p, signal.SIGTERM)
        except OSError:
            pass
    time.sleep(5)
    for p in procs:
        try:
            os.kill(p, signal.SIGKILL)
        except OSError:
            pass
    try:
        os.remove(QUEUE_LOCK)
    except OSError:
        pass
    time.sleep(10)  # let the tunnel drop the queue's in-flight programs


def rearm_queue() -> None:
    """Relaunch the measurement queue after the headline run.

    Round-3 failure mode: the round-boundary bench killed the in-flight
    queue (correct — quiet chip) but nothing restarted it, so the
    remaining steps (the 10k quality protocol) never ran. Every queue
    step is done-marker/artifact resumable, so an unconditional detached
    relaunch is safe: a finished queue exits in seconds.
    """
    if os.environ.get("VVS_TPU_QUEUE") or os.environ.get("VVS_NO_REQUEUE"):
        return
    root = os.path.dirname(os.path.abspath(__file__))
    script = os.path.join(root, "scripts", "tpu_queue.sh")
    if not os.path.exists(script) or os.path.exists(QUEUE_LOCK):
        return  # no queue, or one is already live
    print("bench: re-arming tpu_queue in the background", file=sys.stderr)
    subprocess.Popen(
        ["bash", script],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
        cwd=root,
    )


def backend_reachable(timeout_s: float = 150.0) -> bool:
    """Probe backend init in a subprocess so a dead tunnel cannot hang us.

    The probe also requires the TPU platform: a tunnel failure mode where
    jax silently falls back to CPU must not let the 'per-chip' headline run
    on host CPU. A deliberate CPU run (JAX_PLATFORMS=cpu in the
    environment) skips the platform requirement.
    """
    want_tpu = os.environ.get("JAX_PLATFORMS", "").lower() != "cpu"
    check = (
        "import jax; d = jax.devices(); assert d, 'no devices'; "
        + ("assert d[0].platform == 'tpu', d[0].platform" if want_tpu else "")
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", check],
            timeout=timeout_s,
            capture_output=True,
        )
        return res.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # Persistent XLA compilation cache (~4-5 min per fresh program through
    # the tunnel; re-runs hit disk). Harmless no-op where unsupported.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "runs", "jax_cache"),
    )
    os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

    import jax
    import numpy as np

    from vq_voice_swap_tpu.diffusion import make_warp
    from vq_voice_swap_tpu.diffusion_model import DiffusionModel

    # Serving configuration: bfloat16 compute (params float32). Measured
    # equal-throughput at batch 16 vs 32/64; f32 batch-4 is ~52k samples/s.
    model = DiffusionModel(
        pred_name="unet", base_channels=64, dtype="bfloat16"
    )
    variables = model.init_variables(jax.random.key(0), seq_len=SAMPLE_LEN)
    warp = make_warp("quadratic")  # the README t=s^2 eval recipe

    @jax.jit
    def sample(variables, rng):
        noise_rng, samp_rng = jax.random.split(rng)
        x_T = jax.random.normal(noise_rng, (BATCH, SAMPLE_LEN, 1))
        return model.diffusion.ddpm_sample(
            x_T,
            lambda xs, ts: model.predict_eps(variables, xs, ts),
            steps=STEPS,
            rng=samp_rng,
            warp=warp,
        )

    # Warmup / compile / device program load. NOTE: on tunneled TPU runtimes
    # block_until_ready can return early, so every sync below goes through a
    # host fetch (np.asarray), which is the only reliable barrier.
    np.asarray(sample(variables, jax.random.key(1)))

    times = []
    for i in range(REPEATS):
        start = time.perf_counter()
        np.asarray(sample(variables, jax.random.key(2 + i)))
        times.append(time.perf_counter() - start)
    elapsed = min(times)

    samples_per_sec = BATCH * SAMPLE_LEN / elapsed
    print(
        json.dumps(
            {
                "metric": "unet64 50-step sampling throughput",
                "value": round(samples_per_sec, 1),
                "unit": "audio samples/sec/chip",
                "vs_baseline": round(
                    samples_per_sec / BASELINE_CPU_SAMPLES_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    take_chip_from_queue()
    if not backend_reachable():
        print("bench: backend probe failed; retrying in 120 s",
              file=sys.stderr)
        time.sleep(120)
        if not backend_reachable():
            # Emit a PARSEABLE record of the outage rather than hanging
            # into the driver's timeout (round-2 failure mode).
            print(json.dumps({
                "metric": "unet64 50-step sampling throughput",
                "value": None,
                "unit": "audio samples/sec/chip",
                "vs_baseline": None,
                "error": "tpu backend unreachable (axon tunnel down); "
                         "last good measurement: PERF.md round 2, "
                         "221046 samples/s/chip",
            }))
            rearm_queue()  # the queue's own probe loop waits out outages
            sys.exit(0)
    try:
        try:
            main()
        except Exception as e:  # transient tunnel hiccups: retry once
            import traceback

            traceback.print_exc(file=sys.stderr)
            print(f"bench: retrying once after error: {e}", file=sys.stderr)
            time.sleep(60)
            main()
    finally:
        rearm_queue()
