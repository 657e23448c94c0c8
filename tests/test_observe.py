"""Tests for logger resume truncation, loss tracker, smoothing, and EMA."""

import os

import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.observe import (
    Logger,
    LossTracker,
    moving_average,
    read_log,
)
from vq_voice_swap_tpu.train.ema import (
    build_rate_tree,
    ema_update,
    lookup_longest_prefix,
)


def test_logger_roundtrip_and_resume(tmp_path):
    path = os.path.join(tmp_path, "log.txt")
    logger = Logger(path)
    logger.log(1, loss=0.5, q0=1.0)
    logger.log(2, loss=0.4)
    logger.mark_save()
    logger.log(3, loss=0.3)  # after save: should be truncated on resume
    logger.close()

    entries = list(read_log(path))
    assert [e[0] for e in entries] == [1, 2, 3]
    assert entries[0][1] == {"loss": 0.5, "q0": 1.0}

    resumed = Logger(path, resume=True)
    assert resumed.start_step == 2
    resumed.log(1, loss=0.2)  # logs as global step 3
    resumed.close()
    entries = list(read_log(path))
    assert [e[0] for e in entries] == [1, 2, 3]
    assert entries[-1][1]["loss"] == 0.2


def test_logger_resume_without_save_marker(tmp_path):
    path = os.path.join(tmp_path, "log.txt")
    logger = Logger(path)
    logger.log(1, loss=1.0)
    logger.log(2, loss=0.9)
    logger.close()
    resumed = Logger(path, resume=True)
    assert resumed.start_step == 2
    resumed.close()


def test_loss_tracker_quantiles():
    tracker = LossTracker(quantiles=4, avg_size=10)
    ts = np.asarray([0.1, 0.3, 0.6, 0.9])
    losses = np.asarray([1.0, 2.0, 3.0, 4.0])
    tracker.add(ts, losses)
    d = tracker.log_dict()
    assert d == {"q0": 1.0, "q1": 2.0, "q2": 3.0, "q3": 4.0}

    # t=1.0 lands in the last bucket (the 1e-8 backoff).
    tracker.add(np.asarray([1.0]), np.asarray([8.0]))
    assert tracker.log_dict()["q3"] == 6.0


def test_loss_tracker_window():
    tracker = LossTracker(quantiles=1, avg_size=3)
    tracker.add(np.zeros(5), np.asarray([1, 2, 3, 4, 5.0]))
    assert tracker.log_dict()["q0"] == 4.0  # mean of last 3


def test_moving_average_matches_naive():
    xs = np.random.RandomState(0).randn(50)
    for w in [1, 3, 10, 49, 50, 60]:
        got = moving_average(xs, w)
        naive = np.asarray(
            [np.mean(xs[max(0, k - w + 1):k + 1]) for k in range(len(xs))]
        )
        np.testing.assert_allclose(got, naive, rtol=1e-10, atol=1e-10)


def test_ema_prefix_lookup():
    rates = {"": 0.9, "a/b": 0.5}
    assert lookup_longest_prefix(rates, "c/d") == 0.9
    assert lookup_longest_prefix(rates, "a/b/c") == 0.5


def test_ema_update():
    params = {"w": jnp.asarray(2.0), "frozen": {"x": jnp.asarray(4.0)}}
    ema = {"w": jnp.asarray(0.0), "frozen": {"x": jnp.asarray(0.0)}}
    rates = build_rate_tree(params, {"": 0.5, "frozen": 1.0})
    out = ema_update(ema, params, rates)
    # w: 0 + (1-0.5)*(2-0) = 1. frozen/x: rate 1.0 -> unchanged.
    np.testing.assert_allclose(float(out["w"]), 1.0)
    np.testing.assert_allclose(float(out["frozen"]["x"]), 0.0)


def test_logger_readonly_resume(tmp_path):
    """write=False (non-primary hosts) must report the same resume step as
    the writing logger without touching the file."""
    from vq_voice_swap_tpu.observe import Logger

    path = str(tmp_path / "train_log.txt")
    lg = Logger(path)
    lg.log(1, loss=1.0)
    lg.log(2, loss=0.9)
    lg.mark_save()
    lg.log(3, loss=0.8)  # past the sentinel: truncated on resume
    lg.close()
    before = open(path).read()

    ro = Logger(path, resume=True, write=False)
    assert open(path).read() == before  # untouched (no truncation)
    ro.log(5, loss=0.5)  # stdout only
    ro.mark_save()
    ro.close()
    assert open(path).read() == before

    rw = Logger(path, resume=True)
    assert rw.start_step == ro.start_step == 2
    rw.close()


def test_logger_readonly_resume_missing_file(tmp_path):
    """A non-primary host without a shared filesystem has no log file to
    scan; the logger must not raise (the train loop then broadcasts the
    authoritative start_step from process 0)."""
    from vq_voice_swap_tpu.observe import Logger

    ro = Logger(str(tmp_path / "absent.txt"), resume=True, write=False)
    assert ro.start_step == 0
    ro.log(1, loss=1.0)  # stdout only; still must not create the file
    ro.close()
    assert not (tmp_path / "absent.txt").exists()


def test_logger_async_save_resume_truncates_to_marker(tmp_path):
    """Async saves: '# saving @ N' at dispatch, '# saved' confirmation
    possibly lines later. Resume must return to the newest CONFIRMED
    marker and truncate the step lines that ran past it."""
    from vq_voice_swap_tpu.observe import Logger

    path = str(tmp_path / "log.txt")
    with open(path, "w") as f:
        f.write("step 1: loss=1.0\n")
        f.write("step 2: loss=0.9\n")
        f.write("# saving @ 2\n")      # dispatched at step 2
        f.write("step 3: loss=0.8\n")  # ran ahead while files were written
        f.write("step 4: loss=0.7\n")
        f.write("# saved\n")           # confirms the step-2 checkpoint
        f.write("step 5: loss=0.6\n")

    lg = Logger(path, resume=True)
    assert lg.start_step == 2
    lg.close()
    content = open(path).read()
    # Truncated to BEFORE the marker and re-sealed with a plain sentinel:
    # a kept marker would be an unconfirmed leftover a later run's
    # '# saved' would mis-pair with, while an UNSEALED tail would let a
    # second resume rewind to an older confirmed pair.
    assert content.endswith("step 2: loss=0.9\n# saved\n")
    assert "saving" not in content
    assert "step 3" not in content and "step 5" not in content


def test_logger_async_save_unconfirmed_marker_ignored(tmp_path):
    """A crash between dispatch and the files landing leaves an unconfirmed
    marker; resume must fall back to the previous confirmed save."""
    from vq_voice_swap_tpu.observe import Logger

    path = str(tmp_path / "log.txt")
    with open(path, "w") as f:
        f.write("step 1: loss=1.0\n")
        f.write("# saving @ 1\n")
        f.write("step 2: loss=0.9\n")
        f.write("# saved\n")           # confirms step 1
        f.write("step 3: loss=0.8\n")
        f.write("# saving @ 3\n")      # never confirmed (crash)
        f.write("step 4: loss=0.7\n")

    lg = Logger(path, resume=True)
    assert lg.start_step == 1
    lg.close()
    assert open(path).read().endswith("step 1: loss=1.0\n# saved\n")


def test_logger_primary_resume_missing_file_raises(tmp_path):
    """Resuming a checkpoint whose log is missing must fail loudly: the
    step count is unknowable, and silently restarting at 0 would replay
    steps 0..N's rng draws on step-N weights."""
    import pytest

    from vq_voice_swap_tpu.observe import Logger

    with pytest.raises(RuntimeError, match="pretrained-path"):
        Logger(str(tmp_path / "absent.txt"), resume=True)


def test_logger_mark_saving_applies_start_step_offset(tmp_path):
    from vq_voice_swap_tpu.observe import Logger

    path = str(tmp_path / "log.txt")
    lg = Logger(path)
    lg.log(1, loss=1.0)
    lg.mark_saving(1)
    lg.mark_save()
    lg.close()

    lg2 = Logger(path, resume=True)
    assert lg2.start_step == 1
    lg2.log(1, loss=0.5)       # absolute step 2
    lg2.mark_saving(1)         # must tag absolute step 2
    lg2.mark_save()
    lg2.close()
    assert "# saving @ 2" in open(path).read()


def test_logger_async_save_resume_then_sync_run(tmp_path):
    """Regression: a resumed-then-continued log must not leave a stale
    unconfirmed marker behind that a LATER run's sync '# saved' would
    mis-pair with."""
    from vq_voice_swap_tpu.observe import Logger

    path = str(tmp_path / "log.txt")
    with open(path, "w") as f:
        f.write("step 1: loss=1.0\n")
        f.write("step 2: loss=0.9\n")
        f.write("# saving @ 2\n")
        f.write("step 3: loss=0.8\n")
        f.write("# saved\n")

    # Run B resumes (truncates) and continues with SYNC saves.
    lg = Logger(path, resume=True)
    assert lg.start_step == 2
    lg.log(1, loss=0.7)   # absolute step 3
    lg.log(2, loss=0.6)   # absolute step 4
    lg.mark_save()        # sync save at step 4
    lg.close()

    lg2 = Logger(path, resume=True)
    assert lg2.start_step == 4  # NOT 2: no stale marker mis-pairing
    lg2.close()


def test_logger_double_resume_after_marker_truncation(tmp_path):
    """Regression (round-3 review finding): resuming TWICE from an
    async-save log — with no new save in between — must keep landing on
    the newest confirmed step, not rewind to an older marker/sentinel
    pair whose evidence survived the first truncation."""
    from vq_voice_swap_tpu.observe import Logger

    path = str(tmp_path / "log.txt")
    with open(path, "w") as f:
        f.write("step 1: loss=1.0\n")
        f.write("# saving @ 1\n")
        f.write("step 2: loss=0.9\n")
        f.write("# saved\n")           # confirms step 1
        f.write("step 3: loss=0.8\n")
        f.write("# saving @ 3\n")
        f.write("step 4: loss=0.7\n")
        f.write("# saved\n")           # confirms step 3
        f.write("step 5: loss=0.6\n")

    lg = Logger(path, resume=True)
    assert lg.start_step == 3
    lg.close()  # killed before its next save

    lg2 = Logger(path, resume=True)
    assert lg2.start_step == 3  # NOT 1
    lg2.close()


def test_logger_threaded_writes_do_not_interleave(tmp_path):
    """mark_save() runs on the async-save worker thread while the main
    thread logs; lines must never interleave."""
    import threading

    from vq_voice_swap_tpu.observe import Logger, read_log

    path = str(tmp_path / "log.txt")
    lg = Logger(path)
    stop = threading.Event()

    def confirm_loop():
        while not stop.is_set():
            lg.mark_save()

    t = threading.Thread(target=confirm_loop, daemon=True)
    t.start()
    for i in range(200):
        lg.log(i + 1, loss=1.0 / (i + 1))
    stop.set()
    t.join()
    lg.close()
    entries = list(read_log(path))  # raises on any malformed line
    assert [e[0] for e in entries] == list(range(1, 201))
