"""Plain-text training metrics log with save markers and resume truncation.

Capability parity with /root/reference/vq_voice_swap/logger.py:7-88: lines of
the form ``step N: k=v k=v ...``, a ``# saved`` sentinel after each
checkpoint, and on resume the log is truncated back to the last sentinel so
metrics stay consistent with the restored step; ``start_step`` exposes where
the resumed run left off.

Implementation note: resume is a single forward scan that remembers the byte
offset just past the most recent sentinel and the last step number seen
before it, then truncates the file in place — the log is never rewritten.
"""

import re
from typing import Any, Dict, Iterator, TextIO, Tuple, Union

__all__ = ["Logger", "read_log", "SAVED_MSG"]

SAVED_MSG = "# saved\n"

_STEP_LINE = re.compile(r"^step (\d+): (.*)$")


def _parse_step_line(line: str) -> Tuple[int, Dict[str, float]]:
    """Parse ``step N: k=v k=v`` into (N, {k: v}); raises ValueError."""
    m = _STEP_LINE.match(line)
    if m is None:
        raise ValueError(f"not a step line: {line!r}")
    fields: Dict[str, float] = {}
    for token in m.group(2).split(" "):
        key, _, value = token.partition("=")
        if not _:
            raise ValueError(f"bad field {token!r}")
        fields[key] = float(value)
    return int(m.group(1)), fields


def read_log(
    source: Union[str, TextIO],
) -> Iterator[Tuple[int, Dict[str, Any]]]:
    """Iterate (step, {key: float}) entries of a log file.

    Comment lines (``# ...``) are skipped; iteration stops at the first
    blank line; malformed lines raise with their 1-based line number.
    """
    if isinstance(source, str):
        with open(source, "rt") as f:
            yield from read_log(f)
            return
    for line_no, raw in enumerate(source, start=1):
        stripped = raw.rstrip()
        if not stripped:
            return
        if stripped[0] == "#":
            continue
        try:
            yield _parse_step_line(stripped)
        except ValueError:
            raise ValueError(f"unexpected log format at line {line_no}")


def _scan_resume_point(path: str) -> Tuple[int, int, bool]:
    """One byte-exact pass over a log file:
    (resume_step, keep_bytes, from_marker).

    Synchronous saves write ``# saved`` right after their step line:
    ``keep_bytes`` is the offset just past the newest sentinel and
    ``resume_step`` the last step number logged before it
    (``from_marker`` False).

    Asynchronous saves (--async-save) write a ``# saving @ N`` marker at
    dispatch (step-ordered) and the plain ``# saved`` confirmation when the
    files have landed — possibly lines later. Each confirmation confirms
    the OLDEST unconfirmed marker; the resume point is the newest CONFIRMED
    marker (``from_marker`` True), truncating the step lines that ran past
    it (their state is beyond the checkpoint) and ignoring unconfirmed
    markers (crash before the files landed). The caller must append a
    plain ``# saved`` after truncating to a marker, so the kept region
    still ends in a confirmed record — otherwise a SECOND resume before
    the run's next save would pair an older marker with an older sentinel
    and rewind start_step behind the checkpoint on disk.

    If no sentinel exists, the whole file is kept (legacy logs never marked
    saves) and the final step wins.
    """
    sentinel = SAVED_MSG.encode()
    step_re = re.compile(rb"^step (\d+):")
    saving_re = re.compile(rb"^# saving @ (\d+)$")
    last_step = 0
    offset = 0
    keep = None  # (step, byte offset, from_marker) at the newest save
    pending = []  # dispatched-but-unconfirmed (step, offset) markers
    with open(path, "rb") as f:
        for raw in f:
            start = offset
            offset += len(raw)
            if raw == sentinel:
                # keep_bytes for a marker points BEFORE the marker line:
                # keeping a truncated log's trailing marker would leave an
                # unconfirmed marker that a later run's '# saved' would
                # mis-pair with.
                keep = (
                    pending.pop(0) + (True,) if pending
                    else (last_step, offset, False)
                )
                continue
            m = saving_re.match(raw.rstrip(b"\n"))
            if m is not None:
                pending.append((int(m.group(1)), start))
                continue
            m = step_re.match(raw)
            if m is not None:
                last_step = int(m.group(1))
    return keep if keep is not None else (last_step, offset, False)


class Logger:
    """Write metrics to a file and stdout; resumable with truncation."""

    def __init__(self, out_filename: str, resume: bool = False,
                 write: bool = True):
        """``write=False`` (non-primary hosts of a multi-host run) still
        scans the resume point — start_step must agree across hosts so the
        per-step rng folds match — but never touches the file."""
        import threading

        self.start_step = 0
        # Async saves confirm from a worker thread while the main thread
        # writes step lines; TextIOWrapper is not thread-safe, so all
        # writes share one lock (an interleaved line would break both
        # read_log and the resume scan).
        self._lock = threading.Lock()
        if not write:
            self.out_file = None
            if resume:
                try:
                    self.start_step, _, _ = _scan_resume_point(out_filename)
                except FileNotFoundError:
                    # No shared filesystem: host 0 owns the log. Leave 0
                    # here — TrainLoop.create_logger_tracker broadcasts
                    # start_step from process 0 so per-step rng folds stay
                    # in agreement across hosts either way.
                    pass
            return
        if not resume:
            self.out_file = open(out_filename, "w+")
            return
        try:
            step, keep_bytes, from_marker = _scan_resume_point(out_filename)
        except FileNotFoundError:
            # A checkpoint with no log means the step count is unknowable:
            # silently restarting at 0 would replay steps 0..N's rng draws
            # (noise/timesteps) on step-N weights and mislabel every later
            # log line and save marker. Fail loudly — warm starts from an
            # external checkpoint (e.g. a converted reference .pt) are what
            # --pretrained-path is for.
            raise RuntimeError(
                f"resuming from a checkpoint but its log is missing "
                f"({out_filename}); if this output dir was seeded with an "
                f"external/converted checkpoint, warm-start it via "
                f"--pretrained-path into a fresh --output-dir instead"
            )
        self.start_step = step
        self.out_file = open(out_filename, "r+")
        self.out_file.seek(keep_bytes)
        self.out_file.truncate()
        if from_marker:
            # The truncation dropped the marker + its confirmation; re-seal
            # the kept region with a plain sentinel so a second resume
            # (before this run's next save) still lands on THIS step
            # instead of pairing an older marker with an older sentinel.
            self.out_file.write(SAVED_MSG)
            self.out_file.flush()

    def log(self, step: int, **kwargs):
        fields = " ".join(f"{k}={v:.05f}" for k, v in kwargs.items())
        line = f"step {step + self.start_step}: {fields}"
        if self.out_file is not None:
            with self._lock:
                self.out_file.write(line + "\n")
                self.out_file.flush()
        print(line)

    def mark_saving(self, step: int):
        """Step-ordered dispatch marker for asynchronous saves; pair with a
        later mark_save() confirmation (see _scan_resume_point)."""
        if self.out_file is None:
            return
        with self._lock:
            self.out_file.write(f"# saving @ {step + self.start_step}\n")
            self.out_file.flush()

    def mark_save(self):
        if self.out_file is None:
            return
        with self._lock:
            self.out_file.write(SAVED_MSG)
            self.out_file.flush()

    def close(self):
        if self.out_file is not None:
            with self._lock:
                self.out_file.close()
