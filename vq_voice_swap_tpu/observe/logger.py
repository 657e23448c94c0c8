"""Plain-text training metrics log with save markers and resume truncation.

Capability parity with /root/reference/vq_voice_swap/logger.py:7-88: lines of
the form ``step N: k=v k=v ...``, a ``# saved`` sentinel after each
checkpoint, and on resume the log is truncated back to the last sentinel so
metrics stay consistent with the restored step; ``start_step`` exposes where
the resumed run left off.
"""

from typing import Any, Dict, Iterator, TextIO, Tuple, Union

__all__ = ["Logger", "read_log", "SAVED_MSG"]

SAVED_MSG = "# saved\n"


def read_log(
    source: Union[str, TextIO],
) -> Iterator[Tuple[int, Dict[str, Any]]]:
    """Iterate (step, {key: float}) entries of a log file."""
    if isinstance(source, str):
        with open(source, "rt") as f:
            yield from read_log(f)
            return
    for line_idx, raw in enumerate(source, start=1):
        line = raw.rstrip()
        if not line:
            break
        if line.startswith("#"):
            continue
        try:
            if not line.startswith("step "):
                raise ValueError
            step_str, kv_str = line[len("step "):].split(": ")
            step = int(step_str)
            kvs = {}
            for pair in kv_str.split(" "):
                key, value = pair.split("=")
                kvs[key] = float(value)
        except ValueError:
            raise ValueError(f"unexpected log format at line {line_idx}")
        yield step, kvs


class Logger:
    """Write metrics to a file and stdout; resumable with truncation."""

    def __init__(self, out_filename: str, resume: bool = False):
        self.start_step = 0
        if resume:
            with open(out_filename, "rt") as f:
                lines = f.readlines()
            if SAVED_MSG in lines:
                keep = len(lines) - lines[::-1].index(SAVED_MSG)
                lines = lines[:keep]
            step_lines = [x for x in lines if x.startswith("step ")]
            if step_lines:
                self.start_step = int(
                    step_lines[-1].split(" ")[1].split(":")[0]
                )
            self.out_file = open(out_filename, "w+")
            self.out_file.write("".join(lines))
            self.out_file.flush()
        else:
            self.out_file = open(out_filename, "w+")

    def log(self, step: int, **kwargs):
        fields = " ".join(f"{k}={v:.05f}" for k, v in kwargs.items())
        line = f"step {step + self.start_step}: {fields}"
        self.out_file.write(line + "\n")
        self.out_file.flush()
        print(line)

    def mark_save(self):
        self.out_file.write(SAVED_MSG)
        self.out_file.flush()

    def close(self):
        self.out_file.close()
