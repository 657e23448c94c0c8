"""Small shared helpers (reference util.py:6-12)."""

from typing import Iterable, Iterator

__all__ = ["repeat_dataset"]


def repeat_dataset(loader: Iterable) -> Iterator:
    """Iterate a data loader forever."""
    while True:
        yield from loader
