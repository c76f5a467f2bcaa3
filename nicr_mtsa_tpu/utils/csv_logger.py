"""Epoch-log CSV sink.

Fills the role of the reference's ``logging.py`` CSVLogger: one row per
``log()`` call, resumable (an existing file is re-read so appended runs
keep earlier rows), tolerant of the key set changing between epochs (the
file is rewritten with the sorted union of all columns seen so far), and
flushed both periodically and at interpreter exit. Values may be python
scalars/strings or any host/device array of size one — device values are
fetched here, at epoch granularity, never inside the step.
"""
import atexit
import csv
import os
from typing import Any, Dict, List

import numpy as np


def _to_cell(value: Any) -> Any:
    """Coerce a log value to something csv can serialize."""
    if isinstance(value, (str, int, float)):
        return value
    if hasattr(value, 'item'):   # numpy scalar, 1-element numpy/jax array
        return np.asarray(value).item()
    raise NotImplementedError(
        f"CSV logging for type: '{type(value)}' is not yet implemented.")


class CSVLogger:
    """Append-style CSV logger over per-epoch log dicts."""

    def __init__(self, filepath: str, write_interval: int = 1) -> None:
        self._filepath = filepath
        self._write_interval = write_interval
        self._rows: List[Dict[str, Any]] = self._load_existing(filepath)
        atexit.register(self.write)

    @staticmethod
    def _load_existing(filepath: str) -> List[Dict[str, Any]]:
        if not os.path.isfile(filepath):
            return []
        with open(filepath, 'r') as f:
            return [dict(row) for row in csv.DictReader(f)]

    @property
    def _columns(self) -> List[str]:
        seen = set()
        for row in self._rows:
            seen.update(row)
        return sorted(seen)

    def log(self, logs: Dict[str, Any]) -> None:
        self._rows.append({k: _to_cell(v) for k, v in logs.items()})
        # first row always flushes so a crash right after epoch 0 still
        # leaves a file on disk
        if (len(self._rows) - 1) % self._write_interval == 0:
            self.write()

    def write(self) -> None:
        with open(self._filepath, 'w') as f:
            writer = csv.DictWriter(f, fieldnames=self._columns)
            writer.writeheader()
            writer.writerows(self._rows)
