"""Append-style CSV logger for per-epoch log dicts.

Same behavior as reference logging.py:14-61: resumes from an existing
file, rewrites the whole CSV with the union of all keys seen so far,
flushes at a configurable interval and at exit. Accepts python
numbers, strings, numpy scalars, and (device) arrays of size 1 --
arrays are pulled to host only here, at epoch granularity.
"""
from typing import Any, Dict

import atexit
import csv
import os

import numpy as np


class CSVLogger:
    def __init__(self, filepath: str, write_interval: int = 1) -> None:
        self._filepath = filepath
        self._write_interval = write_interval

        if os.path.isfile(filepath):
            with open(filepath, 'r') as f:
                self._rows = list(csv.DictReader(f))
        else:
            self._rows = []

        atexit.register(self.write)

    def write(self) -> None:
        unique_keys = set()
        for log in self._rows:
            unique_keys.update(list(log.keys()))

        with open(self._filepath, 'w') as f:
            writer = csv.DictWriter(f, fieldnames=sorted(unique_keys))
            writer.writeheader()
            writer.writerows(self._rows)

    def log(self, logs: Dict[str, Any]) -> None:
        row = {}
        for key, value in logs.items():
            if isinstance(value, (float, int, str)):
                row[key] = value
            elif isinstance(value, (np.generic,)):
                row[key] = value.item()
            elif hasattr(value, 'item'):  # numpy / jax arrays of size 1
                row[key] = np.asarray(value).item()
            else:
                raise NotImplementedError(
                    f"CSV logging for type: '{type(value)}' is not yet "
                    f"implemented."
                )
        self._rows.append(row)

        if 0 == (len(self._rows) - 1) % self._write_interval:
            self.write()
