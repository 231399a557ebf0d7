"""DataLog: append-only metric store with CSV + JSONL persistence.

Capability twin of the reference's logger (reference: mjrl/utils/logger.py
``DataLog``: ``log_kv``, ``save_log`` writing pickle + csv with a
union-of-keys header, ``get_current_log``, ``read_log``, ``shrink_to``).
Differences: persisted as JSONL (append-friendly, crash-safe) alongside the
same union-of-keys ``log.csv``; in a multi-host job only process 0 should
construct a writing logger (SURVEY.md §5.5).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Any, Dict, List, Optional


class DataLog:
    def __init__(self, log_dir: Optional[str] = None):
        self.log: Dict[str, List[Any]] = {}
        self.max_len = 0
        self.log_dir = log_dir
        self._jsonl = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "log.jsonl"), "a")

    def log_kv(self, key: str, value: Any) -> None:
        if key not in self.log:
            self.log[key] = []
        self.log[key].append(_to_python(value))
        self.max_len = max(self.max_len, len(self.log[key]))

    def log_dict(self, metrics: Dict[str, Any]) -> None:
        row = {k: _to_python(v) for k, v in metrics.items()}
        for k, v in row.items():
            self.log_kv(k, v)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(row) + "\n")
            self._jsonl.flush()

    def get_current_log(self) -> Dict[str, Any]:
        """Latest value per key (the reference's per-iteration table source)."""
        return {k: v[-1] for k, v in self.log.items() if v}

    def save_log(self, save_path: Optional[str] = None) -> None:
        """Write ``log.csv`` with a union-of-keys header (reference format).

        Rows are aligned to the END of each series (a key first logged at
        iteration k leaves k leading blanks), matching the reference's
        shorter-series handling closely enough for curve tooling.
        """
        path = save_path or self.log_dir
        assert path is not None, "no log dir configured"
        os.makedirs(path, exist_ok=True)
        keys = sorted(self.log.keys())
        with open(os.path.join(path, "log.csv"), "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=keys)
            writer.writeheader()
            for i in range(self.max_len):
                row = {}
                for k in keys:
                    series = self.log[k]
                    j = i - (self.max_len - len(series))
                    if j >= 0:
                        row[k] = series[j]
                writer.writerow(row)

    def read_log(self, log_path: str) -> None:
        """Load a previously saved log.csv (reference: read_log)."""
        self.log = {}
        with open(log_path, newline="") as f:
            for row in csv.DictReader(f):
                for k, v in row.items():
                    self.log.setdefault(k, [])
                    if v not in (None, ""):
                        try:
                            v = float(v)
                        except ValueError:
                            pass
                        self.log[k].append(v)
        self.max_len = max((len(v) for v in self.log.values()), default=0)

    def shrink_to(self, n: int) -> None:
        """Truncate every series to its first n entries (resume support)."""
        for k in self.log:
            self.log[k] = self.log[k][:n]
        self.max_len = min(self.max_len, n)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None


def _to_python(v: Any) -> Any:
    """Device scalars -> python floats/ints for serialization."""
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            return v
    return v
