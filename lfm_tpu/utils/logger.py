"""Metric logging: stdout + CSV + JSONL key-value writers.

TPU-native replacement for the reference's observability layer — the
print-based loop logging (reference train_flow_latent.py:158-170), the FID
text log (test_flow_latent_ddp.py:152-153), and the vendored-but-dormant
OpenAI-baselines KV logger (models/guided_diffusion/logger.py:26-236) — in
one small writer with logkv/dumpkvs semantics.
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time
from typing import Any, Dict, Optional, TextIO


class MetricLogger:
    """Accumulate key-values per step, dump to human/CSV/JSONL sinks."""

    def __init__(self, log_dir: Optional[str] = None, stdout: bool = True):
        self.kv: Dict[str, Any] = {}
        self._counts: Dict[str, int] = {}
        self.stdout = stdout
        self.log_dir = log_dir
        self._csv: Optional[TextIO] = None
        self._csv_writer = None
        self._csv_keys = None
        self._jsonl: Optional[TextIO] = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def logkv(self, key: str, value) -> None:
        self.kv[key] = value

    def logkv_mean(self, key: str, value) -> None:
        """Running mean within the current dump window
        (reference logger.py:214-222)."""
        n = self._counts.get(key, 0)
        old = self.kv.get(key, 0.0)
        self.kv[key] = (old * n + float(value)) / (n + 1)
        self._counts[key] = n + 1

    def dumpkvs(self, step: Optional[int] = None) -> Dict[str, Any]:
        out = dict(self.kv)
        if step is not None:
            out["step"] = step
        out["time"] = time.time()
        if self.stdout:
            keys = [k for k in out if k != "time"]
            msg = " | ".join(
                f"{k} {out[k]:.5g}" if isinstance(out[k], float) else f"{k} {out[k]}"
                for k in keys
            )
            print(msg, flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps(out, default=float) + "\n")
            self._jsonl.flush()
        if self.log_dir:
            self._write_csv(out)
        self.kv.clear()
        self._counts.clear()
        return out

    def _write_csv(self, row: Dict[str, Any]) -> None:
        path = os.path.join(self.log_dir, "progress.csv")
        keys = sorted(row)
        if self._csv is None or keys != self._csv_keys:
            # (re)write with the union of keys, like the baselines CSV writer
            old_rows = []
            if os.path.exists(path):
                with open(path) as f:
                    old_rows = list(csv.DictReader(f))
            if self._csv:
                self._csv.close()
            all_keys = sorted(set(keys) | {k for r in old_rows for k in r})
            self._csv = open(path, "w", newline="")
            self._csv_writer = csv.DictWriter(self._csv, fieldnames=all_keys)
            self._csv_keys = all_keys
            self._csv_writer.writeheader()
            for r in old_rows:
                self._csv_writer.writerow(r)
        self._csv_writer.writerow({k: row.get(k, "") for k in self._csv_keys})
        self._csv.flush()

    def close(self):
        if self._csv:
            self._csv.close()
        if self._jsonl:
            self._jsonl.close()


_GLOBAL: Optional[MetricLogger] = None


def configure_logger(log_dir: Optional[str] = None) -> MetricLogger:
    global _GLOBAL
    _GLOBAL = MetricLogger(log_dir)
    return _GLOBAL
