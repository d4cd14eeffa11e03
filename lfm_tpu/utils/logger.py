"""Metric logging: stdout + CSV + JSONL + TensorBoard key-value writers.

TPU-native replacement for the reference's observability layer — the
print-based loop logging (reference train_flow_latent.py:158-170), the FID
text log (test_flow_latent_ddp.py:152-153), and the vendored-but-dormant
OpenAI-baselines KV logger (models/guided_diffusion/logger.py:26-236,
including its TensorBoardOutputFormat :110-139) — in one small writer with
logkv/dumpkvs semantics.

The TensorBoard sink has no tensorflow/tensorboard dependency: event files
are TFRecord framing (length + masked CRC-32C) around hand-encoded Event
protos (wall_time=1 double, step=2 int64, file_version=3 string,
summary=5 with Summary.Value{tag=1, simple_value=2}), readable by any
standard TensorBoard install.
"""

from __future__ import annotations

import csv
import json
import os
import socket
import struct
import sys
import time
from typing import Any, Dict, Optional, TextIO


# --------------------------------------------------------------------------
# CRC-32C (Castagnoli) + TFRecord masking — required by the event-file format
# --------------------------------------------------------------------------

_CRC32C_TABLE = []


def _crc32c_table():
    if not _CRC32C_TABLE:
        poly = 0x82F63B78  # reflected Castagnoli polynomial
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ (poly if c & 1 else 0)
            _CRC32C_TABLE.append(c)
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --------------------------------------------------------------------------
# minimal protobuf wire-format encoding for Event / Summary
# --------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _pb_double(num: int, v: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", v)


def _pb_float(num: int, v: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", v)


def _pb_varint(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _pb_bytes(num: int, v: bytes) -> bytes:
    return _field(num, 2) + _varint(len(v)) + v


def _scalar_event(wall_time: float, step: int, scalars: Dict[str, float]) -> bytes:
    summary = b"".join(
        _pb_bytes(1, _pb_bytes(1, tag.encode()) + _pb_float(2, float(v)))
        for tag, v in scalars.items()
    )
    return _pb_double(1, wall_time) + _pb_varint(2, step) + _pb_bytes(5, summary)


class TensorBoardWriter:
    """events.out.tfevents writer (no TF dependency; format per the
    TFRecord spec and event.proto/summary.proto field numbers)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        name = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self._f = open(os.path.join(log_dir, name), "ab")
        # canonical first record
        self._write(_pb_double(1, time.time()) + _pb_bytes(3, b"brain.Event:2"))

    def _write(self, record: bytes) -> None:
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc32c(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", masked_crc32c(record)))
        self._f.flush()

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        self._write(_scalar_event(time.time(), step, scalars))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self.add_scalars({tag: value}, step)

    def close(self):
        self._f.close()


class MetricLogger:
    """Accumulate key-values per step, dump to human/CSV/JSONL sinks."""

    def __init__(self, log_dir: Optional[str] = None, stdout: bool = True,
                 tensorboard: bool = False):
        self.kv: Dict[str, Any] = {}
        self._counts: Dict[str, int] = {}
        self.stdout = stdout
        self.log_dir = log_dir
        self._csv: Optional[TextIO] = None
        self._csv_writer = None
        self._csv_keys = None
        self._jsonl: Optional[TextIO] = None
        self._tb: Optional[TensorBoardWriter] = None
        self._step = 0
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if tensorboard:
                self._tb = TensorBoardWriter(os.path.join(log_dir, "tb"))

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
        if self._tb:
            scalars = {k: float(v) for k, v in out.items()
                       if isinstance(v, (int, float)) and k not in ("step", "time")}
            self._tb.add_scalars(scalars, int(out.get("step", self._step)))
        if self.log_dir:
            self._write_csv(out)
        self._step += 1
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
        if self._tb:
            self._tb.close()


_GLOBAL: Optional[MetricLogger] = None


def configure_logger(log_dir: Optional[str] = None,
                     tensorboard: bool = False) -> MetricLogger:
    global _GLOBAL
    _GLOBAL = MetricLogger(log_dir, tensorboard=tensorboard)
    return _GLOBAL
