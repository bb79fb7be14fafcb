"""Scalar metrics writer: JSONL always, TensorBoard when available.

The reference logs total loss, LR, each of the six loss components, and
val loss/AP/AP50/AP75 to TensorBoard (/root/reference/train.py:219-226,
455-459).  This writer keeps that scalar contract; the JSONL stream is the
always-available artifact (TensorBoard requires an optional dependency).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._file = open(self.path, "a")
        self._tb = None
        try:  # optional TensorBoard backend
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def write(self, step: int, scalars: Dict[str, float],
              prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}" if prefix else k
            record[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()
