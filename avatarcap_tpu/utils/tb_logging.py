"""TensorBoard-compatible scalar logging next to the JSONL logs.

The reference logs TensorBoard scalars per batch and per epoch
(reference main.py:57,128,141 via torch.utils.tensorboard); the trainer
here keeps its JSONL record as the source of truth and mirrors every
scalar into TB event files when a writer implementation is available
(torch ships one in this image). Absent torch, logging degrades to
JSONL-only without error.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class ScalarLogger:
    """JSONL + (optional) TensorBoard scalar logger.

    Args:
      log_dir: directory for both the jsonl file and TB event files.
      name: jsonl file stem (e.g. 'avatar' -> avatar_loss.jsonl).
    """

    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, f"{name}_loss.jsonl")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            stamp = time.strftime("%Y_%m_%d_%H_%M_%S")  # reference main.py:55
            self._tb = SummaryWriter(
                os.path.join(log_dir, f"{name}_{stamp}"))
        except Exception:
            pass  # JSONL-only

    def log(self, scalars: Dict[str, float], step: int,
            extra: Optional[Dict] = None) -> None:
        rec = dict(extra or {})
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None
