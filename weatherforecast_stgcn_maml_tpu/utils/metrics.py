"""Structured metrics logging.

The reference logs one CSV (`epoch,meta_loss,learning_rate`,
train_hybrid_maml_v5.py:256-304) plus print statements. We keep the same CSV
artifact for workflow parity and add a JSONL stream for arbitrary structured
metrics (per-task losses, timings, validation results).
"""

from __future__ import annotations

import json
import os
from typing import Iterable


class CsvLogger:
    def __init__(self, path: str, columns: Iterable[str]):
        self.path = path
        self.columns = list(columns)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(",".join(self.columns) + "\n")

    def log(self, **values) -> None:
        with open(self.path, "a") as f:
            f.write(",".join(str(values.get(c, "")) for c in self.columns) + "\n")


class JsonlLogger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
