"""Structured metrics logging (SURVEY.md T8, aux subsystem 5).

Per-step scalars go to stdout (human) and a JSONL file (machines); an
optional TensorBoard writer (tf.summary) mirrors them when TensorFlow is
importable. Nothing here touches the device.
"""

from __future__ import annotations

import json
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, jsonl_path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None):
        self.jsonl_path = jsonl_path
        self._tb = None
        if tensorboard_dir:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception:
                self._tb = None

    def log(self, metrics: Dict[str, float]) -> None:
        step = int(metrics.get("step", 0))
        line = " ".join(
            f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in sorted(metrics.items()))
        print(f"[train] {line}", flush=True)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(metrics) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    if k != "step" and isinstance(v, (int, float)):
                        tf.summary.scalar(k, v, step=step)
            self._tb.flush()
