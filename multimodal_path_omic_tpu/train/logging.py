"""Observability: stdout metrics, optional wandb, JSONL run log, step timing.

The reference logs per-epoch train/val loss + c-index to stdout and wandb
(reference: mcat/main.py:85-87, 101-103, 153-155, 186-215) and prints a
per-50-batch speed figure with a /32-vs-50 divisor bug (mcat/main.py:63-68 —
fixed here: the timer divides by the actual window length). wandb is optional
and import-gated; a JSONL sink always records the run for offline inspection.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(
        self,
        *,
        wandb_enabled: bool = False,
        wandb_project: str = "",
        wandb_config: Optional[Dict[str, Any]] = None,
        jsonl_path: Optional[str] = None,
        stdout: bool = True,
    ):
        self.stdout = stdout
        self._jsonl = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._jsonl = open(jsonl_path, "a")
        self._wandb = None
        if wandb_enabled:
            try:
                import wandb

                os.environ.setdefault("WANDB__SERVICE_WAIT", "300")
                wandb.init(
                    project=wandb_project,
                    settings=wandb.Settings(init_timeout=300),
                    config=wandb_config or {},
                )
                self._wandb = wandb
            except Exception as exc:  # wandb absent or offline
                print(f"wandb disabled ({exc})")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        # epochs run after finish() (e.g. ad-hoc extra training on a fitted
        # Trainer) must not crash on a finished run / closed sink
        if self._wandb is not None and getattr(self._wandb, "run", None) is not None:
            self._wandb.log(metrics, step=step)
        if self._jsonl is not None and not self._jsonl.closed:
            rec = dict(metrics)
            if step is not None:
                rec["step"] = step
            rec["time"] = time.time()
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def print(self, msg: str):
        if self.stdout:
            print(msg)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._jsonl is not None:
            self._jsonl.close()


class StepTimer:
    """Windowed steps/sec + bags/sec tracker (fixes mcat/main.py:67's divisor)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._bags = 0

    def tick(self, bags: int = 1):
        self._steps += 1
        self._bags += bags

    def rates(self):
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._steps / dt, self._bags / dt


def profile_trace(log_dir: str):
    """Context manager capturing a jax.profiler trace (TensorBoard-viewable).
    The reference has no profiler (SURVEY.md §5 'tracing')."""
    import contextlib

    import jax

    @contextlib.contextmanager
    def _ctx():
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    return _ctx()
