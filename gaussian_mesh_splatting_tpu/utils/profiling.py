"""Tracing / profiling utilities — the TPU equivalent of the reference's
CUDA-event iteration timing (train.py:54-81, SURVEY.md §5.1): host wall
timers around blocking steps plus optional XProf trace capture via
jax.profiler for kernel-level inspection."""
from __future__ import annotations

import contextlib
import json
import time


class StepTimer:
    """Exponential-moving-average step timer (host-side)."""

    def __init__(self, beta: float = 0.9):
        self.beta = beta
        self.ema_ms: float | None = None
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = (time.perf_counter() - self._t0) * 1000
        self.ema_ms = dt if self.ema_ms is None else (
            self.beta * self.ema_ms + (1 - self.beta) * dt
        )
        return False


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture an XProf/TensorBoard trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """JSONL metrics sink + optional TensorBoard writer (the reference's
    SummaryWriter usage, train.py:183-223, behind the same import guard)."""

    def __init__(self, model_path: str, tensorboard: bool = True):
        import os

        self.jsonl = open(os.path.join(model_path, "metrics.jsonl"), "a")
        self.tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(model_path)
            except Exception:
                print("Tensorboard not available: not logging progress")

    def scalar(self, tag: str, value: float, step: int) -> None:
        self.jsonl.write(json.dumps({"step": step, tag: float(value)}) + "\n")
        if self.tb is not None:
            self.tb.add_scalar(tag, float(value), step)

    def image(self, tag: str, img, step: int) -> None:
        if self.tb is not None:
            import numpy as np

            self.tb.add_image(tag, np.asarray(img).transpose(2, 0, 1), step)

    def histogram(self, tag: str, values, step: int) -> None:
        if self.tb is not None:
            import numpy as np

            self.tb.add_histogram(tag, np.asarray(values), step)

    def flush(self) -> None:
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.flush()

    def close(self) -> None:
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
