"""Profiling: the TPU-native replacement for the reference's wall-clock
printfs (ggml_time_us around model load, main.cpp:5073-5093).

- ``trace``: context manager around ``jax.profiler.trace`` producing a
  TensorBoard-loadable trace (set TORTOISE_TRACE_DIR or pass a dir).
- ``StageTimer``: lightweight named wall-clock sections with a summary.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Profile the enclosed block with jax.profiler when a directory is
    configured; no-op otherwise."""
    log_dir = log_dir or os.environ.get("TORTOISE_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.monotonic() - t0
            )

    def summary(self) -> str:
        total = sum(self.times.values())
        parts = [f"{k}={v:.3f}s" for k, v in self.times.items()]
        return ", ".join(parts) + f" (total {total:.3f}s)"
