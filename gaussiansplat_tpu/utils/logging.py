"""Metrics, logging, and profiling hooks.

The reference's observability is one `println("loss : $l")` (`loss.jl:69`)
and a live ImageView GUI (`train.jl:56-57`); BenchmarkTools and
ImageQualityIndexes are declared deps but never called (SURVEY §5). Here:
scalar metrics stream to stdout and an append-only JSONL file (machine
readable for dashboards), and profiling wraps `jax.profiler` so any pipeline
stage can be traced under XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import IO, Optional

import jax


class MetricLogger:
    """Streams step metrics to stdout and (optionally) a JSONL file."""

    def __init__(self, jsonl_path: Optional[str] = None, stream: Optional[IO] = None):
        # Resolve stdout lazily: binding sys.stdout at import time breaks
        # under redirected/captured output (the stream may be closed later).
        self.stream = stream
        self._file = None
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)), exist_ok=True)
            self._file = open(jsonl_path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, metrics: dict) -> None:
        scalars = {
            k: (float(v) if not isinstance(v, (str, bool)) else v)
            for k, v in metrics.items()
        }
        parts = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in scalars.items()
        )
        (self.stream or sys.stdout).write(f"[step {step}] {parts}\n")
        if self._file is not None:
            self._file.write(
                json.dumps({"step": step, "t": time.time() - self._t0, **scalars})
                + "\n"
            )

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a `jax.profiler` trace of the enclosed block for XProf /
    TensorBoard (the rebuild's answer to the reference's absent tracing,
    SURVEY §5)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate a pipeline stage in profiler timelines (usable as context
    manager or decorator)."""
    return jax.named_scope(name)
