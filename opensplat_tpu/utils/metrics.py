"""Structured training metrics + profiling hooks.

The reference's observability is stdout-only (loss every displayStep,
opensplat.cpp:163-166; densify counts, model.cpp:422,460,478). This module
is the richer TPU-native replacement planned in SURVEY.md §5: per-step
structured records (JSONL), rolling steps/s and Mpix/s counters, refine
event records, and a jax.profiler trace context for device timelines.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque
from typing import Optional


class MetricsLogger:
    """Rolling-window throughput counters + optional JSONL sink.

    Call step(...) once per training step; refine(...) after each refine
    event. steps_per_sec / mpix_per_sec are computed over the last
    `window` steps of wall time.
    """

    def __init__(self, jsonl_path: str = "", window: int = 50):
        self._path = jsonl_path
        self._f = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._f = open(jsonl_path, "a", buffering=1)
        self._times: deque = deque(maxlen=window + 1)
        self._pixels: deque = deque(maxlen=window)
        self.last_record: Optional[dict] = None

    def tick(self, height: int, width: int):
        """Advance the throughput counters without reading any values
        (keeps the hot loop free of device syncs)."""
        self._times.append(time.perf_counter())
        self._pixels.append(height * width)

    def step(self, step: int, loss: float, psnr: float, n_alive: int,
             height: int, width: int, extra: Optional[dict] = None,
             tick: bool = True) -> dict:
        if tick:
            self._times.append(time.perf_counter())
            self._pixels.append(height * width)
        rec = {
            "type": "step",
            "step": step,
            "loss": round(float(loss), 6),
            "psnr": round(float(psnr), 3),
            "n_gaussians": int(n_alive),
            "steps_per_sec": round(self.steps_per_sec(), 3),
            "mpix_per_sec": round(self.mpix_per_sec(), 3),
        }
        if extra:
            rec.update(extra)
        self.last_record = rec
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
        return rec

    def refine(self, step: int, counts: dict) -> dict:
        rec = {"type": "refine", "step": step, **{k: int(v) for k, v in counts.items()}}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
        return rec

    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0

    def mpix_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        n = min(len(self._pixels), len(self._times) - 1)
        px = sum(list(self._pixels)[-n:])
        return px / dt / 1e6 if dt > 0 else 0.0

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


@contextlib.contextmanager
def profile_trace(log_dir: str = ""):
    """jax.profiler trace context; no-op when log_dir is empty.

    View with tensorboard / xprof pointed at log_dir.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
