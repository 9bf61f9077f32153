"""Structured run metrics: loss, rays/s, step time, grad norms.

The reference logs loss lists + tqdm and calls an out-of-repo tensorboard
writer (SURVEY.md §5); here metrics are JSON-lines on disk plus an in-memory
history — trivially greppable and plottable, no external deps.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, append: bool = False):
        """``append=True`` keeps an existing file's rows (resumed runs must
        not truncate the committed loss history — ADVICE r3)."""
        self.path = path
        self.history: List[Dict[str, Any]] = []
        if path:
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
            if not append:
                open(path, "w").close()

    def log(self, step: int, **values):
        rec = {"step": step, "time": time.time(), **{
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in values.items()}}
        self.history.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def last(self) -> Optional[Dict[str, Any]]:
        return self.history[-1] if self.history else None


class StepTimer:
    """Wall-clock + rays/s accounting for the optimization loop."""

    def __init__(self, nrays: int):
        self.nrays = nrays
        self.t0 = None
        self.elapsed = 0.0
        self.steps = 0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self.t0
        self.steps += 1

    @property
    def rays_per_sec(self) -> float:
        if self.elapsed == 0:
            return 0.0
        return self.nrays * self.steps / self.elapsed

    @property
    def sec_per_step(self) -> float:
        return self.elapsed / max(self.steps, 1)
