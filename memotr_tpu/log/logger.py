"""Rank-0 logging + sliding-window metrics.

Capability-equivalent of the reference's ``log/logger.py`` (console + txt +
yaml/json writers, TensorBoard) and ``log/log.py`` (``Value`` sliding-window
averages with cross-rank sync).  TensorBoard is optional (flax/tensorboardX
may be absent); scalars are additionally appended to a JSONL file that any
dashboard can tail.  Cross-process metric sync uses
``multihost_utils.process_allgather`` when a multi-host JAX runtime is
initialized — the XLA-native replacement for ``all_gather_object``
(log/log.py:27-36).
"""
from __future__ import annotations

import json
import os
from collections import defaultdict, deque
from typing import Dict, Optional

import numpy as np
import yaml


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


class Value:
    """Sliding window (100) + global average (log/log.py:11-56)."""

    def __init__(self, window_size: int = 100):
        self.window = deque(maxlen=window_size)
        self.total_sum = 0.0
        self.total_count = 0

    def update(self, value: float):
        v = float(value)
        self.window.append(v)
        self.total_sum += v
        self.total_count += 1

    @property
    def avg(self) -> float:
        return float(np.mean(self.window)) if self.window else 0.0

    @property
    def global_avg(self) -> float:
        return self.total_sum / max(1, self.total_count)


class MetricLog:
    def __init__(self):
        self.metrics: Dict[str, Value] = defaultdict(Value)

    def update(self, name: str, value: float):
        self.metrics[name].update(value)

    def sync(self):
        """Cross-host metric averaging (replaces all_gather_object)."""
        import jax
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils
        names = sorted(self.metrics)
        local = np.asarray(
            [[self.metrics[n].total_sum, self.metrics[n].total_count]
             for n in names], np.float64)
        gathered = multihost_utils.process_allgather(local)
        for i, n in enumerate(names):
            self.metrics[n].total_sum = float(gathered[..., i, 0].sum())
            self.metrics[n].total_count = int(gathered[..., i, 1].sum())

    def __str__(self):
        return ", ".join(f"{k}={v.avg:.4f}" for k, v in
                         sorted(self.metrics.items()))


class Logger:
    def __init__(self, logdir: str, only_main: bool = True):
        self.logdir = logdir
        self.enabled = (not only_main) or is_main_process()
        if self.enabled:
            os.makedirs(logdir, exist_ok=True)

    def show(self, head: str = "", log=None):
        if not self.enabled:
            return
        print(f"{head} {log if log is not None else ''}".strip(), flush=True)

    def write(self, log, filename: str = "log.txt", mode: str = "a",
              head: str = ""):
        if not self.enabled:
            return
        path = os.path.join(self.logdir, filename)
        with open(path, mode) as f:
            if filename.endswith(".yaml"):
                yaml.dump(log, f, allow_unicode=True)
            elif filename.endswith((".json", ".jsonl")):
                f.write(json.dumps(log) + "\n")
            else:
                f.write(f"{head} {log}\n")

    def scalars(self, tag_values: Dict[str, float], step: int,
                mode: str = "iters"):
        """Append scalars to a JSONL stream (TensorBoard replacement)."""
        if not self.enabled:
            return
        rec = {"step": step, "mode": mode}
        rec.update({k: float(v) for k, v in tag_values.items()})
        self.write(rec, filename="scalars.jsonl", mode="a")

    def metric_log(self, log: MetricLog, step: int, mode: str = "iters"):
        self.scalars({k: v.avg for k, v in log.metrics.items()}, step, mode)
