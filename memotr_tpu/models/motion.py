"""Post-hoc linear motion extrapolation (off by default, USE_MOTION).

Behavioral spec: ``/root/reference/models/motion.py:6-28`` and its wiring in
``submit_engine.py:78-87``: each track keeps a ring buffer of its last <= 5
observed boxes; a disappeared track's reference points are extrapolated by
the mean per-frame box delta times the miss length, blended with
``MOTION_LAMBDA``.  The reference notes it is unused in the final models; we
keep it host-side (numpy) since it only runs on the streaming path for
disappeared tracks.
"""
from __future__ import annotations

from collections import deque
from typing import Dict, Optional

import numpy as np


class Motion:
    def __init__(self, min_record_length: int = 3, max_record_length: int = 5):
        self.min_record_length = min_record_length
        self.boxes: deque = deque(maxlen=max_record_length)

    def add_box(self, box: np.ndarray):
        self.boxes.append(np.asarray(box, np.float32))

    def clear(self):
        self.boxes.clear()

    def __len__(self):
        return len(self.boxes)

    def get_box_delta(self, miss_length: int) -> np.ndarray:
        """Mean per-frame delta x miss_length (motion.py:17-22)."""
        if len(self.boxes) < 2:
            return np.zeros(4, np.float32)
        arr = np.stack(list(self.boxes))
        deltas = arr[1:] - arr[:-1]
        return deltas.mean(axis=0) * miss_length


class MotionBank:
    """Per-track-id motion records for the submit engine."""

    def __init__(self, min_record_length: int = 3, max_record_length: int = 5):
        self.min_len = min_record_length
        self.max_len = max_record_length
        self.records: Dict[int, Motion] = {}

    def observe(self, track_id: int, box: np.ndarray, reappeared: bool):
        m = self.records.setdefault(
            int(track_id), Motion(self.min_len, self.max_len))
        if reappeared:
            m.clear()
        m.add_box(box)

    def extrapolate(self, track_id: int, last_box: np.ndarray,
                    miss_length: int, lam: float) -> Optional[np.ndarray]:
        """logit-space ref-point correction (submit_engine.py:83-87);
        returns the extrapolated box in cxcywh or None."""
        m = self.records.get(int(track_id))
        if m is None or len(m) < m.min_record_length:
            return None
        return np.asarray(last_box, np.float32) + lam * m.get_box_delta(miss_length)
