"""Motion-model unit tests.

Pins the reference ring-buffer mean-delta semantics
(``/root/reference/models/motion.py:6-28``) and the submit-engine wiring
behavior (``/root/reference/submit_engine.py:78-87``): a ring buffer of the
last <= max_record_length boxes, mean consecutive delta scaled by the miss
length, record cleared on reappearance, and no extrapolation below
min_record_length.
"""
import numpy as np

from memotr_tpu.models.motion import Motion, MotionBank


def test_mean_delta_semantics():
    m = Motion(min_record_length=3, max_record_length=5)
    # boxes moving +2 in cx each frame, +1 in cy
    for t in range(4):
        m.add_box(np.array([10 + 2 * t, 5 + t, 4, 4], np.float32))
    # mean delta = (2, 1, 0, 0); miss_length=3 -> (6, 3, 0, 0)
    np.testing.assert_allclose(m.get_box_delta(3),
                               np.array([6, 3, 0, 0], np.float32))


def test_ring_buffer_caps_at_max_length():
    m = Motion(max_record_length=5)
    # first 5 boxes stationary, then 3 moving ones; ring keeps the LAST 5:
    # [40, 42, 44, 46, 48] in cx (velocity 2 throughout the window)
    for t in range(5):
        m.add_box(np.array([40.0, 0, 1, 1], np.float32))
    assert len(m) == 5
    for t in range(1, 4):
        m.add_box(np.array([40.0 + 2 * t, 0, 1, 1], np.float32))
    assert len(m) == 5  # deque(maxlen=5), oldest evicted (motion.py:10)
    # window is [40, 40, 42, 44, 46]: deltas (0, 2, 2, 2) -> mean 1.5
    np.testing.assert_allclose(m.get_box_delta(2)[0], 3.0)


def test_short_record_returns_zero_delta():
    m = Motion()
    np.testing.assert_allclose(m.get_box_delta(4), np.zeros(4))
    m.add_box(np.array([1, 1, 1, 1], np.float32))
    # a single box has no delta (reference: deltas of len-1 stack are empty)
    np.testing.assert_allclose(m.get_box_delta(4), np.zeros(4))


def test_bank_min_length_gate_and_lambda():
    bank = MotionBank(min_record_length=3, max_record_length=5)
    bank.observe(7, np.array([0.0, 0, 1, 1], np.float32), reappeared=False)
    bank.observe(7, np.array([1.0, 0, 1, 1], np.float32), reappeared=False)
    # only 2 records < min_record_length -> no extrapolation
    assert bank.extrapolate(7, np.array([1.0, 0, 1, 1]), 1, 0.5) is None
    bank.observe(7, np.array([2.0, 0, 1, 1], np.float32), reappeared=False)
    out = bank.extrapolate(7, np.array([2.0, 0, 1, 1], np.float32),
                           miss_length=2, lam=0.5)
    # delta/frame = 1 -> miss 2 -> +2; lambda 0.5 -> +1 (submit_engine.py:83-87)
    np.testing.assert_allclose(out, np.array([3.0, 0, 1, 1], np.float32))
    # unknown id -> None
    assert bank.extrapolate(99, np.zeros(4), 1, 0.5) is None


def test_bank_clears_on_reappearance():
    bank = MotionBank(min_record_length=2, max_record_length=5)
    for t in range(4):
        bank.observe(1, np.array([float(t), 0, 1, 1], np.float32),
                     reappeared=False)
    assert len(bank.records[1]) == 4
    # reappearance resets the record before adding (submit_engine.py:79-82)
    bank.observe(1, np.array([9.0, 0, 1, 1], np.float32), reappeared=True)
    assert len(bank.records[1]) == 1
    assert bank.extrapolate(1, np.zeros(4), 1, 0.5) is None
