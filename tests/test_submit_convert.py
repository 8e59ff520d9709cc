"""Submit coordinate conversion (results_to_pixels) against hand math."""
import numpy as np

from memotr_tpu.engine.submit import results_to_pixels


def _results(boxes, scores, mask, ids=None):
    n = len(boxes)
    return {
        "boxes": np.asarray([boxes], np.float32),
        "scores": np.asarray([scores], np.float32),
        "mask": np.asarray([mask]),
        "ids": np.asarray([ids if ids is not None else list(range(n))],
                          np.int32),
        "labels": np.zeros((1, n), np.int32),
    }


def test_normalized_to_original_pixels():
    # one box centered at (0.5, 0.25) with size (0.2, 0.1) of a 1920x1080 frame
    r = _results([[0.5, 0.25, 0.2, 0.1]], [0.9], [True])
    keep, x1, y1, w, h, ids, labels = results_to_pixels(r, (1080, 1920), 0.5)
    assert keep.tolist() == [0]
    np.testing.assert_allclose(w[0], 0.2 * 1920)
    np.testing.assert_allclose(h[0], 0.1 * 1080)
    np.testing.assert_allclose(x1[0], 0.5 * 1920 - 0.2 * 1920 / 2)
    np.testing.assert_allclose(y1[0], 0.25 * 1080 - 0.1 * 1080 / 2)


def test_score_mask_and_area_filters():
    boxes = [[0.5, 0.5, 0.2, 0.2],    # good
             [0.5, 0.5, 0.2, 0.2],    # low score
             [0.5, 0.5, 0.2, 0.2],    # dead slot
             [0.5, 0.5, 0.001, 0.001]]  # tiny area (<100 px^2)
    r = _results(boxes, [0.9, 0.3, 0.9, 0.9],
                 [True, True, False, True])
    keep, *_ = results_to_pixels(r, (1000, 1000), 0.5)
    assert keep.tolist() == [0]


def test_area_filter_uses_original_pixels():
    # 0.01 x 0.01 of a 5000x5000 frame = 2500 px^2 -> kept;
    # same box on a 500x500 frame = 25 px^2 -> dropped
    r = _results([[0.5, 0.5, 0.01, 0.01]], [0.9], [True])
    keep_big, *_ = results_to_pixels(r, (5000, 5000), 0.5)
    keep_small, *_ = results_to_pixels(r, (500, 500), 0.5)
    assert keep_big.tolist() == [0]
    assert keep_small.tolist() == []
