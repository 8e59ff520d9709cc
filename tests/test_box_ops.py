import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.utils import box_ops


def _rand_boxes_xyxy(rng, n):
    x1y1 = rng.uniform(0, 0.5, (n, 2))
    wh = rng.uniform(0.05, 0.5, (n, 2))
    return np.concatenate([x1y1, x1y1 + wh], axis=-1).astype(np.float32)


def test_roundtrip_conversions():
    rng = np.random.default_rng(0)
    xyxy = _rand_boxes_xyxy(rng, 32)
    cxcywh = box_ops.box_xyxy_to_cxcywh(jnp.asarray(xyxy))
    back = box_ops.box_cxcywh_to_xyxy(cxcywh)
    np.testing.assert_allclose(np.asarray(back), xyxy, atol=1e-6)


def test_iou_matches_reference_formula():
    rng = np.random.default_rng(1)
    a = _rand_boxes_xyxy(rng, 16)
    b = _rand_boxes_xyxy(rng, 24)
    iou, union = box_ops.box_iou_union(jnp.asarray(a), jnp.asarray(b))
    # independent numpy computation
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    un = area_a[:, None] + area_b[None, :] - inter
    np.testing.assert_allclose(np.asarray(iou), inter / un, atol=1e-5)
    np.testing.assert_allclose(np.asarray(union), un, atol=1e-5)


def test_giou_range_and_identity():
    rng = np.random.default_rng(2)
    a = _rand_boxes_xyxy(rng, 8)
    g = np.asarray(box_ops.generalized_box_iou(jnp.asarray(a), jnp.asarray(a)))
    assert np.all(g <= 1.0 + 1e-6) and np.all(g >= -1.0 - 1e-6)
    np.testing.assert_allclose(np.diag(g), 1.0, atol=1e-5)


def test_pairwise_matches_diag_of_matrix():
    rng = np.random.default_rng(3)
    a = _rand_boxes_xyxy(rng, 10)
    b = _rand_boxes_xyxy(rng, 10)
    full, _ = box_ops.box_iou_union(jnp.asarray(a), jnp.asarray(b))
    pair = box_ops.box_iou_pairwise(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.diag(np.asarray(full)), np.asarray(pair),
                               atol=1e-6)


def test_giou_vs_torchvision_style():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    a = _rand_boxes_xyxy(rng, 12)
    b = _rand_boxes_xyxy(rng, 7)
    ours = np.asarray(box_ops.generalized_box_iou(jnp.asarray(a), jnp.asarray(b)))
    # torch reference formula (reference utils/box_ops.py:63-84)
    ta, tb = torch.tensor(a), torch.tensor(b)
    area1 = (ta[:, 2] - ta[:, 0]) * (ta[:, 3] - ta[:, 1])
    area2 = (tb[:, 2] - tb[:, 0]) * (tb[:, 3] - tb[:, 1])
    lt = torch.max(ta[:, None, :2], tb[:, :2])
    rb = torch.min(ta[:, None, 2:], tb[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    union = area1[:, None] + area2 - inter
    iou = inter / union
    lt2 = torch.min(ta[:, None, :2], tb[:, :2])
    rb2 = torch.max(ta[:, None, 2:], tb[:, 2:])
    wh2 = (rb2 - lt2).clamp(min=0)
    area = wh2[:, :, 0] * wh2[:, :, 1]
    expected = (iou - (area - union) / area).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)
