"""MSDA ``auto`` dispatch threshold (memotr_tpu/ops/msda.py).

Round-4 full-pipeline evidence (PERF_NOTES): the query-tiled Pallas kernel
wins in-pipeline at encoder scale (hybrid 32.7 vs 23.5 FPS) but loses at
decoder scale (56.5 vs 68.0 FPS), so ``auto`` selects by query count with
the crossover pinned at 2048.  Selection logic only — kernel numerics are
covered by tests/test_msda.py / test_msda_pallas.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.ops import msda, msda_pallas
from memotr_tpu.ops.msda import ms_deform_attn, ms_deform_attn_xla

SHAPES = ((8, 10), (4, 5))


def make(lq, m=2, d=4, p=2):
    rng = np.random.RandomState(0)
    n = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.randn(1, n, m, d), jnp.float32)
    loc = jnp.asarray(rng.rand(1, lq, m, len(SHAPES), p, 2), jnp.float32)
    aw = jnp.asarray(rng.rand(1, lq, m, len(SHAPES), p), jnp.float32)
    aw = aw / aw.sum(axis=(-2, -1), keepdims=True)
    return value, loc, aw


def test_auto_below_threshold_is_xla(monkeypatch):
    # even on a TPU-reporting backend, small query counts stay on gathers
    monkeypatch.setattr(msda_pallas, "pallas_supported", lambda: True)
    value, loc, aw = make(lq=64)
    got = ms_deform_attn(value, SHAPES, loc, aw, impl="auto")
    ref = ms_deform_attn_xla(value, SHAPES, loc, aw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_auto_at_threshold_selects_pallas(monkeypatch):
    monkeypatch.setattr(msda_pallas, "pallas_supported", lambda: True)
    sentinel = object()
    monkeypatch.setattr(msda_pallas, "ms_deform_attn_pallas",
                        lambda *a, **k: sentinel)
    value, loc, aw = make(lq=2048)
    assert ms_deform_attn(value, SHAPES, loc, aw, impl="auto") is sentinel
    value, loc, aw = make(lq=2047)
    assert ms_deform_attn(value, SHAPES, loc, aw,
                          impl="auto") is not sentinel


def test_auto_off_tpu_is_xla(monkeypatch):
    monkeypatch.setattr(msda_pallas, "pallas_supported", lambda: False)
    value, loc, aw = make(lq=4096)
    got = ms_deform_attn(value, SHAPES, loc, aw, impl="auto")
    ref = ms_deform_attn_xla(value, SHAPES, loc, aw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
