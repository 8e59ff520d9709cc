"""WINDOWED_ATTN_IMPL dispatch: the fused-kernel encoder path equals the
MultiheadAttention path with the SAME parameters (checkpoint-compatible),
across grid layers, shared-CPB, prenorm, padding-heavy shapes.

Covers models/windowed_encoder.py (attn_impl field).  Kernel
math itself is covered by tests/test_window_attn.py; this pins the module
wiring (param-tree twin, per-level pad/crop, grid transpose round trip,
bias source selection).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.models.windowed_encoder import WindowedEncoder

C, HEADS, WIN = 32, 4, 4


def run(attn_impl, shared_cpb=False, prenorm=False, seed=0):
    # 2-level pyramid with non-multiple-of-window dims (forces padding)
    shapes = ((10, 14), (5, 7))
    rng = np.random.RandomState(seed)
    b = 2
    n = sum(h * w for h, w in shapes)
    src = jnp.asarray(rng.randn(b, n, C).astype(np.float32))
    pos = jnp.asarray(rng.randn(b, n, C).astype(np.float32) * 0.5)
    mask = np.zeros((b, n), bool)
    mask[1, 10 * 14 - 20:10 * 14] = True           # pad tail of level 0
    mask = jnp.asarray(mask)
    enc = WindowedEncoder(num_layers=2, d_model=C, d_ffn=64, n_heads=HEADS,
                          window=WIN, shared_cpb=shared_cpb,
                          prenorm=prenorm, attn_impl=attn_impl)
    variables = enc.init(jax.random.PRNGKey(7), src, shapes, None, pos, mask)
    out = enc.apply(variables, src, shapes, None, pos, mask)
    return variables, out


@pytest.mark.parametrize("shared_cpb,prenorm",
                         [(False, False), (True, False), (False, True)])
def test_pallas_impl_matches_xla(shared_cpb, prenorm):
    v_xla, out_xla = run("xla", shared_cpb, prenorm)
    v_pal, out_pal = run("pallas", shared_cpb, prenorm)
    # identical param trees (same names, shapes, init values)
    flat_x = jax.tree_util.tree_leaves_with_path(v_xla)
    flat_p = jax.tree_util.tree_leaves_with_path(v_pal)
    assert [jax.tree_util.keystr(k) for k, _ in flat_x] == \
           [jax.tree_util.keystr(k) for k, _ in flat_p]
    for (_, a), (_, b) in zip(flat_x, flat_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-4)


def test_auto_resolves_to_xla():
    _, out_auto = run("auto")
    _, out_xla = run("xla")
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_xla))
