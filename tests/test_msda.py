"""Parity tests for multi-scale deformable attention.

Mirrors the reference's op test (``/root/reference/models/ops/test.py``):
the trusted oracle there is the pure-torch ``ms_deform_attn_core_pytorch``
built on ``F.grid_sample`` — we reproduce that exact oracle with torch (CPU)
and demand our JAX implementations match it, forward and backward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.ops.msda import ms_deform_attn_xla

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_oracle(value, shapes, loc, weights):
    """Pure-torch oracle (reference ms_deform_attn_func.py:44-64)."""
    value = torch.tensor(value)
    loc = torch.tensor(loc)
    weights = torch.tensor(weights)
    n, s, m, d = value.shape
    _, lq, m_, l, p, _ = loc.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros", align_corners=False))
    aw = weights.transpose(1, 2).reshape(n * m, 1, lq, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1)
    return out.view(n, m * d, lq).transpose(1, 2).contiguous().numpy()


def _make_inputs(rng, b=2, m=4, d=16, lq=10, p=3,
                 shapes=((12, 17), (6, 9), (3, 5))):
    l = len(shapes)
    s = sum(h * w for h, w in shapes)
    value = rng.normal(size=(b, s, m, d)).astype(np.float32)
    # sample a mix of interior and out-of-bounds locations
    loc = rng.uniform(-0.2, 1.2, size=(b, lq, m, l, p, 2)).astype(np.float32)
    w = rng.uniform(size=(b, lq, m, l, p)).astype(np.float32)
    w = w / w.sum(axis=(-1, -2), keepdims=True)
    return value, shapes, loc, w


def test_forward_matches_torch_oracle():
    rng = np.random.default_rng(0)
    value, shapes, loc, w = _make_inputs(rng)
    expected = torch_oracle(value, shapes, loc, w)
    ours = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_forward_single_level_single_head():
    rng = np.random.default_rng(1)
    value, shapes, loc, w = _make_inputs(rng, b=1, m=1, d=8, lq=4, p=2,
                                         shapes=((7, 7),))
    expected = torch_oracle(value, shapes, loc, w)
    ours = np.asarray(ms_deform_attn_xla(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_gradients_match_torch_oracle():
    rng = np.random.default_rng(2)
    value, shapes, loc, w = _make_inputs(rng, b=1, m=2, d=4, lq=5, p=2,
                                         shapes=((8, 11), (4, 6)))
    g = rng.normal(size=(1, 5, 2 * 4)).astype(np.float32)

    # torch grads
    tv = torch.tensor(value, requires_grad=True)
    tl = torch.tensor(loc, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)
    n, s, m, d = tv.shape
    _, lq, _, l, p, _ = tl.shape
    value_list = tv.split([h_ * w_ for h_, w_ in shapes], dim=1)
    grids = 2 * tl - 1
    sampled = []
    for lid, (h_, w_) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h_, w_)
        gr = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, gr, mode="bilinear",
                                     padding_mode="zeros", align_corners=False))
    aw = tw.transpose(1, 2).reshape(n * m, 1, lq, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1)
    out = out.view(n, m * d, lq).transpose(1, 2)
    out.backward(torch.tensor(g).reshape(n, lq, m * d))

    # jax grads
    def f(v_, l_, w_):
        o = ms_deform_attn_xla(v_, shapes, l_, w_)
        return jnp.sum(o * jnp.asarray(g))

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(),
                               rtol=1e-3, atol=1e-5)
    # grad wrt sampling locations: grid_sample's boundary subgradients can
    # differ exactly at integer lattice points; random real-valued locations
    # avoid that measure-zero set.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_channel_widths_like_reference_test():
    """Reference sweeps channel widths {30,32,64,71,...} (ops/test.py:63-86)."""
    rng = np.random.default_rng(3)
    for d in [30, 32, 64, 71]:
        value, shapes, loc, w = _make_inputs(rng, b=1, m=2, d=d, lq=3, p=2,
                                             shapes=((5, 5), (3, 3)))
        expected = torch_oracle(value, shapes, loc, w)
        ours = np.asarray(ms_deform_attn_xla(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
        np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


# ---------------- Pallas kernel (interpret mode on CPU) ---------------------
def _rand_inputs(seed, shapes, b=2, m=4, d=8, p=4, lq=37, oob=True):
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    hw = sum(h * w for h, w in shapes)
    value = jax.random.normal(k1, (b, hw, m, d))
    span = (1.3, -0.15) if oob else (1.0, 0.0)
    loc = jax.random.uniform(k2, (b, lq, m, len(shapes), p, 2)) * span[0] \
        + span[1]
    aw = jax.nn.softmax(jax.random.normal(k3, (b, lq, m, len(shapes) * p)))
    return value, loc, aw.reshape(b, lq, m, len(shapes), p)


def test_pallas_forward_matches_xla():
    from memotr_tpu.ops.msda_pallas import ms_deform_attn_pallas

    shapes = ((25, 42), (13, 21), (7, 11), (4, 6))
    value, loc, aw = _rand_inputs(0, shapes)
    ref = ms_deform_attn_xla(value, shapes, loc, aw)
    out = ms_deform_attn_pallas(value, shapes, loc, aw, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_forward_awkward_shapes():
    """Prime-ish level widths exercise the no-chunk fallback; single level
    and lq not a multiple of 8 exercise query padding."""
    from memotr_tpu.ops.msda_pallas import ms_deform_attn_pallas

    shapes = ((11, 17),)
    value, loc, aw = _rand_inputs(1, shapes, b=1, m=2, d=16, p=3, lq=5)
    ref = ms_deform_attn_xla(value, shapes, loc, aw)
    out = ms_deform_attn_pallas(value, shapes, loc, aw, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_query_tiling():
    """lq > _Q_TILE exercises the (heads, query_tiles) grid with a padded
    final tile — the VMEM-feasibility mechanism beyond decoder scale
    (VERDICT round-3 #4)."""
    from memotr_tpu.ops.msda_pallas import _Q_TILE, ms_deform_attn_pallas

    shapes = ((13, 21), (7, 11))
    lq = _Q_TILE + 44                      # 2 tiles, final one part-padded
    value, loc, aw = _rand_inputs(3, shapes, b=1, m=2, d=8, p=2, lq=lq)
    ref = ms_deform_attn_xla(value, shapes, loc, aw)
    out = ms_deform_attn_pallas(value, shapes, loc, aw, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_gradients_match_xla():
    from memotr_tpu.ops.msda_pallas import ms_deform_attn_pallas

    shapes = ((9, 12), (5, 6))
    value, loc, aw = _rand_inputs(2, shapes, b=1, m=2, d=4, p=2, lq=9)

    def lp(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, shapes, l, a, True) ** 2)

    def lx(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, a) ** 2)

    gp = jax.grad(lp, argnums=(0, 1, 2))(value, loc, aw)
    gx = jax.grad(lx, argnums=(0, 1, 2))(value, loc, aw)
    for name, a, b in zip(("value", "loc", "aw"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=name)
