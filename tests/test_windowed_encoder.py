import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="heavy end-to-end compiles; run via scripts/test_cpu.sh - the "
           "remote-TPU tunnel makes each jit minutes-long")

"""TPU-native encoder: window/grid block algebra + end-to-end variant."""
import jax
import jax.numpy as jnp
import numpy as np

from memotr_tpu.models.windowed_encoder import (_block_merge,
                                                _block_partition,
                                                WindowedEncoder,
                                                WindowedEncoderLayer)
from memotr_tpu.models.memotr import MeMOTR


def test_partition_merge_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 13, 21, 8)).astype(np.float32))
    mask = jnp.zeros((2, 13, 21), bool)
    for grid in (False, True):
        xw, mw, hw_pad = _block_partition(x, mask, 8, grid)
        back = _block_merge(xw, hw_pad, 2, 13, 21, 8, grid)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_grid_groups_are_strided_positions():
    """MaxViT grid mode: one group holds positions (i + a*P, j + b*P)."""
    h = w = 16
    win = 4
    val = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    xw, _, _ = _block_partition(val, jnp.zeros((1, h, w), bool), win, True)
    # group 0 = positions (0 + 4a, 0 + 4b)
    expected = sorted(float(r * w + c) for r in range(0, h, win)
                      for c in range(0, w, win))
    got = sorted(np.asarray(xw)[0, :, 0].tolist())
    assert got == expected


def test_padding_tokens_are_masked():
    x = jnp.ones((1, 10, 10, 8))
    mask = jnp.zeros((1, 10, 10), bool).at[:, 5:, :].set(True)
    for grid in (False, True):
        _, mw, _ = _block_partition(x, mask, 8, grid)
        assert bool(mw.any()) and not bool(mw.all())


def test_window_plus_grid_pair_is_global():
    """After one window layer + one grid layer, a perturbation at one corner
    must reach the opposite corner (deformable attention's global reach is
    what this pattern replaces)."""
    layers = [WindowedEncoderLayer(d_model=16, d_ffn=32, n_heads=2, window=4,
                                   grid=g, dtype=jnp.float32)
              for g in (False, True)]
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (1, 16, 16, 16))
    pos = jax.random.normal(jax.random.fold_in(rng, 1), (1, 16, 16, 16))
    mask = jnp.zeros((1, 16, 16), bool)
    params = [l.init(rng, [x], [mask], [pos]) for l in layers]

    def run(inp):
        lv = [inp]
        for l, p in zip(layers, params):
            lv = l.apply(p, lv, [mask], [pos])
        return lv[0]

    base = run(x)
    pert = run(x.at[0, 0, 0].add(3.0))
    delta = np.abs(np.asarray(pert - base)).sum(-1)[0]
    assert delta[15, 15] > 1e-6, "global receptive field broken"


def test_encoder_shapes_and_finiteness():
    shapes = ((16, 24), (8, 12), (4, 6), (2, 3))
    s_total = sum(h * w for h, w in shapes)
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (2, s_total, 32))
    pos = jax.random.normal(jax.random.fold_in(rng, 1), (2, s_total, 32))
    mask = jnp.zeros((2, s_total), bool)
    enc = WindowedEncoder(num_layers=2, d_model=32, d_ffn=64, n_heads=4,
                          dtype=jnp.float32)
    params = enc.init(rng, src, shapes, None, pos, mask)
    out = enc.apply(params, src, shapes, None, pos, mask)
    assert out.shape == (2, s_total, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_memotr_with_windowed_encoder():
    model = MeMOTR(num_classes=1, n_det_queries=6, n_feature_levels=4,
                   hidden_dim=32, ffn_dim=64, n_heads=4, n_enc_layers=2,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   encoder_type="windowed", dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (1, 64, 64, 3)) * 0.1
    mask = jnp.zeros((1, 64, 64), bool)
    tq = jnp.zeros((1, 3, 32))
    tr = jnp.zeros((1, 3, 4))
    tm = jnp.zeros((1, 3), bool)
    params = model.init(rng, imgs, mask, tq, tr, tm)
    out = model.apply(params, imgs, mask, tq, tr, tm)
    assert out["pred_boxes"].shape == (1, 9, 4)
    assert np.all(np.isfinite(np.asarray(out["pred_logits"])))
    # encoder params are block-attention, not deformable
    enc = params["params"]["transformer"]["encoder"]["layer_0"]
    assert "win_attn" in enc and "topdown_mix" in enc and "lepe_dwconv" in enc


def test_non_default_window_size():
    """WINDOW_SIZE knob: non-multiple maps are padded+masked; output shape
    and finiteness hold for window=6 on levels that don't divide evenly."""
    shapes = ((16, 20), (8, 10), (4, 5), (2, 3))
    s_total = sum(h * w for h, w in shapes)
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (1, s_total, 32))
    pos = jax.random.normal(jax.random.fold_in(rng, 1), (1, s_total, 32))
    mask = jnp.zeros((1, s_total), bool)
    enc = WindowedEncoder(num_layers=2, d_model=32, d_ffn=64, n_heads=4,
                          window=6, dtype=jnp.float32)
    params = enc.init(rng, src, shapes, None, pos, mask)
    out = enc.apply(params, src, shapes, None, pos, mask)
    assert out.shape == (1, s_total, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_prenorm_variant():
    """WINDOWED_PRENORM: pre-norm blocks + final stack norm — output is
    finite, differs from post-norm, and gradients flow to every param."""
    shapes = ((16, 24), (8, 12), (4, 6), (2, 3))
    s_total = sum(h * w for h, w in shapes)
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (1, s_total, 32))
    pos = jax.random.normal(jax.random.fold_in(rng, 1), (1, s_total, 32))
    mask = jnp.zeros((1, s_total), bool)
    enc = WindowedEncoder(num_layers=2, d_model=32, d_ffn=64, n_heads=4,
                          prenorm=True, dtype=jnp.float32)
    params = enc.init(rng, src, shapes, None, pos, mask)
    assert "final_norm" in params["params"]
    out = enc.apply(params, src, shapes, None, pos, mask)
    assert np.all(np.isfinite(np.asarray(out)))

    post = WindowedEncoder(num_layers=2, d_model=32, d_ffn=64, n_heads=4,
                           prenorm=False, dtype=jnp.float32)
    out_post = post.apply(post.init(rng, src, shapes, None, pos, mask),
                          src, shapes, None, pos, mask)
    assert np.abs(np.asarray(out - out_post)).max() > 1e-3

    grads = jax.grad(lambda p: enc.apply(p, src, shapes, None, pos,
                                         mask).sum())(params)
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in leaves:
        assert np.any(np.asarray(g) != 0), jax.tree_util.keystr(path)


def test_relpos_table_geometry():
    """CPB geometry: index maps pair (i, j) to the row holding their exact
    relative offset; scale converts block units to feature-map pixels."""
    from memotr_tpu.models.windowed_encoder import _relpos_table
    n_h, n_w, scale = 3, 4, 8
    coords, index = _relpos_table(n_h, n_w, scale)
    assert coords.shape == ((2 * n_h - 1) * (2 * n_w - 1), 2)
    assert index.shape == (n_h * n_w, n_h * n_w)
    # pair (member (2,3), member (0,0)): offset (2, 3) blocks = (16, 24) px
    i, j = 2 * n_w + 3, 0
    expect = np.sign([16, 24]) * np.log1p([16, 24]) / np.log1p(1024.0)
    np.testing.assert_allclose(coords[index[i, j]], expect, rtol=1e-6)
    # antisymmetry: offset(j, i) == -offset(i, j)
    np.testing.assert_allclose(coords[index[j, i]], -coords[index[i, j]],
                               rtol=1e-6)


def test_relpos_bias_changes_output_and_is_trained():
    """With use_relpos, attention becomes position-dependent: permuting the
    tokens inside one window no longer merely permutes the outputs."""
    kw = dict(d_model=16, d_ffn=32, n_heads=2, window=4, grid=False,
              use_lepe=False, use_bottomup=False, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 4, 16))
    mask = jnp.zeros((1, 4, 4), bool)
    pos = jnp.zeros((1, 4, 4, 16))

    def perm_equivariance_gap(use_relpos):
        layer = WindowedEncoderLayer(use_relpos=use_relpos, **kw)
        params = layer.init(rng, [x], [mask], [pos])
        out = layer.apply(params, [x], [mask], [pos])[0]
        xp = x[:, ::-1]                      # flip rows inside the window
        outp = layer.apply(params, [xp], [mask], [pos])[0]
        return float(jnp.abs(outp[:, ::-1] - out).max())

    assert perm_equivariance_gap(False) < 1e-5   # no bias: permutation-equiv
    assert perm_equivariance_gap(True) > 1e-4    # bias breaks the symmetry
    # grads reach the CPB MLP
    layer = WindowedEncoderLayer(use_relpos=True, **kw)
    params = layer.init(rng, [x], [mask], [pos])

    def loss(p):
        return jnp.sum(layer.apply(p, [x], [mask], [pos])[0] ** 2)

    g = jax.grad(loss)(params)["params"]
    gn = float(jnp.abs(g["cpb_mlp1"]["kernel"]).sum())
    assert np.isfinite(gn) and gn > 0


def test_gradients_flow_through_windowed():
    enc = WindowedEncoder(num_layers=1, d_model=16, d_ffn=32, n_heads=2,
                          dtype=jnp.float32)
    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    rng = jax.random.PRNGKey(1)
    src = jax.random.normal(rng, (1, s, 16))
    pos = jnp.zeros((1, s, 16))
    mask = jnp.zeros((1, s), bool)
    params = enc.init(rng, src, shapes, None, pos, mask)

    def loss(p):
        return jnp.sum(enc.apply(p, src, shapes, None, pos, mask) ** 2)

    g = jax.grad(loss)(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_shared_cpb_param_location_and_equivalence_structure():
    """WINDOWED_SHARED_CPB: one CPB MLP at the encoder level; layers carry no
    per-layer cpb params.  The bias path stays active (output differs from a
    no-relpos encoder with otherwise-identical params)."""
    shapes = ((16, 24), (8, 12), (4, 6), (2, 3))
    s_total = sum(h * w for h, w in shapes)
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (1, s_total, 32))
    pos = jax.random.normal(jax.random.fold_in(rng, 1), (1, s_total, 32))
    mask = jnp.zeros((1, s_total), bool)
    enc = WindowedEncoder(num_layers=2, d_model=32, d_ffn=64, n_heads=4,
                          shared_cpb=True, dtype=jnp.float32)
    params = enc.init(rng, src, shapes, None, pos, mask)
    p = params["params"]
    assert "cpb_mlp1" in p and "cpb_mlp2" in p
    assert "cpb_mlp1" not in p["layer_0"] and "cpb_mlp1" not in p["layer_1"]
    out = enc.apply(params, src, shapes, None, pos, mask)
    assert np.all(np.isfinite(np.asarray(out)))

    # zeroing the shared CPB head removes the bias contribution -> output
    # changes, proving the shared tables feed every layer
    import copy
    p2 = jax.tree.map(lambda x: x, params)
    p2["params"]["cpb_mlp2"]["kernel"] = jnp.zeros_like(
        p2["params"]["cpb_mlp2"]["kernel"])
    out2 = enc.apply(p2, src, shapes, None, pos, mask)
    assert not np.allclose(np.asarray(out), np.asarray(out2))

    # gradients flow into the shared table
    def loss(pp):
        return jnp.sum(enc.apply(pp, src, shapes, None, pos, mask))
    g = jax.grad(loss)(params)["params"]["cpb_mlp1"]["kernel"]
    assert float(jnp.sum(jnp.abs(g))) > 0
