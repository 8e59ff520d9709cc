"""Sequence-parallel encoder: token sharding must not change numerics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from memotr_tpu.models.memotr import MeMOTR
from memotr_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason="needs multiple devices")
def test_token_sharded_matches_replicated():
    c = 32
    kw = dict(num_classes=1, n_det_queries=6, n_feature_levels=4,
              hidden_dim=c, ffn_dim=64, n_heads=4, n_enc_layers=2,
              n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
              dtype=jnp.float32)
    base = MeMOTR(**kw)
    sharded = MeMOTR(token_shard_axis="sp", **kw)

    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (1, 128, 128, 3)) * 0.1
    mask = jnp.zeros((1, 128, 128), bool)
    tq = jnp.zeros((1, 3, c))
    tr = jnp.zeros((1, 3, 4))
    tm = jnp.zeros((1, 3), bool)
    params = base.init(rng, imgs, mask, tq, tr, tm)

    out_ref = jax.jit(lambda p: base.apply(p, imgs, mask, tq, tr, tm))(params)

    mesh = make_mesh(axis="sp")
    with jax.set_mesh(mesh):
        out_sp = jax.jit(
            lambda p: sharded.apply(p, imgs, mask, tq, tr, tm))(params)

    np.testing.assert_allclose(np.asarray(out_ref["pred_boxes"]),
                               np.asarray(out_sp["pred_boxes"]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_ref["pred_logits"]),
                               np.asarray(out_sp["pred_logits"]),
                               atol=2e-3)
