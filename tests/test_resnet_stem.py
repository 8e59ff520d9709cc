"""Space-to-depth stem (resnet.Conv1Stem): bit-equivalent taps to the plain
7x7 stride-2 pad-3 stem conv, identical parameter tree."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from memotr_tpu.models.resnet import Conv1Stem, ResNet50


def test_s2d_stem_matches_plain_conv():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 96, 3), jnp.float32)
    stem = Conv1Stem(64, dtype=jnp.float32)
    params = stem.init(rng, x)
    assert params["params"]["kernel"].shape == (7, 7, 3, 64)

    plain = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=jnp.float32)
    out_s2d = stem.apply(params, x)
    out_ref = plain.apply({"params": {"kernel": params["params"]["kernel"]}},
                          x)
    assert out_s2d.shape == out_ref.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def test_resnet_param_tree_unchanged():
    """Both stem variants expose conv1/kernel (7,7,3,64) — checkpoints and
    the torch converter are layout-agnostic to the s2d computation."""
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    for s2d in (True, False):
        v = ResNet50(dtype=jnp.float32, s2d_stem=s2d).init(rng, x)
        assert v["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)

    v1 = ResNet50(dtype=jnp.float32, s2d_stem=True).init(rng, x)
    m = ResNet50(dtype=jnp.float32, s2d_stem=False)
    x2 = jax.random.normal(rng, (1, 64, 64, 3))
    a = ResNet50(dtype=jnp.float32, s2d_stem=True).apply(v1, x2)
    b = m.apply(v1, x2)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   atol=1e-4, rtol=1e-4)
