"""Orbax checkpoint round-trip (models/utils.py:15-45 equivalent)."""
import jax.numpy as jnp
import numpy as np

from memotr_tpu.checkpoint.orbax_io import load_checkpoint, save_checkpoint


def test_save_load_roundtrip(tmp_path):
    params = {"model": {"w": jnp.arange(6.0).reshape(2, 3),
                        "b": jnp.zeros((3,))},
              "updater": {"k": jnp.ones((4,))}}
    opt_state = {"mu": {"model": {"w": jnp.full((2, 3), 0.5)}}}
    states = {"start_epoch": 3, "global_iters": 1234}
    frozen = {"bn": {"mean": jnp.asarray([1.0, 2.0])}}
    path = str(tmp_path / "ckpt_0")
    save_checkpoint(path, params, opt_state=opt_state, states=states,
                    frozen=frozen)

    restored = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(restored["params"]["model"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(
        np.asarray(restored["opt_state"]["mu"]["model"]["w"]),
        np.full((2, 3), 0.5))
    assert int(restored["states"]["start_epoch"]) == 3
    assert int(restored["states"]["global_iters"]) == 1234
    np.testing.assert_array_equal(np.asarray(restored["frozen"]["bn"]["mean"]),
                                  [1.0, 2.0])


def test_save_overwrites(tmp_path):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"x": jnp.zeros(2)})
    save_checkpoint(path, {"x": jnp.ones(2)})
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(restored["params"]["x"]), [1, 1])
