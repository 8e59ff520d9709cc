import jax.numpy as jnp
import numpy as np

from memotr_tpu.structures import TrackState
from memotr_tpu.structures.track_state import insert_tracks


def _empty(b=2, s=8, c=16, k=1):
    return TrackState.empty(b, s, c, k, use_dab=True)


def test_empty_state_shapes():
    st = _empty()
    assert st.mask.shape == (2, 8)
    assert st.query_embed.shape == (2, 8, 16)
    assert not bool(st.mask.any())
    assert st.batch_size == 2 and st.num_slots == 8


def test_insert_into_free_slots():
    st = _empty()
    cand = {
        "mask": jnp.asarray([[True, True, False], [True, False, False]]),
        "ids": jnp.asarray([[5, 7, -1], [9, -1, -1]], jnp.int32),
        "boxes": jnp.ones((2, 3, 4)) * 0.5,
    }
    st2 = insert_tracks(st, cand)
    np.testing.assert_array_equal(np.asarray(st2.mask[0]),
                                  [True, True] + [False] * 6)
    np.testing.assert_array_equal(np.asarray(st2.ids[0, :2]), [5, 7])
    np.testing.assert_array_equal(np.asarray(st2.ids[1, :1]), [9])
    assert np.allclose(np.asarray(st2.boxes[0, 0]), 0.5)
    # untouched slots stay empty
    assert np.asarray(st2.ids[0, 2]) == -1


def test_insert_respects_existing_occupancy_and_capacity():
    st = _empty(b=1, s=4)
    st = st.replace(mask=jnp.asarray([[True, False, True, False]]))
    cand = {
        "mask": jnp.ones((1, 3), bool),
        "ids": jnp.asarray([[1, 2, 3]], jnp.int32),
    }
    st2 = insert_tracks(st, cand)
    # free slots were 1 and 3 -> first two candidates land there, third dropped
    np.testing.assert_array_equal(np.asarray(st2.mask[0]),
                                  [True, True, True, True])
    assert int(st2.ids[0, 1]) == 1
    assert int(st2.ids[0, 3]) == 2


def test_select_kills_slots():
    st = _empty(b=1, s=4)
    st = st.replace(mask=jnp.ones((1, 4), bool),
                    ids=jnp.asarray([[0, 1, 2, 3]], jnp.int32))
    st2 = st.select(jnp.asarray([[True, False, True, False]]))
    np.testing.assert_array_equal(np.asarray(st2.mask[0]),
                                  [True, False, True, False])


def test_where_merges_states():
    a = _empty(b=1, s=2)
    b = _empty(b=1, s=2)
    a = a.replace(boxes=jnp.ones((1, 2, 4)))
    merged = a.where(jnp.asarray([[True, False]]), b)
    assert np.allclose(np.asarray(merged.boxes[0, 0]), 1.0)
    assert np.allclose(np.asarray(merged.boxes[0, 1]), 0.0)
