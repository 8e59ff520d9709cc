"""Pipelined streaming submit == synchronous loop.

The default streaming loop (engine/submit.py Submitter._run_pipelined)
overlaps uint8 upload, step dispatch and packed-result fetch across threads;
VISUALIZE/USE_MOTION fall back to the per-frame synchronous loop.  Both must
produce the same tracker output (the reference loop they mirror is
submit_engine.py:58-120 — scheduling must not change results).

The only numeric difference allowed: the pipelined path ships raw uint8 and
ImageNet-normalizes on device, the sync path normalizes on the host (f32);
box coordinates may differ at float rounding level, nothing else.
"""
import os

import numpy as np
import PIL.Image
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from memotr_tpu.engine.submit import Submitter  # noqa: E402
from memotr_tpu.models.memotr import MeMOTR  # noqa: E402
from memotr_tpu.models.query_updater import QueryUpdater  # noqa: E402
from memotr_tpu.structures.track_state import TrackState  # noqa: E402


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipeseq") / "dancetrack0042"
    img = d / "img1"
    img.mkdir(parents=True)
    rng = np.random.default_rng(3)
    bg = rng.integers(30, 120, (64, 96, 3), np.uint8)
    for t in range(1, 7):
        frame = bg.copy()
        x = 6 * t
        frame[10:30, x:x + 14] = 220
        frame[35:55, 80 - x:94 - x] = 180
        PIL.Image.fromarray(frame).save(img / f"{t:08d}.jpg", quality=95)
    return str(d)


def _make(tmp, seq, config_extra):
    c, slots = 32, 8
    model = MeMOTR(num_classes=1, n_det_queries=12, n_feature_levels=4,
                   hidden_dim=c, ffn_dim=64, n_heads=4, n_enc_layers=1,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   dtype=jnp.float32, msda_impl="xla",
                   encoder_type="windowed")
    updater = QueryUpdater(hidden_dim=c, ffn_dim=64, use_dab=True,
                           dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    st = TrackState.empty(1, slots, c, 1, use_dab=True)
    img = jnp.zeros((1, 64, 96, 3)); msk = jnp.zeros((1, 64, 96), bool)
    params = jax.jit(model.init)(rng, img, msk, st.query_embed, st.ref_pts,
                                 st.mask)
    uparams = jax.jit(updater.init)(rng, st.query_embed, st.ref_pts,
                                    st.logits, st.boxes, st.output_embed,
                                    st.last_output, st.long_memory, st.mask)
    config = {
        "DET_SCORE_THRESH": 0.0, "TRACK_SCORE_THRESH": 0.0,
        "RESULT_SCORE_THRESH": 0.0, "MISS_TOLERANCE": 3,
        "TRACK_SLOTS": slots, "HIDDEN_DIM": c, "USE_DAB": True,
        "EVAL_SHORT_SIDE": 64, "EVAL_MAX_SIDE": 96, **config_extra,
    }
    return Submitter("DanceTrack", seq, "dancetrack0042", tmp, model,
                     updater, params, uparams, config)


def _parse(txt):
    rows = []
    for line in open(txt):
        f = line.strip().split(",")
        rows.append((int(f[0]), int(f[1]), *(float(v) for v in f[2:6])))
    return sorted(rows)


@pytest.mark.slow
def test_pipelined_writer_death_raises(seq_dir, tmp_path):
    """A dying writer thread must abort the run with its exception, not
    deadlock the dispatch loop on a full results queue (the queue has
    maxsize 4 < 6 frames, so a blocking put() would hang forever once the
    dead writer stops draining it)."""
    import threading

    sub = _make(str(tmp_path / "w"), seq_dir, {})
    sub.area_thresh = 0.0
    assert sub.pipelined

    def boom(*a, **k):
        raise RuntimeError("writer boom")

    sub._write_frame = boom
    got = {}

    def run():
        try:
            sub.run()
        except BaseException as e:  # noqa: BLE001 - asserted below
            got["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=300)
    assert not t.is_alive(), "pipelined submit hung after writer death"
    assert isinstance(got.get("err"), RuntimeError)
    assert "writer boom" in str(got["err"])


@pytest.mark.slow
def test_pipelined_matches_sync(seq_dir, tmp_path):
    # area_thresh would drop everything at this tiny canvas
    sub_p = _make(str(tmp_path / "p"), seq_dir, {})
    sub_p.area_thresh = 0.0
    assert sub_p.pipelined
    sub_p.run()
    # VISUALIZE forces the synchronous per-frame loop
    sub_s = _make(str(tmp_path / "s"), seq_dir, {"VISUALIZE": True})
    sub_s.area_thresh = 0.0
    assert not sub_s.pipelined
    sub_s.run()

    rp = _parse(tmp_path / "p" / "tracker" / "dancetrack0042.txt")
    rs = _parse(tmp_path / "s" / "tracker" / "dancetrack0042.txt")
    assert len(rp) > 0, "no tracker output produced"
    assert len(rp) == len(rs)
    for a, b in zip(rp, rs):
        assert a[:2] == b[:2]          # frame, id: exact
        np.testing.assert_allclose(a[2:], b[2:], rtol=0, atol=1e-3)


def test_prefetch_failure_machinery():
    """_guarded/_drain: a worker exception must re-raise in the consumer
    (not truncate the stream, not hang it) after all prior items drain."""
    import queue as qm
    import threading

    from memotr_tpu.engine.submit import _drain, _guarded

    q = qm.Queue(maxsize=4)

    def body():
        q.put(1)
        q.put(2)
        raise ValueError("decode boom")

    threading.Thread(target=_guarded(body, q), daemon=True).start()
    got = []
    with pytest.raises(ValueError, match="decode boom"):
        for item in _drain(q):
            got.append(item)
    assert got == [1, 2]

    # clean end: None marker terminates without error
    q2 = qm.Queue()
    threading.Thread(target=_guarded(lambda: q2.put("a"), q2),
                     daemon=True).start()
    assert list(_drain(q2)) == ["a"]


class _FailingDataset:
    """Wraps a SeqDataset; frame 2+ raises like a corrupt JPEG would."""

    def __init__(self, ds):
        self._ds = ds

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        if i >= 2:
            raise IOError("corrupt frame")
        return self._ds[i]


def _run_watchdogged(sub):
    """Run sub.run() under a watchdog so a regression to the old hang shows
    as an assertion, not a stuck test session."""
    import threading

    got = {}

    def run():
        try:
            sub.run()
        except BaseException as e:  # noqa: BLE001 - asserted by caller
            got["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=300)
    assert not t.is_alive(), "submit hung after a prefetch-worker failure"
    return got.get("err")


@pytest.mark.slow
def test_decode_failure_aborts_pipelined(seq_dir, tmp_path):
    """A prefetch decode failure must raise out of run(): the old
    ``finally: q.put(None)`` silently truncated the sequence (rc=0, wrong
    metrics)."""
    sub = _make(str(tmp_path / "f"), seq_dir, {})
    sub.area_thresh = 0.0
    assert sub.pipelined
    sub.dataset = _FailingDataset(sub.dataset)
    err = _run_watchdogged(sub)
    assert isinstance(err, IOError) and "corrupt frame" in str(err)


@pytest.mark.slow
def test_decode_failure_aborts_sync(seq_dir, tmp_path):
    """The sync path's prefetch worker had no handler at all: a failure
    left run() blocked on q.get() until an external timeout."""
    sub = _make(str(tmp_path / "fs"), seq_dir, {"VISUALIZE": True})
    sub.area_thresh = 0.0
    assert not sub.pipelined
    sub.dataset = _FailingDataset(sub.dataset)
    err = _run_watchdogged(sub)
    assert isinstance(err, IOError) and "corrupt frame" in str(err)
