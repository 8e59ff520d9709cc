"""Native data plane: build, parity with the Python path, async pool."""
import os

import numpy as np
import PIL.Image
import pytest

from memotr_tpu.data.native import available, decode_sync, AsyncDecoder
from memotr_tpu.data.seq_dataset import SeqDataset

pytestmark = pytest.mark.skipif(not available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def jpg(tmp_path_factory):
    rng = np.random.default_rng(0)
    p = tmp_path_factory.mktemp("img") / "a.jpg"
    PIL.Image.fromarray(
        rng.integers(0, 255, (120, 200, 3), np.uint8)).save(p, quality=95)
    return str(p)


def test_decode_matches_python_path(jpg):
    import cv2
    out = decode_sync(jpg, 64, 128, (64, 128))
    assert out is not None
    canvas, mask, ori_hw, new_hw = out
    assert ori_hw == (120, 200)
    sd = SeqDataset.__new__(SeqDataset)
    sd.image_height, sd.image_width = 64, 128
    arr = cv2.cvtColor(cv2.imread(jpg), cv2.COLOR_BGR2RGB)
    py_arr, _, py_new = sd.process_image(arr)
    assert new_hw == py_new
    np.testing.assert_allclose(
        canvas[:py_arr.shape[0], :py_arr.shape[1]], py_arr, atol=1e-5)
    # padding zeroed, mask correct
    assert np.all(canvas[new_hw[0]:] == 0)
    assert (~mask).sum() == new_hw[0] * new_hw[1]


def test_u8_decode_bit_matches_python_path(jpg, tmp_path):
    """The uint8 pipelined-submit path (normalize-on-device) must be
    BIT-identical between the native plane and the Python cv2 path."""
    seq = tmp_path / "seq" / "img1"
    seq.mkdir(parents=True)
    os.link(jpg, seq / "00000001.jpg")
    ds_n = SeqDataset(str(tmp_path / "seq"), image_height=64,
                      image_width=128, uint8=True)
    ds_p = SeqDataset(str(tmp_path / "seq"), image_height=64,
                      image_width=128, uint8=True, use_native=False)
    assert ds_n._native
    a, b = ds_n[0], ds_p[0]
    assert a["image"].dtype == np.uint8
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["mask"], b["mask"])
    assert a["ori_hw"] == b["ori_hw"] and a["resized_hw"] == b["resized_hw"]


def test_async_pool_ordering(jpg):
    dec = AsyncDecoder(3)
    jobs = [dec.submit(jpg, 64, 128, (64, 128)) for _ in range(8)]
    outs = [dec.wait(j) for j in jobs]
    dec.close()
    assert all(o is not None for o in outs)
    for o in outs:
        np.testing.assert_array_equal(o[0], outs[0][0])


def test_missing_file_fails_cleanly(tmp_path):
    assert decode_sync(str(tmp_path / "nope.jpg"), 64, 128, (64, 128)) is None


def test_seq_dataset_uses_native(jpg, tmp_path):
    seq = tmp_path / "seq" / "img1"
    seq.mkdir(parents=True)
    os.link(jpg, seq / "00000001.jpg")
    ds = SeqDataset(str(tmp_path / "seq"), image_height=64, image_width=128)
    assert ds._native
    item = ds[0]
    assert item["image"].shape == (64, 128, 3)
    ds2 = SeqDataset(str(tmp_path / "seq"), image_height=64, image_width=128,
                     use_native=False)
    np.testing.assert_allclose(item["image"], ds2[0]["image"], atol=1e-5)
