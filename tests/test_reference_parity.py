"""Full-model numerical parity against the reference PyTorch implementation.

Builds the ACTUAL reference model (/root/reference/models/memotr.py) on CPU —
CUDA extension stubbed with its own pure-torch oracle
(``ms_deform_attn_core_pytorch``, ms_deform_attn_func.py:44-64), torchvision
replaced by the faithful stand-in in ``torchvision_stub.py`` — randomizes
every parameter/buffer (structured inits like the zero bbox head would hide
conversion errors), exports the state dict through
``convert_torch_state_dict``, and asserts our model reproduces the reference
logits/boxes/ref-points through one frame and one query-updater step.

This is the SURVEY §7 step-3 check (single-frame detection forward vs
reference, BASELINE.json config #1): it fails if any module's numerics or the
converter's naming drifts.  It caught a real bug on first run: mask
downsampling used cell-center nearest sampling where torch F.interpolate
uses floor, shifting valid_ratios at stride-32 levels (memotr.py
``_downsample_mask``).
"""
import sys
import types

import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="heavy end-to-end compiles; run via scripts/test_cpu.sh")

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from memotr_tpu.checkpoint.torch_convert import convert_torch_state_dict
from memotr_tpu.models.memotr import build_model
from memotr_tpu.models.query_updater import QueryUpdater
from memotr_tpu.structures.track_state import TrackState

HD = 64
ND = 30

REF_CFG = {
    "DATASET": "DanceTrack", "BACKBONE": "resnet50",
    "HIDDEN_DIM": HD, "FFN_DIM": 128, "NUM_FEATURE_LEVELS": 4,
    "NUM_HEADS": 8, "NUM_ENC_POINTS": 4, "NUM_DEC_POINTS": 4,
    "NUM_ENC_LAYERS": 2, "NUM_DEC_LAYERS": 3, "MERGE_DET_TRACK_LAYER": 1,
    "NUM_DET_QUERIES": ND, "DROPOUT": 0.0, "USE_DAB": True,
    "UPDATE_THRESH": 0.5, "LONG_MEMORY_LAMBDA": 0.01,
    "USE_CHECKPOINT": False, "CHECKPOINT_LEVEL": 2,
    "EXTRA_TRACK_ATTN": False, "RETURN_INTER_DEC": True,
    "ACTIVATION": "ReLU", "VISUALIZE": False,
}

OUR_CFG = {
    "DATASET": "DanceTrack", "HIDDEN_DIM": HD, "FFN_DIM": 128,
    "NUM_FEATURE_LEVELS": 4, "NUM_HEADS": 8, "NUM_ENC_POINTS": 4,
    "NUM_DEC_POINTS": 4, "NUM_ENC_LAYERS": 2, "NUM_DEC_LAYERS": 3,
    "MERGE_DET_TRACK_LAYER": 1, "NUM_DET_QUERIES": ND, "DROPOUT": 0.0,
    "USE_DAB": True, "USE_CHECKPOINT": False, "DTYPE": "float32",
    "MSDA_IMPL": "xla", "TRACK_SLOTS": 4,
}


def _import_reference():
    """Import the reference torch code with its CUDA ext + torchvision
    stubbed (reference stays read-only; import side effects only)."""
    import torchvision_stub
    torchvision_stub.install()
    sys.modules.setdefault(
        "MultiScaleDeformableAttention",
        types.ModuleType("MultiScaleDeformableAttention"))
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from models.ops.functions import ms_deform_attn_func as f

    def _fwd(value, spatial_shapes, level_start_index, loc, weights, step):
        return f.ms_deform_attn_core_pytorch(value, spatial_shapes, loc,
                                             weights)

    sys.modules["MultiScaleDeformableAttention"].ms_deform_attn_forward = _fwd
    from models.memotr import build as ref_build
    from structures.track_instances import TrackInstances
    from utils.nested_tensor import NestedTensor
    return ref_build, TrackInstances, NestedTensor


@pytest.fixture(scope="module")
def ref_blob():
    ref_build, TrackInstances, NestedTensor = _import_reference()
    torch.manual_seed(0)
    ref_model = ref_build(REF_CFG)
    ref_model.eval()

    # randomize EVERYTHING so no conversion error can hide behind a
    # structured init (zero bbox-final-layer, identity FrozenBN, ...)
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, buf in ref_model.named_buffers():
            if "running_var" in name:
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
            else:
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.3 +
                          (1.0 if "weight" in name else 0.0))
        for _, p in ref_model.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)

    h, w = 96, 128
    gi = torch.Generator().manual_seed(1)
    img = torch.randn(1, 3, h, w, generator=gi)
    mask = torch.zeros(1, h, w, dtype=torch.bool)
    mask[:, 80:, :] = True          # pad edge mid-cell at stride 32
    img = img * (~mask[:, None]).float()

    tracks = [TrackInstances(hidden_dim=HD, num_classes=1, use_dab=True)]
    with torch.no_grad():
        res = ref_model(frame=NestedTensor(img, mask), tracks=tracks)

    # one query-updater step on synthetic live tracks
    gu = torch.Generator().manual_seed(11)
    n = 5
    ti = TrackInstances(hidden_dim=HD, num_classes=1, use_dab=True)
    ti.ref_pts = torch.randn(n, 4, generator=gu)
    ti.query_embed = torch.randn(n, HD, generator=gu)
    ti.ids = torch.arange(n)
    ti.boxes = torch.sigmoid(torch.randn(n, 4, generator=gu))
    ti.labels = torch.zeros(n, dtype=torch.long)
    ti.logits = torch.randn(n, 1, generator=gu) * 2
    ti.output_embed = torch.randn(n, HD, generator=gu)
    ti.last_output = torch.randn(n, HD, generator=gu)
    ti.long_memory = torch.randn(n, HD, generator=gu)
    upd_in = {f: getattr(ti, f).clone().numpy() for f in
              ("ref_pts", "query_embed", "boxes", "logits", "output_embed",
               "last_output", "long_memory")}
    with torch.no_grad():
        out_t = ref_model.query_updater.update_tracks_embedding([ti])[0]
    upd_out = {f: getattr(out_t, f).numpy() for f in
               ("ref_pts", "query_embed", "long_memory", "last_output")}

    sd = ref_model.state_dict()
    params, uparams, frozen = convert_torch_state_dict(sd, use_dab=True)
    unconverted = params.pop("_unconverted")
    assert unconverted == [], f"converter missed keys: {unconverted[:8]}"
    return {
        "img": img.numpy(), "mask": mask.numpy(),
        "res": {k: v.numpy() for k, v in res.items() if hasattr(v, "numpy")},
        "params": params, "uparams": uparams, "frozen": frozen,
        "upd_in": upd_in, "upd_out": upd_out, "n_tracks": n,
    }


def test_forward_parity(ref_blob):
    model = build_model(OUR_CFG)
    images = jnp.asarray(ref_blob["img"].transpose(0, 2, 3, 1))
    mask = jnp.asarray(ref_blob["mask"])
    st = TrackState.empty(1, 4, HD, 1, use_dab=True)
    out = model.apply({"params": ref_blob["params"],
                       "frozen": ref_blob["frozen"]},
                      images, mask, st.query_embed, st.ref_pts, st.mask)
    ref = ref_blob["res"]
    for ours_key, ref_key, tol in (("pred_logits", "pred_logits", 1e-4),
                                   ("pred_boxes", "pred_bboxes", 1e-5),
                                   ("last_ref_pts", "last_ref_pts", 1e-4),
                                   ("init_ref_pts", "init_ref_pts", 1e-5),
                                   ("outputs", "outputs", 1e-4)):
        a = np.asarray(out[ours_key])[:, :ND]
        np.testing.assert_allclose(a, ref[ref_key], atol=tol,
                                   err_msg=ours_key)


def test_query_updater_parity(ref_blob):
    n, s = ref_blob["n_tracks"], 8
    updater = QueryUpdater(hidden_dim=HD, ffn_dim=128, use_dab=True,
                           dtype=jnp.float32, update_threshold=0.5,
                           long_memory_lambda=0.01)

    def slots(a):
        out = np.zeros((1, s) + a.shape[1:], np.float32)
        out[0, :n] = a
        return jnp.asarray(out)

    u = ref_blob["upd_in"]
    res = updater.apply(
        {"params": ref_blob["uparams"]}, slots(u["query_embed"]),
        slots(u["ref_pts"]), slots(u["logits"]), slots(u["boxes"]),
        slots(u["output_embed"]), slots(u["last_output"]),
        slots(u["long_memory"]), jnp.asarray(np.arange(s)[None] < n))
    for key in ("query_embed", "ref_pts", "long_memory", "last_output"):
        np.testing.assert_allclose(np.asarray(res[key])[0, :n],
                                   ref_blob["upd_out"][key], atol=1e-5,
                                   err_msg=key)
