"""Released-checkpoint ingestion at DEPLOYMENT width (256-dim, 6+6 layers,
300 det queries, ResNet-50) — the exact shape of the checkpoints the
reference publishes (configs/train_dancetrack.yaml).

The 64-dim randomized parity test (test_reference_parity.py) proves the
converter's *math*; this file proves the *key set and every remap rule* at
the released shape, so a real ``.pth`` downloaded outside this sandbox works
first try:

1. A reference-shaped MeMOTR checkpoint is fabricated by instantiating the
   ACTUAL reference model (/root/reference/models/memotr.py) at the
   train_dancetrack.yaml shape and saving ``{"model": state_dict()}`` — the
   exact format ``utils.utils.save_checkpoint`` writes.  Our consumer path
   (``engine.train.load_pretrained``) must load EVERY leaf of our 256-dim
   model/updater/frozen trees from it (full coverage, no silent random
   leaves left behind).
2. A raw DAB-Deformable-DETR pretrain checkpoint (91-class COCO head,
   ``tgt_embed``/``refpoint_embed``/``backbone.0.body``/``input_proj``
   namespaces + two-stage stragglers) is fabricated by inverse-mapping, then
   our ``remap_pretrained_dab`` is pinned against the reference's own
   ``load_pretrained_model`` (/root/reference/models/utils.py:88-168) run on
   the reference model — including the 91-class ``class_embed`` row slicing
   [1:1+K] and the BDD100K (8-class) keep-random-init rule.
"""
import os
import sys

import jax as _jax
import pytest as _pytest

pytestmark = _pytest.mark.skipif(
    _jax.devices()[0].platform != "cpu",
    reason="builds the full-width reference torch model; run via "
           "scripts/test_cpu.sh")

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from memotr_tpu.checkpoint.torch_convert import (convert_torch_state_dict,
                                                 remap_pretrained_dab)
from memotr_tpu.engine.train import load_pretrained
from memotr_tpu.log.logger import Logger
from memotr_tpu.models.memotr import build_model
from memotr_tpu.models.query_updater import QueryUpdater
from memotr_tpu.structures.track_state import TrackState

from test_reference_parity import _import_reference

HD, FFN, ENC, DEC, NDQ = 256, 2048, 6, 6, 300

# /root/reference/configs/train_dancetrack.yaml — the released DanceTrack
# checkpoint's exact architecture.
REF_CFG = {
    "DATASET": "DanceTrack", "BACKBONE": "resnet50",
    "HIDDEN_DIM": HD, "FFN_DIM": FFN, "NUM_FEATURE_LEVELS": 4,
    "NUM_HEADS": 8, "NUM_ENC_POINTS": 4, "NUM_DEC_POINTS": 4,
    "NUM_ENC_LAYERS": ENC, "NUM_DEC_LAYERS": DEC,
    "MERGE_DET_TRACK_LAYER": 1, "NUM_DET_QUERIES": NDQ, "DROPOUT": 0.0,
    "USE_DAB": True, "UPDATE_THRESH": 0.5, "LONG_MEMORY_LAMBDA": 0.01,
    "USE_CHECKPOINT": False, "CHECKPOINT_LEVEL": 2,
    "EXTRA_TRACK_ATTN": False, "RETURN_INTER_DEC": True,
    "ACTIVATION": "ReLU", "VISUALIZE": False,
}

OUR_CFG = {
    "DATASET": "DanceTrack", "HIDDEN_DIM": HD, "FFN_DIM": FFN,
    "NUM_FEATURE_LEVELS": 4, "NUM_HEADS": 8, "NUM_ENC_POINTS": 4,
    "NUM_DEC_POINTS": 4, "NUM_ENC_LAYERS": ENC, "NUM_DEC_LAYERS": DEC,
    "MERGE_DET_TRACK_LAYER": 1, "NUM_DET_QUERIES": NDQ, "DROPOUT": 0.0,
    "USE_DAB": True, "USE_CHECKPOINT": False, "DTYPE": "float32",
    "MSDA_IMPL": "xla", "TRACK_SLOTS": 8, "ENCODER_TYPE": "deformable",
}


@pytest.fixture(scope="module")
def ref_model_256():
    ref_build, _, _ = _import_reference()
    torch.manual_seed(0)
    model = ref_build(REF_CFG)
    model.eval()
    # Randomize everything (cheaply — uniform init) so a mis-keyed leaf
    # cannot hide behind a structured init like the zero bbox head.
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for _, p in model.named_parameters():
            p.copy_(torch.rand(p.shape, generator=g) * 0.2 + 0.01)
        for name, b in model.named_buffers():
            b.copy_(torch.rand(b.shape, generator=g) * 0.2 +
                    (1.0 if "running_var" in name else 0.01))
    return model


@pytest.fixture(scope="module")
def our_shape_trees():
    """Shape-only init trees of our model at deployment width (eval_shape —
    no compute/compile), materialized as zeros so the loaded-leaf check is
    'every leaf became nonzero'."""
    model = build_model(OUR_CFG)
    st = TrackState.empty(1, 8, HD, 1, use_dab=True)
    img = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    mask = jax.ShapeDtypeStruct((1, 64, 64), bool)
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), img, mask,
        st.query_embed, st.ref_pts, st.mask)
    updater = QueryUpdater(hidden_dim=HD, ffn_dim=FFN, use_dab=True,
                           dtype=jnp.float32, update_threshold=0.5,
                           long_memory_lambda=0.01)
    uvars = jax.eval_shape(
        updater.init, jax.random.PRNGKey(1), st.query_embed, st.ref_pts,
        jax.ShapeDtypeStruct((1, 8, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 8, 4), jnp.float32),
        st.query_embed, st.query_embed, st.query_embed, st.mask)
    zeros = lambda t: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), t)
    return zeros(dict(variables)), zeros(dict(uvars))


def test_released_memotr_checkpoint_loads_every_leaf(
        ref_model_256, our_shape_trees, tmp_path):
    """Fabricated released-format .pth at 256-dim -> load_pretrained must
    cover 100% of our param/frozen/updater leaves (no key-set drift)."""
    sd = ref_model_256.state_dict()
    path = str(tmp_path / "memotr_dancetrack.pth")
    torch.save({"model": sd}, path)

    # direct converter check first: no reference key may go unconverted
    model_c, updater_c, frozen_c = convert_torch_state_dict(sd)
    unconverted = model_c.pop("_unconverted")
    assert unconverted == [], f"converter missed keys: {unconverted[:8]}"

    variables, uvars = our_shape_trees
    cfg = dict(OUR_CFG, PRETRAINED_MODEL=path)
    new_vars, new_uvars = load_pretrained(
        cfg, variables, uvars, Logger(logdir=str(tmp_path / "log")))

    # every leaf was zeros before the merge; a leaf still all-zero after it
    # was NOT loaded from the checkpoint (randomized to be bounded away
    # from zero above)
    for tree_name, tree in (("params", new_vars["params"]),
                            ("frozen", new_vars["frozen"]),
                            ("updater", new_uvars["params"])):
        flat = jax.tree_util.tree_leaves_with_path(tree)
        assert flat, tree_name
        unloaded = [jax.tree_util.keystr(p) for p, leaf in flat
                    if not np.any(np.asarray(leaf))]
        assert unloaded == [], \
            f"{tree_name} leaves untouched by the released checkpoint: " \
            f"{unloaded[:8]} (+{max(0, len(unloaded) - 8)} more)"


def _fabricate_dab_checkpoint(ref_sd):
    """Inverse-map a reference-MeMOTR state dict into the raw
    DAB-Deformable-DETR checkpoint namespace (what load_pretrained_model
    receives: models/utils.py:88-168)."""
    g = torch.Generator().manual_seed(9)
    raw = {}
    for k, v in ref_sd.items():
        if k.startswith("query_updater."):
            continue                     # a detector pretrain has no updater
        if "class_embed" in k:
            # COCO 91-class head; rows [1:1+K] must land in the model
            shape = (91,) + tuple(v.shape[1:])
            raw[k] = torch.rand(shape, generator=g) * 0.2 + 0.01
        elif k == "det_query_embed":
            raw["tgt_embed.weight"] = v.clone()
        elif k == "det_anchor":
            raw["refpoint_embed.weight"] = v.clone()
        elif k.startswith("backbone.backbone.backbone"):
            raw["backbone.0.body" + k[len("backbone.backbone.backbone"):]] \
                = v.clone()
        elif k.startswith("feature_projs"):
            raw["input_proj" + k[len("feature_projs"):]] = v.clone()
        else:
            raw[k] = v.clone()
    # two-stage / DN stragglers present in real DAB-D-DETR checkpoints;
    # both loaders must drop them silently (strict=False)
    raw["transformer.enc_output.weight"] = torch.rand(HD, HD, generator=g)
    raw["transformer.enc_output_norm.weight"] = torch.rand(HD, generator=g)
    raw["label_enc.weight"] = torch.rand(92, HD, generator=g)
    return raw


def test_dab_pretrain_remap_matches_reference_loader(ref_model_256):
    """remap_pretrained_dab == the reference's load_pretrained_model, key by
    key, at deployment width (incl. class_embed [1:2] slice for K=1)."""
    import copy
    raw = _fabricate_dab_checkpoint(ref_model_256.state_dict())

    oracle = copy.deepcopy(ref_model_256)
    # fresh values so "kept model init" vs "loaded" is distinguishable
    g = torch.Generator().manual_seed(21)
    with torch.no_grad():
        for _, p in oracle.named_parameters():
            p.copy_(torch.rand(p.shape, generator=g) * 0.2 + 0.5)
    from models.utils import load_pretrained_model  # reference, read-only
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dab.pth")
        torch.save({"model": {k: v.clone() for k, v in raw.items()}}, path)
        load_pretrained_model(oracle, path)
    oracle_sd = oracle.state_dict()

    ours = remap_pretrained_dab(raw, num_classes=1)

    # every key our remap produces that the model owns must carry exactly
    # the value the reference loader put there
    compared = 0
    for k, v in ours.items():
        if k in oracle_sd:
            np.testing.assert_allclose(np.asarray(v),
                                       oracle_sd[k].numpy(), atol=0,
                                       err_msg=k)
            compared += 1
    assert compared > 400     # full 256-dim model: backbone+12 layers+heads

    # the named remap rules all fired
    assert "det_query_embed" in ours and ours["det_query_embed"].shape == \
        (NDQ, HD)
    assert "det_anchor" in ours and ours["det_anchor"].shape == (NDQ, 4)
    assert ours["class_embed.0.weight"].shape == (1, HD)   # [1:2] slice
    np.testing.assert_allclose(ours["class_embed.0.weight"],
                               raw["class_embed.0.weight"][1:2].numpy())
    assert any(k.startswith("backbone.backbone.backbone") for k in ours)
    assert any(k.startswith("feature_projs") for k in ours)
    # stragglers passed through un-renamed -> dropped later by strict=False
    assert "label_enc.weight" in ours

    # BDD100K rule (8 classes): pretrained class head is NOT used
    bdd = remap_pretrained_dab(raw, num_classes=8)
    assert not any("class_embed" in k for k in bdd)


def test_query_embed_alias_maps_to_det_query_embed():
    """Non-DAB checkpoints name the det queries 'query_embed.weight'
    (models/utils.py:115-122); both aliases must land on det_query_embed."""
    v = torch.rand(NDQ, HD)
    out = remap_pretrained_dab({"query_embed.weight": v}, num_classes=1)
    np.testing.assert_allclose(out["det_query_embed"], v.numpy())
    out = remap_pretrained_dab({"transformer.tgt_embed.weight": v},
                               num_classes=1)
    np.testing.assert_allclose(out["det_query_embed"], v.numpy())
